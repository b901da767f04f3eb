"""Pure, deterministic scalar/vector functions shared by the engine and the
conformance oracle. Everything here is side-effect-free; the distributed engine
and the sequential oracle import the SAME functions so that conformance is a
statement about orchestration, not about two diverging reimplementations."""
