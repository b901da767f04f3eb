"""Sources: the synthetic Common-Crawl-style pages corpus (the simulated web),
seed lists, and read helpers."""
