"""End-to-end pipelines: the BFS crawl loop, the sequential conformance
oracle, and training-data pipelines (dedup, similarity, text analysis)."""
