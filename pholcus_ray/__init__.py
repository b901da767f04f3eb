"""pholcus_ray — a Ray-Data-native crawl/extract engine.

A from-scratch reimplementation of the query/data-processing capabilities of
tjsky/pholcus (reference at /root/reference, Go), re-expressed Ray-Data-first:

- the URL frontier is a ``ray.data.Dataset`` driven in deterministic BFS rounds
- the URL-seen set is a sharded cuckoo-filter (or exact-set) actor pool
- fetch/parse/extract run as ``map_batches`` over Arrow batches (actor pools for
  stateful stages)
- per-host politeness, robots.txt and priority ordering are explicit dataset
  operations (groupby(host) budgets, sort by (priority desc, seq))
- every round checkpoints frontier/seen/failures for resumable execution

See SURVEY.md for the full mapping from the reference's operators.
"""

__version__ = "0.1.0"
