"""Stateful components hosted in Ray actors: the sharded URL-seen set
(cuckoo filter / exact set), host policy (robots + crawl-delay), metrics."""
