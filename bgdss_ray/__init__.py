"""bgdss_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference system (marcomprado/BGDSS, read-only at /root/reference), expressed
as Ray Data streaming pipelines: a URL frontier + fetch scheduler with a
sharded URL-seen set, per-host politeness budgets, streaming map_batches
parse stages emitting interleaved span documents, a deterministic 7-field
extractor, consolidation aggregates, and a library of large-scale
training-data operators (dedup, similarity search, text analysis).

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
