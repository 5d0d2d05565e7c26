"""pubscience_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of bramiozo/PubScience
(retrieve → parse → identify → deduplicate → clean → anonymise → stats)
as a columnar Spark pipeline over Common-Crawl-style page tables:

- ``kernels``   pure-Python deterministic text kernels (no Spark imports);
                the byte-identical contract lives here, CPython ``re`` only
- ``operators`` Arrow-batched pandas-UDF wrappers + native DataFrame ops
- ``sources``   page-table readers / synthetic generators
- ``plans``     end-to-end pipelines (extraction DAG, lineage, resume)
- ``datagen``   deterministic synthetic `pages` corpus (seed 42)

Design rules (BASELINE.json): every hot stage is an Arrow-batched
columnar UDF — no per-row Python in the driver path; salted url-hash
repartitioning for skew; per-partition lineage rows; idempotent resume.
"""

__version__ = "0.1.0"
