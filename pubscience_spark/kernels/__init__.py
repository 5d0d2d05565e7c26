"""Pure-Python deterministic kernels.

No Spark imports here. Each kernel is a plain function over str/bytes so it
can be (a) unit-tested directly, (b) run sequentially to produce golden
fixtures, and (c) wrapped in Arrow-batched pandas UDFs by
``pubscience_spark.operators``. CPython ``re`` semantics are the contract
(SURVEY.md §7.4) — Java ``regexp_replace`` is never used for
fixture-checked bytes.
"""
