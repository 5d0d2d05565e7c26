#!/usr/bin/env python
"""Round-8 optimization measurement harness (guide §1). NOT the driver
bench — `bench.py` is frozen; this file exists so optimization evidence
(noop-sink isolation, per-stage decomposition, plan dumps) can be
reproduced without touching the measured contract.

Subcommands:
  queries [name ...]        best-of-N per query, noop sink (§1.4) + collect
  explain <dir> [name ...]  dump .explain("formatted") per query into <dir>
  extract                   headline extraction job, stage-by-stage split

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py),
     BENCH_EXTRA_TRIALS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("BENCH_EXTRA_TRIALS", "3"))
N_BUCKETS = 4 * CPUS

BENCH_CONF = {
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(1024 * 1024),
}


def _session():
    from pubscience_spark.session import get_spark
    return get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                     shuffle_partitions=N_BUCKETS, extra_conf=BENCH_CONF)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod
    from pubscience_spark.operators.dedup import unpersist_input
    spark = _session()
    sc = spark.sparkContext
    qs = entrymod.queries()
    picked = names or list(qs)
    out = {}
    for name in picked:
        fn = qs[name]
        trials = []
        for t in range(TRIALS):
            sc.setJobDescription(f"{name} trial {t}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.collect()
            trials.append(round(time.perf_counter() - t0, 3))
            unpersist_input(df)
        out[name] = trials
        print(f"{name}: min {min(trials)}  trials {trials}", flush=True)
    spark.stop()
    import json
    print(json.dumps({k: min(v) for k, v in out.items()}))


def cmd_explain(out_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    from pubscience_spark.operators.dedup import unpersist_input
    os.makedirs(out_dir, exist_ok=True)
    spark = _session()
    qs = entrymod.queries()
    for name in names or list(qs):
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        unpersist_input(df)
        print(f"wrote {name}", flush=True)
    spark.stop()


def cmd_extract() -> None:
    """Headline job decomposition: scan→repartition | +extract | +mark+agg."""
    from pyspark.sql import functions as F

    from pubscience_spark.operators import dedup as dedup_ops
    from pubscience_spark.operators.extract import extract_pages
    from pubscience_spark.plans.pipeline import bucket_col
    import bench as B
    pages_path = B.ensure_pages(B.N_PAGES)
    spark = _session()
    sc = spark.sparkContext
    B._warmup(spark, pages_path)

    def pages_df():
        return (spark.read.parquet(pages_path)
                .withColumn("bucket", bucket_col(N_BUCKETS))
                .repartition(N_BUCKETS, "bucket"))

    stages = {
        "scan_repartition": lambda: _noop(pages_df().select("url", "bucket")),
        "scan_repartition_html": lambda: _noop(pages_df()),
        "plus_extract": lambda: _noop(
            extract_pages(pages_df().select("url", "html", "bucket"))),
        "extract_agg_nochars": lambda: extract_pages(
            pages_df().select("url", "html", "bucket"))
            .agg(F.count(F.lit(1))).collect(),
        "full_job": lambda: B.extraction_job(spark, pages_path),
    }
    for name, fn in stages.items():
        trials = []
        for t in range(TRIALS):
            sc.setJobDescription(f"{name} trial {t}")
            t0 = time.perf_counter()
            fn()
            trials.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min {min(trials)}  trials {trials}", flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "explain":
        cmd_explain(sys.argv[2], sys.argv[3:])
    elif cmd == "extract":
        cmd_extract()
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
