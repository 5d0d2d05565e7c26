"""spark-submit entry point for the extraction pipeline.

    spark-submit --py-files pubscience_spark.zip tools/run_pipeline.py \
        <pages_path_or_table> <out_dir> [--lang en] [--detector] \
        [--buckets N] [--no-resume]

On a cluster the session comes from spark-submit's conf (master, executors);
locally it falls back to local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pages")
    ap.add_argument("out_dir")
    ap.add_argument("--lang", default=None)
    ap.add_argument("--detector", action="store_true")
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pubscience_spark.plans.pipeline import run_extraction
    from pubscience_spark.session import get_spark
    from pubscience_spark.sources.readers import read_pages

    spark = get_spark(app_name="pubscience-extract")
    try:
        res = run_extraction(
            spark, read_pages(spark, args.pages), args.out_dir,
            n_buckets=args.buckets, resume=not args.no_resume,
            lang_keep=args.lang, use_detector_gate=args.detector)
        print(json.dumps(res))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
