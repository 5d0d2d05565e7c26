"""spark-submit entry point for the corpus cleaner (Cleaner.clean() CLI
analog, ``clean/cleaner.py:293-307``).

    spark-submit --py-files pubscience_spark.zip tools/run_clean.py \
        <in_parquet> <out_parquet> [--id-col url] [--text-col text]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inp")
    ap.add_argument("out")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pubscience_spark.operators.clean import clean_corpus
    from pubscience_spark.session import get_spark

    spark = get_spark(app_name="pubscience-clean")
    try:
        df = spark.read.parquet(args.inp)
        clean_corpus(df, args.id_col, args.text_col) \
            .write.mode("overwrite").parquet(args.out)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
