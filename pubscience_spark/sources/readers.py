"""Source readers (SURVEY.md §2.1, S1-S6).

The reference reads parquet/text/jsonl/gz-XML file-at-a-time with hand-rolled
buffered readers (``clean/cleaner.py:214-255``, ``scripts/clean.py:38-43``,
``retrieve/pubmed/extractor/utils.py:44-81``). Here every source is a Spark
DataFrame scan, so partition pruning / predicate pushdown / parallel IO come
from the engine:

- S1  ``read_pages``       parquet path or saved table name → pages DF
- S2  ``read_text_lines``  line scan with file path + line number
- S3  ``read_jsonl``       PERMISSIVE json-lines with corrupt-record capture
- S4  ``read_pubmed_gz``   binaryFile scan + Arrow-batched gz article split
- S6  directory dispatch   ``read_any`` by extension glob
"""

from __future__ import annotations

import gzip
import io
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", StringType()),
    StructField("html", StringType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """S1: the input table — a parquet path (endswith .parquet / dir) or a
    catalog table name (Iceberg in production; ``spark.table`` either way)."""
    if "/" in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.table(source)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S2: line scan; keeps provenance (input file, line number) the way the
    reference's buffered reader implicitly does via file order
    (``clean/cleaner.py:232-255``).

    OFFSET-BASED numbering: a window partitioned by file alone would pull
    every line of a multi-GB file into ONE task (the round-1 straggler).
    Instead lines are numbered within their scan split (bounded by
    ``maxPartitionBytes``), split line-counts roll up in a tiny per-(file,
    split) aggregate, and a windowed cumsum over that slim table yields
    each split's starting offset — broadcast back, so no partition ever
    exceeds one split. Split planning is deterministic for a fixed file
    layout, so both consumers of the scan see identical split ids."""
    from pyspark.sql.window import Window
    base = (spark.read.text(path)
            .select(F.input_file_name().alias("file"),
                    F.spark_partition_id().alias("__split"),
                    F.monotonically_increasing_id().alias("__mid"),
                    F.col("value").alias("line")))
    w_split = Window.partitionBy("file", "__split").orderBy("__mid")
    numbered = base.withColumn("__rn", F.row_number().over(w_split))
    counts = numbered.groupBy("file", "__split") \
        .agg(F.max("__rn").alias("__cnt"))
    w_file = (Window.partitionBy("file").orderBy("__split")
              .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_file), F.lit(0)))
    return (numbered
            .join(F.broadcast(offsets.select("file", "__split", "__off")),
                  ["file", "__split"])
            .select("file",
                    (F.col("__off") + F.col("__rn")).cast("int")
                    .alias("line_no"), "line"))


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | None = None) -> DataFrame:
    """S3: json-lines with skip-broken-lines semantics
    (``scripts/clean.py:38-43``): PERMISSIVE mode keeps bad lines in
    ``_corrupt_record`` instead of failing the scan."""
    reader = spark.read.option("mode", "PERMISSIVE") \
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            schema = StructType(
                list(schema.fields) + [StructField("_corrupt_record",
                                                   StringType())])
        reader = reader.schema(schema)
    return reader.json(path)


# --- S4/S5: gz PubMed XML article splitter --------------------------------

_ARTICLE_RE = re.compile(rb"<PubmedArticle[\s>].*?</PubmedArticle>",
                         re.DOTALL)
_PMID_RE = re.compile(rb"<PMID[^>]*>(\d+)</PMID>")

PUBMED_SPLIT_SCHEMA = StructType([
    StructField("path", StringType(), False),
    StructField("pmid", LongType()),
    StructField("article_xml", StringType()),
])


def split_pubmed_blob(raw: bytes) -> list[tuple[int | None, bytes]]:
    """Split one (possibly gzipped) multi-article XML blob into
    (pmid, article bytes) — the ``iterate_pubmed_xml`` semantics
    (``retrieve/pubmed/extractor/utils.py:44-81``): articles are delimited
    by <PubmedArticle>…</PubmedArticle>, pmid = first <PMID> inside."""
    if raw[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(raw)) as fh:
            raw = fh.read()
    out = []
    for m in _ARTICLE_RE.finditer(raw):
        art = m.group(0)
        pm = _PMID_RE.search(art)
        out.append((int(pm.group(1)) if pm else None, art))
    return out


def _split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        recs = []
        for path, content in zip(b["path"], b["content"]):
            for pmid, art in split_pubmed_blob(bytes(content)):
                recs.append({"path": path, "pmid": pmid,
                             "article_xml": art.decode("utf-8", "replace")})
        yield pd.DataFrame(recs, columns=["path", "pmid", "article_xml"])


def read_pubmed_gz(spark: SparkSession, glob: str) -> DataFrame:
    """S4: binaryFile scan over .xml/.xml.gz shards → one row per article.

    Row-level (not file-level) parallelism downstream: the explode happens
    inside Arrow batches, then any repartition rebalances by article —
    exactly the skew fix for the reference's per-file process pool
    (``extractor/parse.py:89-97``)."""
    files = spark.read.format("binaryFile").load(glob) \
        .select("path", "content")
    return files.mapInPandas(_split_batches, schema=PUBMED_SPLIT_SCHEMA)


def read_any(spark: SparkSession, path: str,
             ext: str | None = None) -> DataFrame:
    """S6: extension-dispatched read (identify/identify.py:221-238 analog)."""
    suffix = ext or path.rsplit(".", 1)[-1].lower()
    if suffix in ("parquet",):
        return spark.read.parquet(path)
    if suffix in ("json", "jsonl"):
        return read_jsonl(spark, path)
    if suffix in ("txt", "text", "csv"):
        return read_text_lines(spark, path)
    if suffix in ("xml", "gz"):
        return read_pubmed_gz(spark, path)
    raise ValueError(f"unsupported extension: {suffix}")


# ---------------------------------------------------------------- WARC ----

WARC_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("http_status", IntegerType()),
    StructField("mime", StringType()),
    StructField("n_skipped", IntegerType()),
])


def read_warc(spark: SparkSession, path: str,
              record_types: tuple = ("response",)) -> DataFrame:
    """Common-Crawl WARC segment files → pages-shaped rows (the step
    upstream of the pages table every other entry point assumes).

    Scale shape: ``binaryFile`` scan — one whole segment per row. WARC
    gzip members are NOT splittable, so parallelism comes from the
    SEGMENT-FILE count (the CC layout: tens of thousands of ~1 GB files
    per crawl — more tasks than any cluster has cores); one task holds
    one decompressed segment in memory, the same bound the reference's
    file-at-a-time readers have. Records parse Arrow-batched via
    :mod:`kernels.warc` (multi-member gzip, HTTP status/chunked/
    content-encoding handling); malformed records are skipped and
    COUNTED (``n_skipped`` rides the next good row), never raised.

    Output columns: url, warc_ts, html (decoded response body bytes),
    http_status, mime, n_skipped — feed ``.select("url", "warc_ts",
    "html")`` into :func:`plans.pipeline.run_extraction`."""
    import datetime as _dt

    from ..kernels import warc as W

    files = spark.read.format("binaryFile").load(path)
    keep = tuple(record_types)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        chunk = 256          # bounded rows per Arrow batch: a multi-GB
        for b in it:         # segment must not pile into ONE DataFrame
            rows = []
            for content in b["content"]:
                pending_skips = 0    # skips attached to filtered-out
                for rec in W.iter_warc_records(bytes(content)):
                    pending_skips += rec["skipped"]
                    if rec["type"] not in keep:    # types still count
                        continue
                    status, mime, body = \
                        W.parse_http_response(rec["block"])
                    try:
                        ts = _dt.datetime.fromisoformat(
                            rec["date"].replace("Z", "+00:00"))
                        if ts.tzinfo is not None:  # convert, don't drop
                            ts = ts.astimezone(_dt.timezone.utc) \
                                .replace(tzinfo=None)
                    except ValueError:
                        ts = None
                    rows.append({"url": rec["uri"], "warc_ts": ts,
                                 "html": body, "http_status": status,
                                 "mime": mime,
                                 "n_skipped": pending_skips})
                    pending_skips = 0
                    if len(rows) >= chunk:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(_batches,
                                               schema=WARC_SCHEMA)
