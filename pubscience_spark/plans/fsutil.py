"""Filesystem helpers for the commit/manifest/compaction protocols.

Round-2 review finding: ``os.walk`` / ``os.rename`` / ``open()`` bake a
driver-local filesystem into the commit protocol — correct on local[32],
silently wrong the moment ``out_dir`` is ``s3a://…`` or ``hdfs://…`` on a
real cluster. Every metadata operation here goes through the Hadoop
FileSystem API instead (``Path.getFileSystem(hadoopConf)``), which
resolves the right implementation per scheme: LocalFileSystem for plain
paths (so local[32] behavior is unchanged — these are tiny metadata ops,
the JVM hop is noise), S3A/HDFS/ABFS on clusters.

Semantics note for object stores: ``rename`` is O(1) only on real
filesystems; S3A implements it as copy+delete. The compaction swap
(``plans/maintenance``) documents that trade — its correctness (complete
table visible at every instant) still holds, the swap window just widens.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def count_files(spark: SparkSession, path: str,
                suffix: str = ".parquet") -> int:
    """Recursive count of data files under ``path`` (0 if absent)."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return 0
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def has_files(spark: SparkSession, path: str,
              suffix: str = ".parquet") -> bool:
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            return True
    return False


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, s, _ = _fs(spark, src)
    _, d, _ = _fs(spark, dst)
    return bool(fs.rename(s, d))


def delete(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, True))


def touch(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs(spark, path)
    fs.create(p, True).close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, p, _ = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    # py4j passes bytearray by value, so readFully(buf) can't fill a
    # python buffer — materialize the bytes JVM-side instead
    fs, p, jvm = _fs(spark, path)
    stm = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stm, "UTF-8")
    finally:
        stm.close()
