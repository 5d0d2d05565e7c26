"""URL curation operators for Common-Crawl-style corpora.

The input table keys documents by ``url`` (BASELINE.json input_hint);
web-scale curation needs URL hygiene before any url-keyed dedup:

- :func:`with_normalized_url` — canonical form (lowercased scheme/host,
  default-port and fragment and tracking-param (utm_*/fbclid/gclid/…)
  removal, trailing-slash trim) via native ``try_parse_url`` + higher-order
  array functions — no Python;
- :func:`dedup_by_url` — keep-first per normalized URL (min()-agg
  keepers, the hot-key-safe shape shared with the sha256 dedup);
- :func:`filter_domains` — block/allow by domain suffix. The scalable
  shape for big lists: explode each host into its ≤ ``max_labels``
  parent suffixes and equi-join the (broadcast) list — O(labels) per
  row, never O(|list|) per row like an ``endswith``-any scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_cid",
                     "mc_eid", "igshid", "ref_src", "ref_url", "_hsenc",
                     "_hsmi", "yclid")


def _norm_query(url):
    q = F.try_parse_url(url, F.lit("QUERY"))
    parts = F.split(q, "&")
    kept = F.filter(parts, lambda p: ~F.lower(p).rlike(
        "^(" + "|".join(TRACKING_PREFIXES) + ")"))
    joined = F.array_join(kept, "&")
    return F.when(q.isNull() | (F.length(joined) == 0), F.lit("")) \
        .otherwise(F.concat(F.lit("?"), joined))


def normalized_url_expr(url_col: str):
    """Canonical URL as a native Column expression. Unparseable URLs
    (try_parse_url yields no host — spaces, illegal chars) pass through
    UNCHANGED rather than collapsing onto a shared constant that would
    cross-dedup unrelated rows."""
    url = F.col(url_col)
    proto = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PROTOCOL")),
                               F.lit("http")))
    host = F.lower(F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")))
    # parse_url HOST drops the port — recover it from the authority and
    # keep NON-default ports (distinct origins must stay distinct keys)
    port = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:(\d+)(?:[/?#]|$)", 1)
    is_default = ((proto == "http") & (port == "80")) | \
        ((proto == "https") & (port == "443"))
    port_part = F.when((F.length(port) > 0) & ~is_default,
                       F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path.endswith("/") & (F.length(path) > 1),
                  path.substr(F.lit(1), F.length(path) - 1)) \
        .otherwise(path)
    norm = F.concat(proto, F.lit("://"), host, port_part, path,
                    _norm_query(url))
    return F.when(F.length(host) > 0, norm).otherwise(url)


def with_normalized_url(df: DataFrame, url_col: str = "url",
                        out_col: str = "url_norm") -> DataFrame:
    return df.withColumn(out_col, normalized_url_expr(url_col))


def dedup_by_url(df: DataFrame, url_col: str = "url",
                 order_col: str | None = None,
                 flag_col: str = "is_url_duplicate") -> DataFrame:
    """Keep-first per normalized URL: min(order)-agg keepers (map-side
    combine — a viral URL duplicated millions of times never sorts one
    hot partition) joined back on the normalized key.

    ``order_col`` must be a UNIQUE row id (doc_id): with a non-unique
    order, rows tied at the minimum are all 'keepers' — in particular
    the url itself would never flag byte-identical repeated URLs, the
    most common duplicate shape. Required, like dedup_by_name."""
    if order_col is None:
        raise ValueError("dedup_by_url needs a unique order_col (doc id) "
                         "— a non-unique order never flags exact "
                         "repeats of the same URL")
    keyed = with_normalized_url(df, url_col, "__un")
    keepers = (keyed.where(F.col("__un").isNotNull())
               .groupBy("__un").agg(F.min(order_col).alias("__keep")))
    # LEFT join: NULL-url rows have no key, survive with flag False
    # (an inner join would silently drop them — round-3 review)
    return (keyed.join(keepers, "__un", "left")
            .withColumn(flag_col,
                        F.when(F.col("__keep").isNull(), F.lit(False))
                        .otherwise(F.col(order_col) != F.col("__keep")))
            .drop("__un", "__keep"))


def _host_suffixes(host, max_labels: int):
    """['a.b.co.uk','b.co.uk','co.uk','uk'] — suffix keys for the join."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda i: F.array_join(F.slice(labels, n - i + 1, i), "."))


def filter_domains(df: DataFrame, domains: list[str] | DataFrame,
                   url_col: str = "url", mode: str = "block",
                   max_labels: int = 6) -> DataFrame:
    """Drop (``mode='block'``) or keep (``mode='allow'``) rows whose URL
    host matches any listed domain or is a subdomain of one.

    ``domains`` may be a python list (made into a broadcast frame) or a
    DataFrame with a ``domain`` column (for list tables too big to ship
    through the driver). Matching explodes each host into its parent
    suffixes and semi/anti-joins — per-row cost is bounded by the
    host's label count, independent of list size."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    spark = df.sparkSession
    if isinstance(domains, DataFrame):
        dom = domains.select(F.lower(F.col("domain")).alias("__dom"))
    else:
        dom = spark.createDataFrame(
            [(d.lower().lstrip("."),) for d in domains], ["__dom"])
    dom = F.broadcast(dom.distinct())
    host = F.lower(F.coalesce(F.try_parse_url(F.col(url_col), F.lit("HOST")),
                              F.lit("")))
    keyed = df.withColumn("__sfx", F.explode(_host_suffixes(host,
                                                            max_labels)))
    hits = keyed.join(dom, F.col("__sfx") == F.col("__dom")) \
        .select(url_col).distinct()
    how = "left_anti" if mode == "block" else "left_semi"
    return df.join(hits, url_col, how)
