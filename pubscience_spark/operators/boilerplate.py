"""B2: parameterized per-source boilerplate processors.

The reference ships 18 source-specific processor functions sharing one
shape — truncate to the article body (starter/remover/stopper line rules),
then the generic markdown clean — dispatched from a registry
(``scripts/clean.py:200-779``, registry ``:784-805``). Here the functions
collapse into ONE operator dispatched by the ``source`` column *inside* a
single Arrow batch — one pUDF stage regardless of how many sources exist,
no per-source jobs and no skew from rare sources.

Two rule tiers, resolved per row:
1. the reference's full per-source processors (``kernels/source_rules``,
   all 16 registry entries) — matched by source name or via ``source_map``;
2. generic ``RuleSet`` profiles for unmapped sources (round-1 behavior).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (BooleanType, StringType, StructField,
                               StructType)

from ..kernels import source_rules, textclean


class RuleSet:
    __slots__ = ("starters", "removers", "stoppers", "min_words")

    def __init__(self, starters=None, removers=None, stoppers=None,
                 min_words=0):
        self.starters = starters
        self.removers = removers
        self.stoppers = stoppers
        self.min_words = min_words


# Profiles modeled on the reference's per-source processors (guideline
# sites with overview/references/disclaimer furniture,
# ``scripts/clean.py:200-779``). Extend freely — the operator shape is
# source-count-independent.
DEFAULT_RULESETS: dict[str, RuleSet] = {
    "default": RuleSet(
        removers=["skip to", "advertisement", "cookie"],
        stoppers=["references", "see also", "external links"]),
    "guideline": RuleSet(
        starters=["# "],
        removers=["last updated", "print this page"],
        stoppers=["references", "disclaimer", "funding", "members of"]),
    "wiki": RuleSet(
        removers=["jump to", "edit source"],
        stoppers=["references", "bibliography", "navigation menu"]),
}


def process_source(text: str, source: str,
                   rulesets: dict[str, RuleSet] | None = None,
                   title: str = "", url: str | None = None,
                   source_map: dict[str, str] | None = None):
    """Sequential reference implementation (fixture side).

    Resolution order: ``source_map`` alias → reference processor by name
    (``kernels/source_rules.PROCESSORS``) → generic ``RuleSet`` profile.
    Returns ``(clean_text, kept)`` — ``kept=False`` mirrors the reference
    processors returning ``None`` to drop a document.
    """
    resolved = (source_map or {}).get(source, source)
    proc = source_rules.PROCESSORS.get(resolved)
    if proc is not None:
        out = proc(text, title=title, url=url)
        if out is None:
            return "", False
        return out["text"], True
    rules = (rulesets or DEFAULT_RULESETS).get(
        resolved, (rulesets or DEFAULT_RULESETS)["default"])
    body = textclean.truncate(text, rules.starters, rules.removers,
                              rules.stoppers)
    cleaned = textclean.clean_markdown(body)
    if rules.min_words and len(cleaned.split()) < rules.min_words:
        return "", False
    return cleaned, True


_PROC_SCHEMA = StructType([StructField("clean_text", StringType()),
                           StructField("kept", BooleanType())])


def boilerplate_udf(rulesets: dict[str, RuleSet] | None = None,
                    source_map: dict[str, str] | None = None):
    rules = rulesets or DEFAULT_RULESETS
    smap = source_map or {}

    @pandas_udf(_PROC_SCHEMA)
    def _proc(text: pd.Series, source: pd.Series,
              title: pd.Series) -> pd.DataFrame:
        rows = [process_source(t if t is not None else "", s or "default",
                               rules, title=ti if ti is not None else "",
                               source_map=smap)
                for t, s, ti in zip(text, source, title)]
        return pd.DataFrame(rows, columns=["clean_text", "kept"])
    return _proc


def strip_boilerplate(df: DataFrame, text_col: str = "text",
                      source_col: str = "source",
                      out_col: str = "clean_text",
                      rulesets: dict[str, RuleSet] | None = None,
                      source_map: dict[str, str] | None = None,
                      drop_skipped: bool = False,
                      title_col: str | None = None) -> DataFrame:
    """One pUDF pass; per-source rules resolved row-wise in the batch.

    ``source_map`` aliases table sources onto reference processors (e.g.
    ``{"src0": "wikidoc"}``). ``drop_skipped`` filters documents the
    processor rejected (reference ``return None``); otherwise a ``kept``
    column is exposed so the caller can count drops without a second pass.
    ``title_col`` feeds the title-dependent reference processors (aafp's
    title head + title-startswith line drop, gc's 'Title' sentinel, nice's
    name prefix — ``scripts/clean.py:243-268,414-441,556-590``); when
    absent those processors see ``title=""`` exactly like the sequential
    API's default.
    """
    title_expr = (F.col(title_col) if title_col is not None
                  else F.lit("").cast("string"))
    struct = boilerplate_udf(rulesets, source_map)(
        F.col(text_col), F.col(source_col), title_expr)
    out = (df.withColumn("__bp", struct)
           .withColumn(out_col, F.col("__bp.clean_text"))
           .withColumn("kept", F.col("__bp.kept"))
           .drop("__bp"))
    return out.where(F.col("kept")).drop("kept") if drop_skipped else out
