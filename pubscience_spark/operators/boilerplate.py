"""B2: parameterized per-source boilerplate processors.

The reference ships 18 source-specific processor functions sharing one
shape — truncate to the article body (starter/remover/stopper line rules),
then the generic markdown clean — dispatched from a registry
(``scripts/clean.py:200-779``, registry ``:784-805``). Here the 18 functions
collapse into ONE operator parameterized by rule-sets and dispatched by the
``source`` column *inside* a single Arrow batch — one pUDF stage regardless
of how many sources exist, no per-source jobs and no skew from rare sources.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..kernels import textclean


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
                   rulesets: dict[str, RuleSet] | None = None) -> str:
    """Sequential reference implementation (fixture side)."""
    rules = (rulesets or DEFAULT_RULESETS).get(
        source, (rulesets or DEFAULT_RULESETS)["default"])
    body = textclean.truncate(text, rules.starters, rules.removers,
                              rules.stoppers)
    cleaned = textclean.clean_markdown(body)
    if rules.min_words and len(cleaned.split()) < rules.min_words:
        return ""
    return cleaned


def boilerplate_udf(rulesets: dict[str, RuleSet] | None = None):
    rules = rulesets or DEFAULT_RULESETS

    @pandas_udf(StringType())
    def _proc(text: pd.Series, source: pd.Series) -> pd.Series:
        return pd.Series([
            process_source(t if t is not None else "", s or "default", rules)
            for t, s in zip(text, source)])
    return _proc


def strip_boilerplate(df: DataFrame, text_col: str = "text",
                      source_col: str = "source",
                      out_col: str = "clean_text",
                      rulesets: dict[str, RuleSet] | None = None) -> DataFrame:
    """One pUDF pass; per-source rules resolved row-wise in the batch."""
    return df.withColumn(
        out_col, boilerplate_udf(rulesets)(F.col(text_col), F.col(source_col)))
