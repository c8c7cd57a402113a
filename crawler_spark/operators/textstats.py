"""Text-analysis operators for training-data curation — language ID,
quality scoring, token counting, document fingerprinting.

Everything here is a pure Column expression where possible (JVM,
codegen'd, pushdown-friendly); only the rolling-hash fingerprint needs a
pandas UDF.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# --- token counting ------------------------------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace token count (JVM)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    )


BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[가-힣]+|[^A-Za-z0-9가-힣\s]"


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: letter runs + digit runs + hangul runs +
    single punctuation marks (regexp_extract_all, JVM)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), F.lit(0)))


# --- language ID (n-gram-free heuristic, same spec as scoring.analyze) ---------

def lang_id(text: Column) -> Column:
    hangul = F.length(F.regexp_replace(text, "[^가-힣]", ""))
    latin = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    total = hangul + latin
    return (
        F.when(total == 0, F.lit("unknown"))
        .when(hangul / total >= 0.3, F.lit("ko"))
        .otherwise(F.lit("en"))
    )


# --- quality scoring (columnar variant of E13 buckets) --------------------------

def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword-ratio features + a bucketed quality score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    stop = F.size(
        F.filter(
            F.split(F.lower(t), "\\s+"),
            lambda w: w.isin("the", "a", "an", "and", "or", "of", "to", "in", "is"),
        )
    )
    score = (
        F.when(n_chars > 1000, F.lit(0.4))
        .when(n_chars > 500, F.lit(0.3))
        .when(n_chars > 100, F.lit(0.2))
        .otherwise(F.lit(0.0))
        + F.when(n_punct / F.greatest(n_tokens, F.lit(1)) > 0.02, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop / F.greatest(n_tokens, F.lit(1)) > 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
            "stopword_ratio": F.round(stop / F.greatest(n_tokens, F.lit(1)), 6),
            "quality": F.round(F.least(score, F.lit(1.0)), 2),
        }
    )


# --- document fingerprint (rolling hash / winnowing-style) ----------------------

def fingerprint_udf(window: int = 8):
    """Min rolling crc over ``window``-word sliding windows — a compact
    order-sensitive fingerprint (winnowing-style document sketch)."""

    @F.pandas_udf(LongType())
    def fn(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            words = (t or "").split()
            if not words:
                out.append(0)
                continue
            if len(words) <= window:
                spans = [" ".join(words)]
            else:
                spans = [
                    " ".join(words[i : i + window])
                    for i in range(len(words) - window + 1)
                ]
            crc = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in spans),
                dtype=np.int64,
                count=len(spans),
            )
            out.append(int(crc.min()))
        return pd.Series(out, dtype="int64")

    return fn
