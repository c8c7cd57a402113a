"""Quality gates + LLM-stage heuristics as vectorized pandas UDFs.

The reference's phase-2 worker applies a cascade (SURVEY §2.4):
parse-failure sentinel → programmatic low-quality check → LLM gatekeeper
(YES/NO relevance) → LLM deep analysis (summary/keywords/score/language)
→ threshold. The LLM calls are non-deterministic network I/O; per the
BASELINE north_star they are re-expressed here as *deterministic*
vectorized heuristics with the same dataflow shape and result schema
(llm_client.py:38-97 behavior: snippet truncation 1500/4000, defaults on
malformed output, error → not-relevant).

All functions have a pure-Python scalar core (used by the pytest oracle)
and an Arrow-batched pandas UDF wrapper. No per-row Python UDFs.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# --- F10: programmatic low-quality (list-like) detection -------------------
# Reference behavior: llm_processing_worker.py:37-56.

_DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}")


def is_low_quality_text(text: str) -> bool:
    lines = text.split("\n")
    if len(lines) < 5:
        return False
    short = 0.0
    for line in lines:
        if len(line.strip()) < 50:
            short += 1
        if _DATE_RE.search(line):
            short += 0.5
    return (short / len(lines)) > 0.7


@F.pandas_udf(BooleanType())
def low_quality_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: is_low_quality_text(t) if t is not None else False)


# --- F11: parse-failure sentinel -------------------------------------------
# The reference worker tests for "--- 첨부 파일 처리 실패:" while its
# extractor writes "--- [첨부 파일 처리 실패: ..." (bracketed) — the gate
# never fires as shipped (SURVEY F11). The engine matches the common core
# so both spellings trip the gate; divergence documented here.
PARSE_FAILURE_SENTINEL = "첨부 파일 처리 실패:"


def sentinel_col(text_col):
    return F.coalesce(text_col.contains(PARSE_FAILURE_SENTINEL), F.lit(False))


# --- L1/L2: deterministic relevance heuristics ------------------------------

_TOKEN_RE = re.compile(r"[0-9A-Za-z가-힣]+")
_HANGUL_RE = re.compile(r"[가-힣]")
_LATIN_RE = re.compile(r"[A-Za-z]")

GATEKEEPER_SNIPPET = 1500
ANALYSIS_SNIPPET = 4000


def _tokens(s: str) -> list[str]:
    return [t for t in _TOKEN_RE.findall(s.lower()) if len(t) >= 2]


def gatekeeper_relevant(text: str, instruction: str) -> bool:
    """YES/NO relevance on the first 1500 chars (cheap gate).

    Deterministic stand-in for the LLM call: relevant iff any instruction
    token appears in the snippet. Empty/None → False (reference maps LLM
    errors to False, llm_client.py:63-65)."""
    if not text or not instruction:
        return False
    inst = set(_tokens(instruction))
    if not inst:
        return False
    snippet_tokens = set(_tokens(text[:GATEKEEPER_SNIPPET]))
    return bool(inst & snippet_tokens)


def analyze_content(text: str, instruction: str) -> dict:
    """Deep-analysis stand-in: summary / keywords / relevance / language.

    Result schema and default-filling mirror llm_client.py:88-97
    (score float, keywords list, language 'unknown' fallback)."""
    if not text:
        return {
            "summary": "",
            "keywords": [],
            "relevance_score": 0.0,
            "language": "unknown",
        }
    snippet = text[:ANALYSIS_SNIPPET]
    toks = _tokens(snippet)
    inst = list(dict.fromkeys(_tokens(instruction or "")))
    overlap = len(set(toks) & set(inst))
    score = round(min(1.0, overlap / len(inst)), 3) if inst else 0.0

    sents = [s.strip() for s in snippet.split(".") if len(s.strip()) > 0]
    summary = ". ".join(sents[:3])[:300]

    counts = Counter(toks)
    first_pos = {}
    for i, t in enumerate(toks):
        first_pos.setdefault(t, i)
    keywords = [
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], first_pos[kv[0]]))[:7]
    ]

    hangul = len(_HANGUL_RE.findall(snippet))
    latin = len(_LATIN_RE.findall(snippet))
    total = hangul + latin
    if total == 0:
        language = "unknown"
    elif hangul / total >= 0.3:
        language = "ko"
    else:
        language = "en"

    return {
        "summary": summary,
        "keywords": keywords,
        "relevance_score": score,
        "language": language,
    }


ANALYSIS = StructType(
    [
        StructField("summary", StringType()),
        StructField("keywords", ArrayType(StringType())),
        StructField("relevance_score", DoubleType()),
        StructField("language", StringType()),
    ]
)


@F.pandas_udf(BooleanType())
def gatekeeper_udf(text: pd.Series, instruction: pd.Series) -> pd.Series:
    return pd.Series(
        [gatekeeper_relevant(t, i) for t, i in zip(text, instruction)]
    )


@F.pandas_udf(ANALYSIS)
def analyze_udf(text: pd.Series, instruction: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([analyze_content(t, i) for t, i in zip(text, instruction)])
