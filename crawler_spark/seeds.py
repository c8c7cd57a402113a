"""S1 seed ingestion: the reference's Excel seed list → the engine's
seeds table.

Reference behavior (src/config.py:27-57, studied not copied):
``input/prompt.xlsx`` is read with pandas and the columns are matched
FUZZILY by Korean header keywords — the URL column is whichever header
contains ``주소``, the site-name column contains ``기관`` or ``회사``,
the instruction column contains ``내용``. Rows survive only if the URL
cell is a string starting with ``http``. Each row becomes a site config
with a derived ``site_identifier`` and the global max-pages/crawl-delay
defaults.

Spark surface: :func:`seeds_from_xlsx` (driver-side pandas read — the
seed list is tiny config data, never big data) → ``createDataFrame``
with the engine's SEEDS schema. The xlsx read needs openpyxl; the
column-matching and row-filtering logic is factored into
:func:`seeds_from_pandas` so it is testable without the library.
"""

from __future__ import annotations

import zlib
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from crawler_spark import schemas

# reference config/settings.py defaults fed into each seed row
DEFAULT_MAX_PAGES = 50
DEFAULT_CRAWL_DELAY = 1.0


def site_identifier_py(url: str) -> str:
    """Pure-Python mirror of urlfns.site_identifier (E10):
    ``{second}_{first}`` of the de-www'd netloc unless the 2nd label is a
    {co,go,or} suffix; dashes become underscores."""
    try:
        netloc = urlparse(url).netloc
        parts = netloc.replace("www.", "").split(".")
        if len(parts) > 2 and parts[1] not in ("co", "go", "or"):
            ident = f"{parts[1]}_{parts[0]}"
        else:
            ident = parts[0]
        return ident.replace("-", "_")
    except ValueError:
        # stable fallback id: Python's builtin hash is PYTHONHASHSEED-
        # salted, so it would change across driver restarts and break a
        # resume that joins state keyed on site_id — crc32 is stable.
        return f"site_{zlib.crc32(url.encode('utf-8'))}"


def match_seed_columns(columns) -> tuple[str | None, str | None, str | None]:
    """(url_col, name_col, prompt_col) by the reference's fuzzy keyword
    match; None when a keyword matches no header."""
    url_col = next((c for c in columns if "주소" in str(c)), None)
    name_col = next((c for c in columns if "기관" in str(c) or "회사" in str(c)), None)
    prompt_col = next((c for c in columns if "내용" in str(c)), None)
    return url_col, name_col, prompt_col


def seeds_from_pandas(
    spark: SparkSession,
    pdf: pd.DataFrame,
    max_pages: int = DEFAULT_MAX_PAGES,
    crawl_delay: float = DEFAULT_CRAWL_DELAY,
) -> DataFrame:
    """Fuzzy-matched seed rows → SEEDS-schema DataFrame.

    Raises ValueError when any of the three required headers is missing
    (the reference logs-and-returns-empty; an explicit error is safer in
    a batch engine — an empty seed list would silently crawl nothing).
    """
    url_col, name_col, prompt_col = match_seed_columns(pdf.columns)
    if not all([url_col, name_col, prompt_col]):
        raise ValueError(
            "seed sheet must have headers containing 주소 (url), "
            "기관/회사 (site name) and 내용 (instruction); got "
            f"{list(pdf.columns)}"
        )
    rows = []
    for _, r in pdf.iterrows():
        base_url = r[url_col]
        if isinstance(base_url, str) and base_url.startswith("http"):
            rows.append(
                (
                    site_identifier_py(base_url),
                    str(r[name_col]),
                    base_url,
                    str(r[prompt_col]),
                    int(max_pages),
                    float(crawl_delay),
                )
            )
    return spark.createDataFrame(rows, schemas.SEEDS)


def seeds_from_xlsx(
    spark: SparkSession,
    path: str = "input/prompt.xlsx",
    max_pages: int = DEFAULT_MAX_PAGES,
    crawl_delay: float = DEFAULT_CRAWL_DELAY,
) -> DataFrame:
    """Read the reference's prompt.xlsx into the seeds table. Needs
    openpyxl at runtime (import-guarded like the attachment parsers)."""
    pdf = pd.read_excel(path, engine="openpyxl")
    return seeds_from_pandas(spark, pdf, max_pages, crawl_delay)
