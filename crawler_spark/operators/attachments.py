"""Attachment parsing pipeline (E8/E9/S3/S7): extension-dispatched
document-to-text over binary payloads, with the reference's failure
semantics.

Reference behavior being re-expressed (data_extractor*.py, studied):
* dispatch table keyed on file extension (.pdf/.docx/.xlsx/.pptx/.hwp);
* parsed text is appended to the page text wrapped in
  ``--- [첨부 파일 시작: name] --- … --- [첨부 파일 끝] ---`` markers;
* a parse failure writes the sentinel line the downstream F11 gate keys
  on, and the raw payload goes to the failed-attachments sink.

The sandbox ships none of the document libraries (pypdf, python-docx,
openpyxl, python-pptx, hwp5 — all verified absent), so each format
parser is import-guarded: present → real parse; absent → raises, which
flows into the *failure path* (sentinel + failed sink) — i.e. the
distributed plumbing, dispatch, marker formatting, sentinel semantics
and failure sink are all real and tested; only the per-format byte
decoding needs the libraries. ``.txt``/``.csv`` parse for real (stdlib)
so the success path is exercised end-to-end too.

Spark surface: one ``mapInPandas`` stage over ``(url, payload)`` —
Arrow-batched, streaming through batches, no driver collect.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from pathlib import PurePosixPath
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

ATTACHMENT_START = "--- [첨부 파일 시작: {name}] ---"
ATTACHMENT_END = "--- [첨부 파일 끝] ---"
PARSE_FAIL_SENTINEL = "--- [첨부 파일 처리 실패: {name}] ---"


def _parse_txt(content: bytes) -> str:
    return content.decode("utf-8", errors="ignore")


def _parse_csv(content: bytes) -> str:
    df = pd.read_csv(io.BytesIO(content))
    return df.to_string()


def _parse_pdf(content: bytes) -> str:
    from pypdf import PdfReader  # import-guarded: absent in sandbox

    return "\n".join(
        p.extract_text() for p in PdfReader(io.BytesIO(content)).pages if p.extract_text()
    )


def _parse_docx(content: bytes) -> str:
    from docx import Document  # import-guarded

    return "\n".join(p.text for p in Document(io.BytesIO(content)).paragraphs if p.text)


def _parse_excel(content: bytes) -> str:
    xls = pd.ExcelFile(io.BytesIO(content))  # needs openpyxl at runtime
    return "\n\n".join(xls.parse(s).to_string() for s in xls.sheet_names)


def _parse_pptx(content: bytes) -> str:
    from pptx import Presentation  # import-guarded

    prs = Presentation(io.BytesIO(content))
    return "\n".join(
        sh.text for sl in prs.slides for sh in sl.shapes if hasattr(sh, "text")
    )


def _parse_hwp(content: bytes) -> str:
    # import-guarded like pdf/docx: the reference's target domain
    # (Korean gov sites) is HWP-heavy (dispatch parity:
    # src/crawler/data_extractor.py:36-40). Absent lib → ImportError →
    # the standard failure-sentinel path.
    import hwp5  # noqa: F401

    from hwp5.hwp5txt import TextTransform
    from hwp5.xmlmodel import Hwp5File

    out = io.StringIO()
    TextTransform().transform_hwp5_to_text(Hwp5File(io.BytesIO(content)), out)
    return out.getvalue()


PARSERS = {
    ".txt": _parse_txt,
    ".csv": _parse_csv,
    ".pdf": _parse_pdf,
    ".docx": _parse_docx,
    ".xlsx": _parse_excel,
    ".xls": _parse_excel,
    ".pptx": _parse_pptx,
    ".hwp": _parse_hwp,
}


# Extensions the dispatch table can parse (keep in sync with PARSERS).
PARSER_EXT_RE = r"(?i)\.(txt|csv|pdf|docx|xlsx|xls|pptx|hwp)$"


def classify_attachment_links(
    df: DataFrame, url_col: str = "url", base_col: str = "base_url"
) -> DataFrame:
    """E9 + E7: split extracted links into attachment candidates vs page
    links, mirroring the reference's link loop
    (src/crawler/data_extractor.py:148-161):

    * a link whose query carries ``file=`` is a PDF-viewer wrapper — the
      attachment URL is the decoded ``file`` target (E7 rewrite), taken
      unconditionally;
    * otherwise a link whose path extension is in the parser dispatch
      table AND whose host matches the site base is an attachment (E9);
    * everything else is a page link.

    Adds ``attachment_url`` (the URL to fetch — rewritten for viewer
    links) and ``is_attachment``. Viewer detection runs through the
    JVM-guarded split of :func:`crawler_spark.canon.with_viewer_rewrite`,
    so non-``file=`` rows never leave codegen.
    """
    from pyspark.sql import functions as F

    from crawler_spark.canon import with_viewer_rewrite

    out = with_viewer_rewrite(df, url_col, base_col)
    # viewer detection is the UDF's non-null result (is_viewer), not a
    # real_url != url string inequality — a viewer link whose decoded
    # file target equals the original URL is still an attachment.
    same_host = F.lower(
        F.parse_url(F.col(url_col), F.lit("HOST"))
    ) == F.lower(F.parse_url(F.col(base_col), F.lit("HOST")))
    ext_hit = F.parse_url(F.col("real_url"), F.lit("PATH")).rlike(PARSER_EXT_RE)
    # coalesce: a NULL base_url (→ NULL same_host) must classify as a
    # page link (False), not propagate NULL through the boolean algebra
    return out.withColumn(
        "is_attachment",
        F.coalesce(F.col("is_viewer") | (ext_hit & same_host), F.lit(False)),
    ).withColumnRenamed("real_url", "attachment_url").drop("is_viewer")


def attachment_name(url: str) -> str:
    return PurePosixPath(urlparse(url).path).name


def parse_attachment(url: str, payload: bytes | None) -> tuple[str, bool]:
    """(text_block, ok). Failure → the F11 sentinel block (ok=False)."""
    name = attachment_name(url)
    ext = PurePosixPath(name).suffix.lower()
    parser = PARSERS.get(ext)
    if parser is None:
        return "", False
    try:
        text = parser(payload or b"")
        if not text:
            raise ValueError("parser returned empty text")
        return (
            f"\n\n{ATTACHMENT_START.format(name=name)}\n{text}\n{ATTACHMENT_END}\n",
            True,
        )
    except Exception:
        return f"\n\n{PARSE_FAIL_SENTINEL.format(name=name)}\n", False


PARSED = StructType(
    [
        StructField("url", StringType()),
        StructField("text_block", StringType()),
        StructField("ok", BooleanType()),
    ]
)

FAILED = StructType(
    [
        StructField("url", StringType()),
        StructField("reason", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def parse_attachments(df: DataFrame) -> DataFrame:
    """(url, payload) → (url, text_block, ok) via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, oks = [], []
            for u, p in zip(pdf["url"], pdf["payload"]):
                t, ok = parse_attachment(u, p)
                texts.append(t)
                oks.append(ok)
            yield pd.DataFrame({"url": pdf["url"], "text_block": texts, "ok": oks})

    return df.mapInPandas(gen, PARSED)


def failed_attachment_sink(df: DataFrame, parsed: DataFrame) -> DataFrame:
    """S7: rows whose parse failed, with raw payload preserved for the
    failed-attachments table (reference saves bytes + meta json)."""
    bad = parsed.filter(~parsed["ok"]).select("url")
    return df.join(bad, "url", "left_semi").select(
        "url", df["payload"]
    ).withColumn("reason", _lit_parse_failed())


def _lit_parse_failed():
    from pyspark.sql import functions as F

    return F.lit("parse_failed_or_unsupported")
