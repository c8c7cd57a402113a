"""Generate the DuckDB-oracle fixture parquets for the deterministic
pure-function queries (doc_fingerprint, density_extract).

Run from the repo root:  python tests/gen_fixtures.py

* ``doc_fingerprint``: expected values come from an INDEPENDENT pure-
  Python reimplementation of the winnowing fingerprint (min crc32 over
  8-word sliding windows) — no imports from crawler_spark, so the
  fixture cross-checks the operator, not just its determinism.
* ``density_extract``: expected extracted-text lengths are computed once
  through the engine's own pure function and pinned — a regression
  oracle (the extractor's behavioral correctness is covered separately
  by the unit suite in tests/test_density_extractor.py).
* ``gate_cascade``: the cascade's pure gate functions are evaluated
  driver-side row by row and pinned — the oracle then validates the
  Spark-side plumbing (UDF wiring, gate-order filters, struct
  projection) end to end; the gates' semantics are covered by
  tests/test_cascade.py.

The oracle_sql() entries read these files by absolute path; the driver
contract runs at sf0.01, so fixtures are generated for that sf.
"""

from __future__ import annotations

import os
import sys
import zlib

import duckdb
import pandas as pd

SF = "0.01"
SF_DIR = f"/root/testdata/sf{SF}"
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def fingerprint_independent(text: str | None, window: int = 8) -> int:
    """Independent reimplementation: min crc32 over 8-word windows (one
    whole-text window when the document is shorter)."""
    words = (text or "").split()
    if not words:
        return 0
    if len(words) <= window:
        spans = [" ".join(words)]
    else:
        spans = [" ".join(words[i : i + window]) for i in range(len(words) - window + 1)]
    return min(zlib.crc32(s.encode("utf-8")) for s in spans)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.makedirs(OUT_DIR, exist_ok=True)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).df()

    fp = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "fingerprint": [fingerprint_independent(t) for t in docs["text"]],
        }
    )
    fp["fingerprint"] = fp["fingerprint"].astype("int64")
    fp.to_parquet(os.path.join(OUT_DIR, f"doc_fingerprint_sf{SF}.parquet"), index=False)

    from crawler_spark.functions.scoring import (
        analyze_content,
        gatekeeper_relevant,
        is_low_quality_text,
    )

    instruction = "data query batch window partition"
    rows = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        if t is None or is_low_quality_text(t):
            continue
        if not gatekeeper_relevant(t, instruction):
            continue
        a = analyze_content(t, instruction)
        if a["relevance_score"] >= 0.2:
            rows.append((doc_id, a["relevance_score"], a["language"]))
    gc = pd.DataFrame(rows, columns=["doc_id", "relevance_score", "language"])
    gc.to_parquet(os.path.join(OUT_DIR, f"gate_cascade_sf{SF}.parquet"), index=False)

    from crawler_spark.functions.html_extract import extract_page_density

    lens = []
    for t in docs["text"]:
        html = (
            "<html><body><div class='content'><p>"
            + (t or "")
            + "</p></div><footer>Copyright x</footer></body></html>"
        ).encode("utf-8")
        r = extract_page_density(html, "https://d.example.org/x", "d.example.org")
        lens.append(len(r["text"]) if r and r.get("text") is not None else None)
    de = pd.DataFrame({"doc_id": docs["doc_id"], "extracted_len": lens})
    de["extracted_len"] = de["extracted_len"].astype("int64")
    de.to_parquet(os.path.join(OUT_DIR, f"density_extract_sf{SF}.parquet"), index=False)
    print(f"wrote fixtures for sf{SF} to {OUT_DIR}")


if __name__ == "__main__":
    main()
