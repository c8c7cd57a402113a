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
