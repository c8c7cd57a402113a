"""Production HTTP fetch stage (the S2/S3 network boundary, real).

Semantics mirror the reference fetcher (reference/src/crawler/
high_performance_extractor.py:201-247): a page is kept iff the response
status is 200 AND ``'text/html' in Content-Type``; anything else —
non-200, wrong type, timeout, connection error — yields NULL html and
flows to the wave's failure path. The body is returned as raw bytes;
the downstream extract UDF decodes utf-8 with ``errors='ignore'``
(functions/html_extract.py:100), byte-equivalent to the reference's
``response.text(encoding='utf-8', errors='ignore')``.

Concurrency (the distributed analog of the reference's
``asyncio.Semaphore(20)`` batch cap + ``TCPConnector(limit_per_host=20)``
— high_performance_extractor.py:65-72 and :223): the wave batch arrives
hash-partitioned on ``url_hash`` across executors, and within each task
a thread pool issues up to ``max_concurrency`` requests with at most
``per_host`` in flight per host. Politeness proper (robots rules,
crawl-delay budgets) is enforced UPSTREAM at batch selection
(operators/politeness.py) — the fetcher's caps are anti-hammering
backstops, not the scheduler.

Shape: ``mapInPandas`` over Arrow batches — no per-row Python UDF, no
driver-side loop; one task streams its batches through the pool with
constant memory (``max_bytes`` caps any single body). The operator is
interface-identical to the simulated fetch join in wave.py (input: the
wave batch; output: batch columns + ``_html`` binary), so the wave loop
swaps stages by config (``CrawlConfig.fetch_mode``) and the simulated
path remains the deterministic parity oracle in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StructField, StructType

DEFAULT_USER_AGENT = "crawler-spark/0.1 (+https://example.invalid/bot)"


def fetch_one(
    url: str,
    timeout_s: float = 10.0,
    user_agent: str = DEFAULT_USER_AGENT,
    max_bytes: int = 10 * 2**20,
) -> bytes | None:
    """One HTTP GET with the reference keep-rules; None on any failure.

    Kept as a module-level function (not a closure) so tests can probe
    the status/content-type/timeout matrix without a Spark session.
    """
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            status = getattr(resp, "status", None) or resp.getcode()
            if status != 200:
                return None
            ctype = resp.headers.get("Content-Type") or ""
            if "text/html" not in ctype:
                return None
            # oversize pages are SKIPPED, not truncated — a cut-off body
            # would silently extract wrong text/links; this matches the
            # WARC source's max_bytes keep-rule (sources/warc.py)
            body = resp.read(max_bytes + 1)
            return None if len(body) > max_bytes else body
    except Exception:
        # non-200 raised as HTTPError, timeouts, refused connections,
        # DNS failures: all map to "page not fetched" (reference behavior:
        # exceptions become None — :218-220), never a task failure
        return None


def fetch_binary_one(
    url: str,
    timeout_s: float = 10.0,
    user_agent: str = DEFAULT_USER_AGENT,
    max_bytes: int = 10 * 2**20,
) -> tuple[bytes | None, str | None]:
    """One attachment GET → (bytes, content_type), (None, None) on failure.

    Reference semantics (aio_extractor.py:114-133): ``raise_for_status``
    keeps only successful responses (redirects followed), the body is
    streamed REGARDLESS of content type (attachments are pdf/docx/hwp/…),
    any exception maps to a skipped attachment. Content type comes from
    the response header with the reference's octet-stream fallback.

    Unlike ``fetch_one``, an oversize body is TRUNCATED at ``max_bytes``
    rather than skipped: robots.txt consumers are required to parse the
    first 500 KiB of an arbitrarily large file (RFC 9309 §2.5), and a
    truncated attachment fails its format parser and lands in the
    failed-attachments path instead of corrupting output."""
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            status = getattr(resp, "status", None) or resp.getcode()
            if status != 200:
                return None, None
            ctype = (
                (resp.headers.get("Content-Type") or "application/octet-stream")
                .split(";")[0]
                .strip()
                or "application/octet-stream"
            )
            return resp.read(max_bytes), ctype
    except Exception:
        return None, None


def _pooled_fetch(
    batch: DataFrame,
    url_col: str,
    out_fields: list[StructField],
    fetchfn,
    max_concurrency: int,
    per_host: int,
) -> DataFrame:
    """Shared fetch scaffolding: mapInPandas over Arrow batches, one
    thread pool per task capped at ``max_concurrency`` in-flight requests
    with at most ``per_host`` per hostname (executor-local caps — with E
    executors a host sees at most E×per_host connections; size like the
    reference's per-worker connector limits). ``fetchfn(url)`` returns a
    tuple aligned with ``out_fields``."""
    out_schema = StructType(batch.schema.fields + out_fields)
    cols = batch.columns
    names = [f_.name for f_ in out_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import threading
        from concurrent.futures import ThreadPoolExecutor
        from urllib.parse import urlparse

        sems: dict[str, threading.BoundedSemaphore] = {}
        sems_lock = threading.Lock()

        def sem_for(host: str) -> threading.BoundedSemaphore:
            with sems_lock:
                s = sems.get(host)
                if s is None:
                    s = sems[host] = threading.BoundedSemaphore(per_host)
                return s

        def fetch(url: str) -> tuple:
            with sem_for(urlparse(url).netloc.lower()):
                return fetchfn(url)

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                # pool.map preserves input order → row alignment is exact
                results = list(pool.map(fetch, (str(u) for u in pdf[url_col])))
                out = pdf[cols].copy()
                for i, name in enumerate(names):
                    out[name] = pd.Series(
                        [r[i] for r in results], index=out.index, dtype=object
                    )
                yield out

    return batch.mapInPandas(gen, out_schema)


def http_fetch(
    batch: DataFrame,
    url_col: str = "canonical_url",
    timeout_s: float = 10.0,
    max_concurrency: int = 20,
    per_host: int = 20,
    user_agent: str = DEFAULT_USER_AGENT,
    max_bytes: int = 10 * 2**20,
) -> DataFrame:
    """Fetch every row's ``url_col`` over HTTP → batch columns + ``_html``
    (NULL on any failure or non-html response — the S2 keep-rules)."""
    return _pooled_fetch(
        batch,
        url_col,
        [StructField("_html", BinaryType())],
        lambda u: (fetch_one(u, timeout_s, user_agent, max_bytes),),
        max_concurrency,
        per_host,
    )


def http_fetch_attachments(
    batch: DataFrame,
    url_col: str = "attachment_url",
    timeout_s: float = 10.0,
    max_concurrency: int = 20,
    per_host: int = 20,
    user_agent: str = DEFAULT_USER_AGENT,
    max_bytes: int = 10 * 2**20,
) -> DataFrame:
    """Fetch attachment binaries (S3, real) → batch columns +
    ``_content`` (binary, NULL on failure) + ``_content_type``. Feed
    ``_content`` to operators/attachments.py parse_attachments — the
    same interface the simulated binary plumbing uses, so the stage
    swaps in behind the existing parsers."""
    from pyspark.sql.types import StringType

    return _pooled_fetch(
        batch,
        url_col,
        [
            StructField("_content", BinaryType()),
            StructField("_content_type", StringType()),
        ],
        lambda u: fetch_binary_one(u, timeout_s, user_agent, max_bytes),
        max_concurrency,
        per_host,
    )
