"""WARC source: Common-Crawl-style archives → the engine's pages table.

The north-rule input is "an Iceberg table of Common-Crawl-style web
pages (url, warc_ts, html, text, lang)"; Common Crawl itself ships WARC
files (ISO 28500), so a production user needs exactly one ingestion
step: WARC → that table. ``read_warc`` is that step, Spark-shaped:

* **File-per-task streaming.** The input is a directory/glob of
  ``.warc`` / ``.warc.gz`` files; Spark's ``binaryFile`` reader is used
  ONLY for its distributed listing + partition planning (the ``path``
  column — column pruning keeps file contents unread), and each task
  then STREAMS its file through a fixed-size window: records are
  parsed one ``Content-Length`` block at a time and emitted in bounded
  Arrow batches, so a 1 GB archive never materializes in memory.
  Multi-member gzip (Common Crawl writes one gzip member per record)
  is handled transparently by Python's gzip layer.
* **Keep-rules at the source.** Only ``WARC-Type: response`` records
  whose embedded HTTP response is ``200`` with a ``text/html``
  content type survive — the same keep-rules as the live fetcher
  (operators/fetch.py), so a WARC-ingested corpus and a crawled corpus
  are interchangeable. Oversized payloads (``max_bytes``) are skipped
  by streaming past them, malformed records end the damaged file
  gracefully (best-effort, like every archive reader).
* **Output shape = schemas.PAGES.** ``text``/``lang`` are NULL — they
  are downstream extraction products (html_extract), not archive
  fields.

``export_warc`` is the inverse — a distributed sink writing one
Common-Crawl-layout archive per task (warcinfo head record, one gzip
member per response record) through the same pyarrow FileSystem
abstraction, so crawled corpora round-trip back into the archive
ecosystem. ``write_warc`` is its single-file driver-side sibling for
tests and fixture export.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from crawler_spark import schemas

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block (no trailing blank line) → {lower-name: value}."""
    out: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" not in line:
            continue
        k, _, v = line.partition(b":")
        out[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return out


def _read_until(stream, sep: bytes, cap: int = 64 * 1024) -> bytes | None:
    """Read from ``stream`` until ``sep`` (exclusive; consumed) or None on
    EOF / cap overrun. Byte-at-a-time on a BUFFERED stream — header
    blocks are tiny; bodies are read in one sized read elsewhere."""
    buf = bytearray()
    tail = len(sep)
    while True:
        b = stream.read(1)
        if not b:
            return None
        buf += b
        if len(buf) >= tail and buf[-tail:] == sep:
            return bytes(buf[:-tail])
        if len(buf) > cap:
            return None


def _dechunk(payload: bytes) -> bytes | None:
    """Decode a Transfer-Encoding: chunked body; None if malformed."""
    out = bytearray()
    pos = 0
    while True:
        nl = payload.find(_CRLF, pos)
        if nl == -1:
            return None
        size_tok = payload[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = nl + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are irrelevant here
        if pos + size > len(payload):
            return None
        out += payload[pos : pos + size]
        pos += size + 2  # chunk data + its trailing CRLF


def _http_html_payload(body: bytes) -> bytes | None:
    """HTTP response bytes → decoded payload iff status 200 ∧ text/html
    (the fetcher's keep-rules, operators/fetch.py); else None.

    Common Crawl stores payloads already decoded, but WARCs from wget /
    Heritrix keep the wire form: Transfer-Encoding: chunked framing is
    stripped and gzip/deflate Content-Encoding is decompressed, so the
    ``html`` column always holds page bytes. A body we cannot decode
    (malformed chunking, bad gzip, br/zstd without the codec) is SKIPPED
    — storing framing lines or compressed bytes as html would silently
    corrupt downstream extraction."""
    head, sep, payload = body.partition(_SEP)
    if not sep:
        return None
    lines = head.split(_CRLF)
    status = lines[0].split()
    if len(status) < 2 or not status[0].startswith(b"HTTP/") or status[1] != b"200":
        return None
    headers = _parse_headers(_CRLF.join(lines[1:]))
    if "text/html" not in headers.get("content-type", ""):
        return None
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
        if payload is None:
            return None
    enc = headers.get("content-encoding", "").strip().lower()
    if enc in ("gzip", "x-gzip"):
        try:
            payload = gzip.decompress(payload)
        except OSError:
            return None
    elif enc == "deflate":
        import zlib

        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            try:  # raw-deflate servers (historical IIS behavior)
                payload = zlib.decompress(payload, -zlib.MAX_WBITS)
            except zlib.error:
                return None
    elif enc not in ("", "identity"):
        return None
    return payload


# wire-record slack over max_bytes: the embedded HTTP response head
# (status line + headers) rides inside the WARC record's Content-Length,
# so the pre-read length guard must admit payloads of exactly max_bytes
# plus a bounded head — otherwise a page the fetcher's identical
# keep-rule KEPT (len(body) == max_bytes, operators/fetch.py) would be
# archived by export_warc and then silently dropped on re-ingest. 16 KiB
# covers real-world response heads; the decoded payload is still checked
# against max_bytes exactly after HTTP decode.
_HTTP_HEAD_SLACK = 16 * 1024


def iter_warc_records(stream, max_bytes: int = 10 * 2**20):
    """Yield (url, warc_ts, html) from one WARC byte stream.

    ``max_bytes`` bounds the DECODED html payload (matching the HTTP
    fetcher's keep-rule, so archive → re-ingest keeps exactly the pages
    the fetch kept); records whose wire form exceeds it by more than a
    bounded HTTP-head allowance are streamed past without materializing.
    Pure Python + stdlib so it is unit-testable without Spark; the
    distributed path maps it over files. Stops (without raising) at EOF
    or the first structurally damaged record."""
    stream = io.BufferedReader(stream, 1 << 16)
    while True:
        head = _read_until(stream, _SEP)
        if head is None:
            return
        head = head.lstrip(b"\r\n")  # inter-record blank lines
        if not head.startswith(b"WARC/"):
            return
        headers = _parse_headers(head.split(_CRLF, 1)[1] if _CRLF in head else b"")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length would pass the size guard and turn the
            # sized read into read-to-EOF, materializing the rest of the
            # archive in memory — treat as structurally damaged
            return
        keep = (
            headers.get("warc-type") == "response"
            and "warc-target-uri" in headers
            and length <= max_bytes + _HTTP_HEAD_SLACK
        )
        if keep:
            body = stream.read(length)
            if len(body) < length:
                return
        else:
            # stream past the body without materializing it
            left = length
            while left > 0:
                chunk = stream.read(min(left, 1 << 20))
                if not chunk:
                    return
                left -= len(chunk)
            body = None
        # record terminator
        if stream.read(len(_SEP)) != _SEP:
            return
        if body is None:
            continue
        payload = _http_html_payload(body)
        if payload is None or len(payload) > max_bytes:
            # the exact keep-rule bound, applied post-decode so chunked/
            # compressed wire forms are judged by what they decode to
            continue
        raw_ts = headers.get("warc-date", "").replace("Z", "+00:00")
        try:
            ts = datetime.fromisoformat(raw_ts).astimezone(timezone.utc)
        except ValueError:
            continue
        url = headers["warc-target-uri"]
        # Common Crawl wraps some target URIs in <>
        if url.startswith("<") and url.endswith(">"):
            url = url[1:-1]
        yield url, ts, payload


def read_warc(
    spark: SparkSession,
    path: str,
    max_bytes: int = 10 * 2**20,
    batch_rows: int = 256,
    files_per_partition: int = 1,
) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` files → schemas.PAGES.

    Listing + partition planning ride Spark's binaryFile source (paths
    only — contents are never loaded into rows); each task streams its
    files through ``iter_warc_records`` and yields ``batch_rows``-sized
    Arrow batches. ``text``/``lang`` are NULL (extraction products).
    Listing recurses into subdirectories (``export_warc`` lays out one
    ``wave-N/`` dir per wave, and Common Crawl segments its crawls the
    same way) and skips ``*.inprogress`` temporaries a killed export
    task may have left behind."""
    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path")
        .filter(~F.col("path").endswith(".inprogress"))
    )
    n_files = paths.count()
    n_parts = max(1, (n_files + files_per_partition - 1) // files_per_partition)
    paths = paths.repartition(n_parts)

    def gen(batches):
        from pyarrow.fs import FileSystem

        def flush(rows):
            return pd.DataFrame(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": [r[1] for r in rows],
                    "html": [r[2] for r in rows],
                    "text": pd.Series([None] * len(rows), dtype=object),
                    "lang": pd.Series([None] * len(rows), dtype=object),
                }
            )

        rows: list[tuple] = []
        for pdf in batches:
            for p in pdf["path"]:
                fs, rel = FileSystem.from_uri(str(p))
                # compression=None: pyarrow would otherwise auto-detect
                # by extension and decompress as ONE stream; Common
                # Crawl gzips one member PER RECORD, which Python's
                # gzip layer is documented to concatenate transparently
                raw = fs.open_input_stream(rel, compression=None)
                stream = gzip.GzipFile(fileobj=raw) if rel.endswith(".gz") else raw
                try:
                    for rec in iter_warc_records(stream, max_bytes):
                        rows.append(rec)
                        if len(rows) >= batch_rows:
                            yield flush(rows)
                            rows = []
                finally:
                    stream.close()
        if rows:
            yield flush(rows)

    return paths.mapInPandas(gen, schemas.PAGES)


def latest_captures(pages: DataFrame) -> DataFrame:
    """One row per url — the LATEST capture wins (max warc_ts; ties break
    on the raw bytes so the pick is deterministic, never first-row-wins).

    Real WARC collections capture the same url many times (Common Crawl
    re-crawls across segments and monthly crawls; this engine's own
    per-wave ``--warc-out`` archives re-capture a url once per site that
    reaches it). The engine's simulated fetch is an equi-join against
    the pages table, so duplicate urls FAN OUT: one selected frontier
    row becomes N fetch rows, which triples terminal frontier versions,
    duplicates crawled rows, and inflates fetch metrics. Apply this at
    the ingest boundary (``run_crawl --warc`` does) — one groupBy at
    init, amortized over every wave, instead of forcing a 10^10-row
    dedup inside the engine for the common already-unique case."""
    cols = [c for c in pages.columns if c != "url"]
    return (
        pages.groupBy("url")
        .agg(F.max(F.struct("warc_ts", *[c for c in cols if c != "warc_ts"])).alias("_s"))
        .select("url", *[F.col(f"_s.{c}").alias(c) for c in cols])
    )


def _warc_ts_str(ts) -> str:
    """Timestamp → WARC-Date string (UTC, second precision)."""
    if ts.tzinfo is None:
        # Spark timestamps arrive in pandas as tz-naive instants in the
        # session timezone (UTC for this engine) — stamp, don't shift
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _response_record(url: str, ts_s: str, html: bytes) -> bytes:
    """One spec-compliant response record (WARC header + embedded HTTP).
    ``ts_s`` is a preformatted WARC-Date string (``_warc_ts_str``)."""
    # a CR/LF inside the url would terminate the header line early and
    # inject arbitrary WARC headers — strip, never emit
    url = url.replace("\r", "").replace("\n", "")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(html)).encode() + _SEP
        + html
    )
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {ts_s}\r\n".encode()
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"Content-Type: application/http; msgtype=response"
        + _SEP
        + http
        + _SEP
    )


def _warcinfo_record(ts_s: str) -> bytes:
    """File-head warcinfo record (Common Crawl's layout). The date is the
    first response's WARC-Date — deterministic, no wall clock."""
    info = b"software: crawler-spark\r\nformat: WARC File Format 1.0\r\n"
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        + f"WARC-Date: {ts_s}\r\n".encode()
        + f"Content-Length: {len(info)}\r\n".encode()
        + b"Content-Type: application/warc-fields"
        + _SEP
        + info
        + _SEP
    )


def write_warc(path: str, records, gzipped: bool | None = None) -> None:
    """Write (url, warc_ts, html_bytes) records as a spec-compliant WARC
    file — one gzip member per record when gzipped (Common Crawl's
    layout), inferred from the filename by default. Local paths only
    (a test/export utility; the distributed sink is ``export_warc``)."""
    if gzipped is None:
        gzipped = path.endswith(".gz")
    with open(path, "wb") as f:
        for url, ts, html in records:
            rec = _response_record(url, _warc_ts_str(ts), html)
            f.write(gzip.compress(rec) if gzipped else rec)


_EXPORT_MANIFEST = StructType(
    [
        StructField("path", StringType(), False),
        StructField("n_records", LongType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def export_warc(
    df: DataFrame,
    out_dir: str,
    gzipped: bool = True,
    n_files: int | None = None,
    compresslevel: int = 6,
) -> "list":
    """Distributed WARC sink: pages-shaped rows → Common-Crawl-layout
    archives under ``out_dir``; the inverse of ``read_warc``
    (round-trip-tested). Runs the export and returns the manifest rows
    ``(path, n_records, n_bytes)``.

    * **One archive per task.** Each task streams its partition through
      ``_response_record`` into ``part-{pid:05d}.warc[.gz]`` — a
      warcinfo head record then one gzip member PER RECORD (Common
      Crawl's layout, and what makes ``read_warc``'s multi-member gzip
      path work). ``n_files`` repartitions first (e.g. total_rows /
      records-per-archive); default keeps the input partitioning.
    * **Cluster-capable paths.** Files are opened through
      ``pyarrow.fs.FileSystem.from_uri`` — the same abstraction the
      reader uses — so local dirs, ``hdfs://`` and ``s3://`` all work
      from executors.
    * **Task-retry safe.** Tasks write an attempt-unique ``*.inprogress``
      then move to the deterministic final name, so retried/speculative
      attempts never interleave into one file and the last mover wins
      (rename is atomic on POSIX/HDFS; copy-on-move object stores get
      last-writer-wins). A failing attempt deletes its partial tmp, and
      ``read_warc`` skips ``*.inprogress`` regardless (crash backstop).
    * Rows with NULL html (no archivable payload) or NULL warc_ts (no
      truthful WARC-Date) are skipped (counted nowhere — filter
      upstream to audit them).
    * ``compresslevel`` defaults to 6: at archive scale gzip CPU is the
      sink's bottleneck, and level 9 costs ~2× the CPU of 6 for a
      low-single-digit-% size win on HTML.

    The manifest is collected on the driver — it is O(n_files), not
    O(rows)."""
    # NULL html has no archivable payload; NULL warc_ts has no truthful
    # WARC-Date to stamp (and NaT cannot format) — both are skipped the
    # same way: filter upstream to audit them
    cols = df.filter(
        F.col("html").isNotNull() & F.col("warc_ts").isNotNull()
    ).select("url", "warc_ts", "html")
    if n_files is not None:
        cols = cols.repartition(max(1, int(n_files)))
    ext = ".warc.gz" if gzipped else ".warc"
    if "://" not in out_dir:
        # FileSystem.from_uri rejects relative paths ("URI has empty
        # scheme"); absolutize on the DRIVER so executor tasks with a
        # different cwd still agree on the destination
        import os

        out_dir = os.path.abspath(out_dir)

    def gen(batches):
        from pyarrow.fs import FileSystem
        from pyspark import TaskContext

        tc = TaskContext.get()
        fs, base = FileSystem.from_uri(out_dir)
        final_rel = f"{base.rstrip('/')}/part-{tc.partitionId():05d}{ext}"
        # attempt-unique tmp: a speculative twin or retried attempt must
        # never interleave writes into the same in-progress file
        tmp_rel = f"{final_rel}.{tc.taskAttemptId()}.inprogress"
        out = None
        n = n_bytes = 0
        try:
            for pdf in batches:
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    ts_s = _warc_ts_str(ts)
                    rec = _response_record(str(url), ts_s, bytes(html))
                    if out is None:  # defer creation: empty task → no file
                        fs.create_dir(base, recursive=True)  # idempotent
                        head = _warcinfo_record(ts_s)
                        if gzipped:
                            head = gzip.compress(head, compresslevel)
                        out = fs.open_output_stream(tmp_rel, compression=None)
                        out.write(head)
                        n_bytes += len(head)
                    body = gzip.compress(rec, compresslevel) if gzipped else rec
                    out.write(body)
                    n += 1
                    n_bytes += len(body)
        except BaseException:
            # a dead attempt must not leave its partial file behind:
            # read_warc's listing would pick the orphan up (duplicate or
            # garbage records). The retry writes its own attempt-unique
            # tmp, so deleting ours races nothing.
            if out is not None:
                out.close()
                try:
                    fs.delete_file(tmp_rel)
                except OSError:
                    pass  # cleanup is best-effort; the listing filter
                    # on *.inprogress is the backstop
            raise
        else:
            if out is not None:
                out.close()
        if out is not None:
            fs.move(tmp_rel, final_rel)
            yield pd.DataFrame(
                {"path": [final_rel], "n_records": [n], "n_bytes": [n_bytes]}
            )

    return cols.mapInPandas(gen, _EXPORT_MANIFEST).collect()
