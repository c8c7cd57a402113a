"""WARC source (sources/warc.py): record matrix, damage tolerance, the
distributed reader's pages-table contract, and a corpus round-trip."""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

from pyspark.sql import functions as F

from crawler_spark.sources.warc import iter_warc_records, read_warc, write_warc

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
SEP = b"\r\n\r\n"


def _record(wtype: str, url: str | None, body: bytes, ts: str = "2024-03-01T12:00:00Z") -> bytes:
    head = f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Date: {ts}\r\n".encode()
    if url is not None:
        head += f"WARC-Target-URI: {url}\r\n".encode()
    head += f"Content-Length: {len(body)}\r\n".encode()
    head += b"Content-Type: application/http; msgtype=response"
    return head + SEP + body + SEP


def _http(status: int, ctype: str, payload: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}".encode() + SEP + payload
    )


def test_iter_warc_record_matrix():
    """Only 200 ∧ text/html responses survive — the fetcher's keep-rules."""
    stream = io.BytesIO(
        _record("warcinfo", None, b"software: test")
        + _record("request", "https://h/x", b"GET /x HTTP/1.1" + SEP)
        + _record("response", "https://h/ok", _http(200, "text/html; charset=utf-8", b"<html>ok</html>"))
        + _record("response", "https://h/404", _http(404, "text/html", b"gone"))
        + _record("response", "https://h/plain", _http(200, "text/plain", b"nope"))
        + _record("revisit", "https://h/re", b"")
        + _record("response", "<https://h/wrapped>", _http(200, "text/html", b"<html>w</html>"))
    )
    got = [(u, bytes(h)) for u, _, h in iter_warc_records(stream)]
    assert got == [
        ("https://h/ok", b"<html>ok</html>"),
        ("https://h/wrapped", b"<html>w</html>"),  # CC's <>-wrapped URI
    ]


def test_iter_warc_damage_and_caps():
    ok = _record("response", "https://h/a", _http(200, "text/html", b"<html>a</html>"))
    # truncated second record: the good prefix is still yielded
    stream = io.BytesIO(ok + b"WARC/1.0\r\nWARC-Type: resp")
    assert [u for u, _, _ in iter_warc_records(stream)] == ["https://h/a"]
    # not a WARC at all / empty
    assert list(iter_warc_records(io.BytesIO(b"PK\x03\x04zipfile"))) == []
    assert list(iter_warc_records(io.BytesIO(b""))) == []
    # oversized record is streamed past, later records still parse
    big = _record("response", "https://h/big", _http(200, "text/html", b"x" * 4096))
    stream = io.BytesIO(big + ok)
    got = [u for u, _, _ in iter_warc_records(stream, max_bytes=1024)]
    assert got == ["https://h/a"]
    # bad WARC-Date is skipped, not fatal
    bad_ts = _record("response", "https://h/badts",
                     _http(200, "text/html", b"<html>t</html>"), ts="not-a-date")
    stream = io.BytesIO(bad_ts + ok)
    assert [u for u, _, _ in iter_warc_records(stream)] == ["https://h/a"]
    # a NEGATIVE Content-Length would pass the size guard and turn the
    # sized read into read-to-EOF (materializing the rest of the archive
    # in one allocation) — it must end the damaged file instead
    neg = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://h/neg\r\nWARC-Date: 2024-03-01T12:00:00Z\r\n"
        b"Content-Length: -1" + SEP
    )
    stream = io.BytesIO(neg + b"x" * (1 << 20) + ok)
    assert list(iter_warc_records(stream, max_bytes=1024)) == []


def test_iter_warc_wire_form_payloads():
    """wget/Heritrix-style WARCs keep the wire form: chunked framing is
    stripped, gzip/deflate content-encoding is decompressed, and bodies
    that cannot be decoded are skipped instead of stored as garbage."""
    import zlib

    page = b"<html>wire</html>"
    chunked = b"7\r\n<html>w\r\nA\r\nire</html>\r\n0\r\n\r\n"
    http_chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked" + SEP + chunked
    )
    gz = gzip.compress(page)
    http_gzip = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip" + SEP + gz
    )
    http_deflate_raw = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate" + SEP
        + zlib.compress(page)[2:-4]  # raw-deflate (historical IIS form)
    )
    http_chunked_gzip = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip" + SEP
        + f"{len(gz):x}".encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    http_bad_gzip = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip" + SEP + b"not gzip at all"
    )
    http_unknown_enc = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: br" + SEP + b"\x1b\x02\x80compressed"
    )
    stream = io.BytesIO(
        _record("response", "https://h/chunked", http_chunked)
        + _record("response", "https://h/gz", http_gzip)
        + _record("response", "https://h/deflate", http_deflate_raw)
        + _record("response", "https://h/both", http_chunked_gzip)
        + _record("response", "https://h/badgz", http_bad_gzip)
        + _record("response", "https://h/br", http_unknown_enc)
    )
    got = {u: bytes(h) for u, _, h in iter_warc_records(stream)}
    assert got == {
        "https://h/chunked": page,
        "https://h/gz": page,
        "https://h/deflate": page,
        "https://h/both": page,
        # badgz (undecodable) and br (codec absent) are skipped
    }


def test_read_warc_distributed(spark, tmp_path):
    """Reader contract: .warc + multi-member .warc.gz in one directory →
    schemas.PAGES rows with NULL text/lang."""
    recs1 = [("https://a.example/1", TS, b"<html>one</html>")]
    recs2 = [
        ("https://b.example/2", TS, b"<html>two</html>"),
        ("https://b.example/3", TS, b"<html>three \xf0\x28</html>"),  # raw bytes
    ]
    write_warc(str(tmp_path / "a.warc"), recs1)
    write_warc(str(tmp_path / "b.warc.gz"), recs2)  # one gzip member/record
    (tmp_path / "ignored.txt").write_text("not a warc")

    df = read_warc(spark, str(tmp_path))
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://a.example/1", "https://b.example/2", "https://b.example/3"}
    assert bytes(rows["https://b.example/3"]["html"]) == b"<html>three \xf0\x28</html>"
    assert all(r["text"] is None and r["lang"] is None for r in rows.values())
    assert rows["https://a.example/1"]["warc_ts"] is not None


def test_warc_corpus_roundtrip(spark, corpus_dir):
    """Synthetic corpus pages → WARC → read_warc reproduces (url, html)
    exactly, so a WARC-ingested corpus is interchangeable with a
    generated one as engine input."""
    import tempfile

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").limit(40)
    recs = [
        (r["url"], r["warc_ts"].replace(tzinfo=timezone.utc, microsecond=0), bytes(r["html"]))
        for r in pages.collect()
    ]
    with tempfile.TemporaryDirectory() as d:
        write_warc(f"{d}/c.warc.gz", recs)
        back = read_warc(spark, d)
        orig = {(r["url"], bytes(r["html"])) for r in pages.collect()}
        got = {(r["url"], bytes(r["html"])) for r in back.collect()}
        assert got == orig
        assert back.count() == 40


def test_export_warc_distributed_roundtrip(spark, corpus_dir):
    """Distributed sink: pages → export_warc (N archives, warcinfo head,
    one gzip member per record) → read_warc reproduces (url, html)
    exactly; manifest counts match; NULL-html rows are skipped; empty
    partitions produce no file."""
    import tempfile

    from crawler_spark.sources.warc import export_warc

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").limit(50)
    with_null = pages.unionByName(
        pages.limit(1).withColumn("html", F.lit(None).cast("binary"))
    )
    with tempfile.TemporaryDirectory() as d:
        manifest = export_warc(with_null, d, gzipped=True, n_files=4)
        assert 1 <= len(manifest) <= 4
        assert sum(m["n_records"] for m in manifest) == 50  # null-html skipped
        assert all(m["path"].endswith(".warc.gz") for m in manifest)
        assert all(m["n_bytes"] > 0 for m in manifest)
        import os

        assert not any(f.endswith(".inprogress") for f in os.listdir(d))
        # warcinfo head record is present and skipped by the reader
        with open(manifest[0]["path"], "rb") as f:
            head = gzip.GzipFile(fileobj=f).read(64)
        assert b"WARC-Type: warcinfo" in head
        back = read_warc(spark, d)
        orig = {(r["url"], bytes(r["html"])) for r in pages.collect()}
        got = {(r["url"], bytes(r["html"])) for r in back.collect()}
        assert got == orig


def test_export_warc_uncompressed_single_file(spark, tmp_path):
    """gzipped=False writes plain .warc; n_files=1 coalesces to one
    archive with a deterministic name."""
    from crawler_spark.sources.warc import export_warc

    df = spark.createDataFrame(
        [("https://a.example/1", TS, b"<html>one</html>", None, None),
         ("https://a.example/2", TS, b"<html>two</html>", None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    manifest = export_warc(df, str(tmp_path), gzipped=False, n_files=1)
    assert [m["path"].rsplit("/", 1)[1] for m in manifest] == ["part-00000.warc"]
    assert manifest[0]["n_records"] == 2
    got = {r["url"] for r in read_warc(spark, str(tmp_path)).collect()}
    assert got == {"https://a.example/1", "https://a.example/2"}


def test_read_warc_recursive_and_inprogress(spark, tmp_path):
    """The reader recurses into per-wave subdirectories (export_warc's
    --warc-out layout, and Common Crawl's segment layout) and skips
    *.inprogress temporaries a killed export attempt left behind —
    otherwise crawl → --warc-out → --warc would silently yield an empty
    (or duplicated) corpus."""
    w0 = tmp_path / "wave-00000"
    w1 = tmp_path / "wave-00001"
    w0.mkdir()
    w1.mkdir()
    write_warc(str(w0 / "part-00000.warc"), [("https://a/1", TS, b"<html>one</html>")])
    write_warc(str(w1 / "part-00000.warc.gz"), [("https://a/2", TS, b"<html>two</html>")])
    # a stale tmp whose records would double-count if listed
    write_warc(
        str(w0 / "part-00001.warc.7.inprogress"),
        [("https://a/1", TS, b"<html>one</html>")],
    )
    got = sorted(r["url"] for r in read_warc(spark, str(tmp_path)).collect())
    assert got == ["https://a/1", "https://a/2"]


def test_export_warc_relative_outdir_and_null_ts(spark, tmp_path, monkeypatch):
    """A relative out_dir is absolutized on the driver (FileSystem.from_uri
    rejects scheme-less relative paths), and NULL-warc_ts rows are skipped
    like NULL-html rows instead of crashing the task on NaT."""
    from crawler_spark.sources.warc import export_warc

    monkeypatch.chdir(tmp_path)
    df = spark.createDataFrame(
        [
            ("https://a/1", TS, b"<html>x</html>"),
            ("https://a/null-ts", None, b"<html>y</html>"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    manifest = export_warc(df, "rel/warc_out", n_files=1)
    assert sum(m["n_records"] for m in manifest) == 1
    got = [r["url"] for r in read_warc(spark, str(tmp_path / "rel/warc_out")).collect()]
    assert got == ["https://a/1"]


def test_iter_warc_max_bytes_is_the_decoded_payload_bound():
    """max_bytes bounds the DECODED html payload exactly — a page the
    fetcher's keep-rule kept at len(body) == max_bytes survives the
    archive → re-ingest round trip (the wire record is bigger by the
    embedded HTTP head), one byte over is dropped, and a compressed
    wire form is judged by what it decodes to."""
    mb = 2048
    body = b"x" * mb
    edge = _record("response", "https://h/edge", _http(200, "text/html", body))
    assert [u for u, _, h in iter_warc_records(io.BytesIO(edge), max_bytes=mb)] == [
        "https://h/edge"
    ]
    over = _record("response", "https://h/over", _http(200, "text/html", body + b"y"))
    assert list(iter_warc_records(io.BytesIO(over), max_bytes=mb)) == []
    # gzip content-encoding that decompresses past the bound: dropped
    gz = gzip.compress(b"z" * (mb * 4))
    http_gz = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip" + SEP + gz
    )
    bomb = _record("response", "https://h/bomb", http_gz)
    assert list(iter_warc_records(io.BytesIO(bomb), max_bytes=mb)) == []


def test_response_record_strips_crlf_injection():
    """CR/LF in a url cannot terminate the header line early and inject
    WARC headers — the record stays parseable with the sanitized URI."""
    from crawler_spark.sources.warc import _response_record

    rec = _response_record(
        "https://h/x\r\nWARC-Type: evil", "2024-03-01T12:00:00Z", b"<html>i</html>"
    )
    got = list(iter_warc_records(io.BytesIO(rec)))
    assert len(got) == 1
    assert got[0][0] == "https://h/xWARC-Type: evil"
    assert bytes(got[0][2]) == b"<html>i</html>"


def test_latest_captures_one_row_per_url(spark):
    """Re-captured urls collapse to the LATEST capture (max warc_ts);
    exact-ts ties break deterministically on the remaining columns, never
    first-row-wins — the simulated fetch's one-row-per-url contract."""
    from datetime import datetime, timezone

    from crawler_spark.sources.warc import latest_captures

    t0 = datetime(2024, 3, 1, tzinfo=timezone.utc)
    t1 = datetime(2024, 4, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [
            ("https://a/1", t0, b"<html>old</html>", None, None),
            ("https://a/1", t1, b"<html>new</html>", None, None),
            ("https://a/2", t0, b"<html>aa</html>", None, None),
            ("https://a/2", t0, b"<html>zz</html>", None, None),  # ts tie
            ("https://a/3", t0, b"<html>only</html>", None, None),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {r["url"]: r for r in latest_captures(df).collect()}
    assert sorted(got) == ["https://a/1", "https://a/2", "https://a/3"]
    assert bytes(got["https://a/1"]["html"]) == b"<html>new</html>"
    assert got["https://a/1"]["warc_ts"] == t1.replace(tzinfo=None)
    # the ts tie picks the max over the remaining columns — stable
    assert bytes(got["https://a/2"]["html"]) == b"<html>zz</html>"
    assert set(latest_captures(df).columns) == set(df.columns)
