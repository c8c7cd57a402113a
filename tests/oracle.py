"""Pure-Python crawl oracle: a faithful single-process transcription of
the reference crawl semantics (fast agent wave loop, SURVEY §3.1), run
over the synthetic corpus. The engine's distributed output must match it
exactly — wave-by-wave batch ordering, final URL-seen set, crawled set.

Independent of the engine: URLs/links come from the generator manifest
(template knowledge), texts from the corpus `text` column, and all gate
logic is re-transcribed here from the reference behavior.
"""

from __future__ import annotations

import hashlib
from collections import deque
from pathlib import PurePosixPath
from urllib.parse import urlparse

import pyarrow.parquet as pq


def load_pages(corpus_dir: str) -> dict[str, str]:
    t = pq.read_table(f"{corpus_dir}/pages.parquet", columns=["url", "text"])
    return dict(zip(t.column("url").to_pylist(), t.column("text").to_pylist()))


def load_ledger(corpus_dir: str) -> dict[str, str]:
    t = pq.read_table(f"{corpus_dir}/ledger_seed.parquet", columns=["url", "content_hash"])
    return dict(zip(t.column("url").to_pylist(), t.column("content_hash").to_pylist()))


def load_kb(corpus_dir: str) -> dict[tuple[str, str], dict]:
    t = pq.read_table(f"{corpus_dir}/kb_seed.parquet").to_pylist()
    return {(r["site_id"], r["pattern"]): r for r in t}


def load_robots(corpus_dir: str) -> dict[str, dict]:
    t = pq.read_table(f"{corpus_dir}/robots.parquet").to_pylist()
    return {r["host"]: r for r in t}


def kb_pattern(url: str) -> str:
    path = urlparse(url).path
    last = path.split("/")[-1]
    return str(PurePosixPath(path).parent) if "." in last else path


def is_valid_url(url: str, base_netloc: str) -> bool:
    p = urlparse(url)
    if p.scheme not in ("http", "https"):
        return False
    # hosts compare case-insensitively (RFC 3986 §3.2.2), mirroring
    # urlfns.netloc_of / html_extract.extract_links
    if p.netloc.lower() != base_netloc.lower():
        return False
    if "#" in url or "javascript:void(0)" in url:
        return False
    return True


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def oracle_crawl_fifo(
    corpus_dir: str,
    manifest: dict,
    site_id: str,
    base_url: str,
    batch_size: int = 20,
    max_pages: int = 10**9,
    link_cap: int = 50,
    use_kb: bool = True,
    use_ledger: bool = True,
) -> dict:
    """Reference-parity BFS for one site. Returns waves/visited/crawled."""
    pages = load_pages(corpus_dir)
    graph = manifest["graph"]
    kb = load_kb(corpus_dir) if use_kb else {}
    ledger = load_ledger(corpus_dir) if use_ledger else {}
    base_netloc = urlparse(base_url).netloc

    def kb_gated(url: str) -> bool:
        e = kb.get((site_id, kb_pattern(url)))
        if not e:
            return False
        if e["count"] >= 3 and e["avg_score"] < 0.4:
            return True
        if e["failure_count"] >= 3:
            return True
        return False

    queue = deque([base_url])
    visited = {base_url}
    scanned = 0
    waves: list[list[str]] = []
    crawled: list[str] = []

    while queue and scanned < max_pages:
        batch = []
        while len(batch) < batch_size and queue:
            url = queue.popleft()
            if kb_gated(url):
                continue
            batch.append(url)
        if not batch:
            break
        waves.append(list(batch))
        for url in batch:
            text = pages.get(url)
            if text is None:  # fetch failure (not an html page)
                continue
            if not text:  # F13 empty-text guard
                continue
            scanned += 1
            if ledger.get(url) == sha256_hex(text):  # F8 unchanged
                continue
            crawled.append(url)
            for lurl, _anchor in graph[url][:link_cap]:
                if lurl not in visited and is_valid_url(lurl, base_netloc):
                    visited.add(lurl)
                    queue.append(lurl)
    return {
        "waves": waves,
        "visited": visited,
        "crawled": crawled,
        "scanned": scanned,
    }


def oracle_crawl_priority(
    corpus_dir: str,
    manifest: dict,
    site_id: str,
    base_url: str,
    batch_size: int,
    wave_seconds: float,
    seed_delay: float = 1.0,
    max_pages: int = 10**9,
    link_cap: int = 50,
    open_crawl: bool = False,
) -> dict:
    """Politeness-mode oracle (engine-defined semantics: robots prefix
    filter; per-host quota floor(wave_seconds/max(seed,robots delay));
    per-wave order by (-score, depth, seq); KB gates consume all pending
    gated rows per wave). ``open_crawl`` admits cross-host links
    (Common-Crawl-style multi-host frontier)."""
    pages = load_pages(corpus_dir)
    graph = manifest["graph"]
    kb = load_kb(corpus_dir)
    ledger = load_ledger(corpus_dir)
    robots = load_robots(corpus_dir)
    base_netloc = urlparse(base_url).netloc

    def kb_gated(url: str) -> bool:
        e = kb.get((site_id, kb_pattern(url)))
        return bool(
            e and ((e["count"] >= 3 and e["avg_score"] < 0.4) or e["failure_count"] >= 3)
        )

    def robots_blocked(url: str) -> bool:
        # RFC 9309 longest-match precedence (ties to allow), matching
        # politeness.robots_filter for the PLAIN-PREFIX rule tables the
        # parity webs use (corpora without allow rules reduce to the
        # any-prefix disallow check). Exact */$ wildcard semantics are
        # pinned separately: test_robots.py unit tests + the
        # hand-derived regex oracle in queries()['robots_wildcards'].
        host = urlparse(url).netloc.lower()
        r = robots.get(host)
        if not r:
            return False
        parts = urlparse(url)
        # RFC 9309 matches path + '?' + query, like the engine
        path = (parts.path or "/") + (f"?{parts.query}" if parts.query else "")
        dis = max((len(p) for p in r["disallow"] if path.startswith(p)), default=-1)
        alw = max(
            (len(p) for p in r.get("allow") or [] if path.startswith(p)), default=-1
        )
        return dis > alw

    def quota(host: str) -> int:
        r = robots.get(host)
        rd = r["crawl_delay"] if r else 0.0
        delay = max(seed_delay, rd)
        return max(1, int(wave_seconds // delay))

    # pending: url -> (depth, score, seq)
    pending = {base_url: (0, 1.0, 1)}
    visited = {base_url}
    next_seq = 2
    scanned = 0
    waves: list[list[str]] = []
    crawled: list[str] = []

    while pending and scanned < max_pages:
        # consume KB-gated + robots-blocked
        live = {}
        for url, meta in pending.items():
            if kb_gated(url) or robots_blocked(url):
                continue  # consumed
            live[url] = meta
        removed_all_gated = len(live) < len(pending)
        pending = live
        if not pending:
            if not removed_all_gated:
                break
            continue
        # per-host quota rank by (-score, depth, seq)
        by_host: dict[str, list] = {}
        for url, (d, s, q) in pending.items():
            by_host.setdefault(urlparse(url).netloc.lower(), []).append((url, d, s, q))
        selected = []
        for host, items in by_host.items():
            items.sort(key=lambda it: (-it[2], it[1], it[3]))
            selected.extend(items[: quota(host)])
        selected.sort(key=lambda it: (-it[2], it[1], it[3]))
        batch = selected[:batch_size]
        if not batch:
            break
        waves.append([u for u, *_ in batch])
        # link expansion iterates parents in seq order — the engine assigns
        # new seqs by rank over (parent_seq, link_idx), independent of the
        # batch's priority order, and in-wave dedup keeps the min
        # (parent_seq, link_idx) claimant.
        from crawler_spark.functions.html_extract import content_quality

        for url, depth, score, seq in sorted(batch, key=lambda it: it[3]):
            del pending[url]
            text = pages.get(url)
            if text is None or not text:
                continue
            scanned += 1
            if ledger.get(url) == sha256_hex(text):
                continue
            crawled.append(url)
            q = content_quality(text)  # child score = parent page quality
            for lurl, _anchor in graph[url][:link_cap]:
                if lurl in visited:
                    continue
                if open_crawl:
                    p = urlparse(lurl)
                    ok = (
                        p.scheme in ("http", "https")
                        and "#" not in lurl
                        and "javascript:void(0)" not in lurl
                    )
                else:
                    ok = is_valid_url(lurl, base_netloc)
                if ok:
                    visited.add(lurl)
                    pending[lurl] = (depth + 1, q, next_seq)
                    next_seq += 1
    return {"waves": waves, "visited": visited, "crawled": crawled, "scanned": scanned}
