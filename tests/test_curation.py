"""Curation operators (gopher stats / PII redaction / decontamination)
vs an independent pure-Python brute force, plus plan shape assertions.

The brute force here shares NO code with crawler_spark.operators.curation
— words via str.split(), gram counting via collections.Counter, PII via
the stdlib re module — so agreement is evidence, not tautology.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.curation import (
    GOPHER_MAX_DUP3GRAM_FRAC,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_TOP2GRAM_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_WORDS,
    decontaminate,
    gopher_stats,
    pii_redact,
)

DOCS = [
    (0, ""),
    (1, "single"),
    (2, "two words"),
    (3, "a b c d e f g h"),  # exactly 8 words -> one 8-shingle per window
    (4, "the the the the the the the the the the"),  # max repetition
    (5, "alpha beta gamma delta " * 15),  # 60 words, all 2-grams repeat
    (6, " ".join(f"w{i}" for i in range(50))),  # 50 distinct words
    (7, "  padded   with \t odd\nwhitespace  "),
    (8, "   \t\n  "),  # whitespace-only incl. tabs: trim() would NOT
    # strip these — words must still be [] (caught by a hostile drive)
    (9, None),  # NULL text behaves like empty
]


def brute_gopher(text: str | None) -> dict:
    words = (text or "").split()
    n = len(words)
    mean_wl = round(sum(len(w) for w in words) / n, 6) if n else 0.0
    g2 = Counter(
        " ".join(words[i : i + 2]) for i in range(n - 1)
    )
    g3 = Counter(
        " ".join(words[i : i + 3]) for i in range(n - 2)
    )
    tot2, tot3 = sum(g2.values()), sum(g3.values())
    f2 = round(max(g2.values()) / tot2, 6) if tot2 else 0.0
    f3 = round((tot3 - len(g3)) / tot3, 6) if tot3 else 0.0
    gpass = int(
        GOPHER_MIN_WORDS <= n <= 100_000
        and GOPHER_MIN_MEAN_WORD_LEN <= mean_wl <= GOPHER_MAX_MEAN_WORD_LEN
        and f2 <= GOPHER_MAX_TOP2GRAM_FRAC
        and f3 <= GOPHER_MAX_DUP3GRAM_FRAC
    )
    return {
        "n_words": n,
        "mean_word_len": mean_wl,
        "frac_top2gram": f2,
        "frac_dup3gram": f3,
        "gopher_pass": gpass,
    }


def test_gopher_stats_vs_brute_force(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in gopher_stats(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        exp = brute_gopher(text)
        row = got[doc_id]
        for k, v in exp.items():
            assert row[k] == pytest.approx(v, abs=1e-9), (doc_id, k, row[k], v)
    # sanity on the planted extremes
    assert got[4]["frac_top2gram"] == 1.0 and got[4]["gopher_pass"] == 0
    assert got[5]["frac_dup3gram"] > 0.9 and got[5]["gopher_pass"] == 0
    assert got[6]["frac_top2gram"] == pytest.approx(round(1 / 49, 6))


PII_CASES = [
    (0, "mail a.b-c_d%e+f@sub.example.co.uk end", 1, 0, 0),
    (1, "call +1-555-012-3456 now", 0, 1, 0),
    (2, "plain 555 0123 4567 digits", 0, 1, 0),
    (3, "host 10.0.0.1 and 192.168.255.42", 0, 0, 2),
    (4, "x@y.io or z@w.org plus 8.8.8.8", 2, 0, 1),
    (5, "no pii here, just words and 42", 0, 0, 0),
    (6, "", 0, 0, 0),
    (7, "a@b.com tel +49 30 123456 ip 127.0.0.1", 1, 1, 1),
]


def test_pii_redact_counts_and_text_vs_re(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in PII_CASES], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?\d[\d -]{7,}\d"
    ip = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
    for doc_id, text, ne, np_, ni in PII_CASES:
        r = got[doc_id]
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (ne, np_, ni), (
            doc_id,
            r,
        )
        expected = re.sub(
            ip,
            "<IP>",
            re.sub(phone, "<PHONE>", re.sub(email, "<EMAIL>", text)),
        )
        assert r["redacted"] == expected, (doc_id, r["redacted"], expected)
        # redaction is complete: nothing PII-shaped survives
        for pat in (email, phone, ip):
            assert not re.search(pat, r["redacted"]), (doc_id, pat)


def brute_shingles(text: str, k: int = 8) -> set[str]:
    words = text.split()
    if len(words) >= k:
        return {
            " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
        }
    return {" ".join(words)} if words else set()


def test_decontaminate_vs_brute_force(spark):
    bench_docs = [(100, "b1 b2 b3 b4 b5 b6 b7 b8 b9"), (101, "short bench")]
    corpus = [
        (0, "b2 b3 b4 b5 b6 b7 b8 b9 tail words here on top"),  # overlaps
        (1, "clean c1 c2 c3 c4 c5 c6 c7 c8 c9"),  # no overlap
        (2, "short bench"),  # whole-doc shingle hits the short bench doc
        (3, ""),  # no shingles -> no output row
    ]
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            spark.createDataFrame(corpus, ["doc_id", "text"]),
            spark.createDataFrame(bench_docs, ["doc_id", "text"]),
            k=8,
        ).collect()
    }
    bench_set = set().union(*(brute_shingles(t) for _, t in bench_docs))
    for doc_id, text in corpus:
        sh = brute_shingles(text)
        if not sh:
            assert doc_id not in out
            continue
        hits = len(sh & bench_set)
        r = out[doc_id]
        assert r["n_shingles"] == len(sh)
        assert r["n_contaminated"] == hits
        assert r["contaminated"] == int(hits > 0)
    assert out[0]["contaminated"] == 1
    assert out[1]["contaminated"] == 0
    assert out[2]["contaminated"] == 1


def test_curate_packets_routes_and_redacts(spark):
    from crawler_spark.operators.curation import curate_packets

    good = " ".join(f"unique{i} token{i}" for i in range(30))  # 60 words
    rows = [
        ("p0", "s0", good + " mail me at a@b.com or 10.0.0.1"),
        ("p1", "s0", "spam " * 80),  # repetition: top-2gram frac 1.0
        ("p2", "s0", "too short"),  # under the word floor
        ("p3", "s1", good),
    ]
    packets = spark.createDataFrame(
        rows, ["packet_id", "site_id", "extracted_text"]
    )
    kept, failed = curate_packets(packets)
    kept_rows = {r["packet_id"]: r for r in kept.collect()}
    failed_ids = {r["packet_id"] for r in failed.collect()}
    assert set(kept_rows) == {"p0", "p3"}
    assert failed_ids == {"p1", "p2"}
    assert kept.columns == packets.columns  # schema preserved
    assert "<EMAIL>" in kept_rows["p0"]["extracted_text"]
    assert "<IP>" in kept_rows["p0"]["extracted_text"]
    assert "a@b.com" not in kept_rows["p0"]["extracted_text"]
    assert kept_rows["p3"]["extracted_text"] == good  # no PII -> unchanged
    # redact=False keeps text verbatim
    kept2, _ = curate_packets(packets, redact=False)
    t = {r["packet_id"]: r["extracted_text"] for r in kept2.collect()}
    assert "a@b.com" in t["p0"]


def test_gopher_stats_scans_source_once(spark, tmp_path):
    """gopher_stats must read the corpus ONCE and shuffle NOTHING — at
    100 TB the scan is the expensive resource and the row-local plan
    needs no gram-keyed exchange at all; a stats-frame + grams-frame
    join (2-3 scans) or a reintroduced explode → groupBy shuffle is the
    regression this pins against."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"some text body number {i} with words") for i in range(50)],
        ["doc_id", "text"],
    ).write.parquet(p)
    df = gopher_stats(spark.read.parquet(p))
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # formatted explain lists each node twice (tree + details) — count
    # the numbered detail headers, i.e. distinct physical scan nodes
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Exchange" not in plan, plan


def test_decontaminate_broadcasts_bench_side(spark):
    """The benchmark shingle set must broadcast — a corpus-sized shuffle
    on the shingle key is the scale failure mode this operator avoids."""
    corpus = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc words "), F.col("id").cast("string")).alias("text"),
    )
    bench = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("bench text sample").alias("text")
    )
    df = decontaminate(corpus, bench, k=8)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan


# --- deterministic content-keyed sampling -------------------------------------

def test_deterministic_sample_matches_hashlib_brute_force(spark):
    import hashlib

    from crawler_spark.operators.curation import deterministic_sample

    rows = [
        (i, f"document body {i} with distinct content", ["en", "ko", "zz"][i % 3])
        for i in range(300)
    ] + [(900, None, "en"), (901, "", "ko")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {"en": 0.3, "ko": 0.6}  # no "*": unlisted strata dropped
    got = {
        r["doc_id"]: r["sample_key"]
        for r in deterministic_sample(df, rates).collect()
    }
    exp = {}
    for doc_id, text, lang in rows:
        key = hashlib.sha256((text or "").encode()).hexdigest()[:8]
        thr = {"en": "4ccccccc", "ko": "99999999"}.get(lang)
        if thr is not None and key < thr:
            exp[doc_id] = key
    assert got == exp
    assert 0 < len(got) < len(rows)


def test_deterministic_sample_stable_under_repartitioning(spark):
    """The property df.sample does NOT have: the selected set must be
    identical at any partitioning (on a cluster: any executor count)."""
    from crawler_spark.operators.curation import deterministic_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text number "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    a = {r["doc_id"] for r in deterministic_sample(df.coalesce(1), 0.4).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(32, "doc_id"), 0.4).collect()
    }
    assert a == b and 100 < len(a) < 300


def test_deterministic_sample_salt_gives_independent_draws(spark):
    from crawler_spark.operators.curation import deterministic_sample

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    a = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, 0.5, salt="v2").collect()}
    assert a != b  # different draw...
    overlap = len(a & b) / max(1, len(a))
    assert 0.3 < overlap < 0.7  # ...but independent, not disjoint
    # rate >= 1 keeps everything; rate 0 keeps nothing
    assert deterministic_sample(df, 1.0).count() == 400
    assert deterministic_sample(df, 0.0).count() == 0


def test_deterministic_sample_is_scan_side_predicate(spark, tmp_path):
    """No shuffle, no Python: the keep decision must stay a JVM filter
    on the scan (at 100 TB the sample IS the scan)."""
    import re

    from crawler_spark.operators.curation import deterministic_sample

    p = str(tmp_path / "docs.parquet")
    spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    ).write.parquet(p)
    out = deterministic_sample(spark.read.parquet(p), {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "pythonUDF" not in plan and "ArrowEval" not in plan, plan


# --- token-budget corpus packing ----------------------------------------------

def _pack_oracle(rows, budget):
    """Brute force: running inclusive sum in (score desc, id) order."""
    out, cum = {}, 0
    for score, doc_id, toks in sorted(
        ((s, i, t) for i, s, t in rows), key=lambda x: (-x[0], x[1])
    ):
        cum += toks
        if cum <= budget:
            out[doc_id] = cum
    return out


@pytest.mark.parametrize("n_parts", [1, 4, 32])
def test_token_budget_pack_matches_brute_force(spark, n_parts):
    from crawler_spark.operators.curation import token_budget_pack

    rng = __import__("random").Random(7)
    # heavy ties: scores drawn from just 9 values so ties straddle
    # bucket boundaries; token counts vary
    rows = [(i, rng.randint(1, 9), rng.randint(5, 40)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_pack(df, budget=3000, n_parts=n_parts).collect()
    }
    assert got == _pack_oracle(rows, 3000)


def test_token_budget_pack_edges(spark):
    from crawler_spark.operators.curation import token_budget_pack

    df = spark.createDataFrame(
        [(1, 5, 100), (2, 5, 100), (3, 4, 100)],
        "doc_id long, score long, n_tokens long",
    )
    # boundary inclusive: budget exactly consumed
    assert {r["doc_id"] for r in token_budget_pack(df, 200).collect()} == {1, 2}
    # budget smaller than the first doc: nothing survives
    assert token_budget_pack(df, 99).count() == 0
    # all-equal scores degenerate to one bucket but stay correct
    eq = spark.createDataFrame(
        [(i, 7, 10) for i in range(20)], "doc_id long, score long, n_tokens long"
    )
    assert {r["doc_id"] for r in token_budget_pack(eq, 55).collect()} == set(range(5))


def test_token_budget_pack_never_single_partition_sort(spark):
    """The cumulative sum must run as per-bucket windows — a plan that
    funnels the corpus through SinglePartition (the naive global-order
    window) is the regression this pins."""
    from crawler_spark.operators.curation import token_budget_pack

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("long").alias("score"),
        F.lit(10).cast("long").alias("n_tokens"),
    )
    out = token_budget_pack(df, budget=5000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window in the plan must be partitioned by the bucket id
    # (windowspecdefinition's first arg); the only SinglePartition
    # exchange allowed is the 1-row global min/max score aggregate
    assert "windowspecdefinition(_pid" in plan, plan
    import re

    bad = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(" in ln
        and not re.search(r"windowspecdefinition\(_pid", ln)
    ]
    assert not bad, bad


# --- host-diversity cap ---------------------------------------------------------

def test_host_cap_matches_brute_force(spark):
    from crawler_spark.operators.curation import host_cap

    rng = __import__("random").Random(3)
    # skewed: host h0 has 120 docs, others ~10; tied scores everywhere
    rows = [(i, "h0", rng.randint(1, 5)) for i in range(120)]
    rows += [(1000 + i, f"h{1 + i % 4}", rng.randint(1, 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, host string, score long")
    got = {
        (r["doc_id"], r["host_rank"])
        for r in host_cap(df, n=7).collect()
    }
    exp = set()
    byhost = {}
    for doc_id, host, score in rows:
        byhost.setdefault(host, []).append((-score, doc_id))
    for host, lst in byhost.items():
        for rank, (_, doc_id) in enumerate(sorted(lst)[:7], start=1):
            exp.add((doc_id, rank))
    assert got == exp
