"""Frontier micro-ops: distributed seq assignment ≡ Window path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawler_spark.operators.frontier import assign_seq


def test_distributed_assign_seq_matches_window(spark):
    rng = random.Random(3)
    rows = []
    for site in ("a", "b"):
        for _ in range(5000):
            rows.append((site, rng.randint(1, 400), rng.randint(0, 49), rng.random()))
    links = spark.createDataFrame(
        rows, "site_id string, parent_seq long, link_idx int, payload double"
    ).dropDuplicates(["site_id", "parent_seq", "link_idx"])
    max_seq = spark.createDataFrame(
        [("a", 100), ("b", 7)], "site_id string, _max_seq long"
    )
    w = {
        (r["site_id"], r["parent_seq"], r["link_idx"]): r["seq"]
        for r in assign_seq(links, max_seq, distributed=False).collect()
    }
    d = {
        (r["site_id"], r["parent_seq"], r["link_idx"]): r["seq"]
        for r in assign_seq(links, max_seq, distributed=True, n_parts=16).collect()
    }
    assert w == d
    # seqs are consecutive per site starting after max_seq
    for site, start in (("a", 100), ("b", 7)):
        seqs = sorted(v for (s, *_), v in w.items() if s == site)
        assert seqs[0] == start + 1 and seqs == list(range(start + 1, start + 1 + len(seqs)))


def test_distributed_assign_seq_single_parent(spark):
    """Degenerate range (_lo == _hi) must not divide by zero or skew."""
    links = spark.createDataFrame(
        [("s", 5, i, float(i)) for i in range(40)],
        "site_id string, parent_seq long, link_idx int, payload double",
    )
    max_seq = spark.createDataFrame([("s", 0)], "site_id string, _max_seq long")
    got = sorted(
        r["seq"] for r in assign_seq(links, max_seq, distributed=True, n_parts=8).collect()
    )
    assert got == list(range(1, 41))
