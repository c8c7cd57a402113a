"""Manifest-driven reads for BUCKET_APPEND merge-on-read logs.

The checkpoint records each committed delta's bucket→leaf map, so the
read path (``read`` / ``read_buckets``) never lists the filesystem —
the property that keeps per-wave reads O(manifest) on object storage,
where LISTing thousands of delta dirs would dominate wave latency.
These tests pin: (1) the manifest is written at commit and compaction,
(2) reads resolve purely from it (FS discovery forbidden via a raising
stub), (3) pre-manifest checkpoints still read via the FS fallback.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.tableio import BUCKET_APPEND, TableCatalog

SCHEMA = "url_hash long, v int"


def _mk(spark, root):
    cat = TableCatalog(spark, str(root))
    cat.register("log", BUCKET_APPEND, n_buckets=4)
    return cat


def _stage_commit(spark, cat, wave, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    cat.stage("log", df, wave)
    cat.commit(wave)


def _forbid_fs_listing(cat):
    def boom(rel):  # pragma: no cover - only fires on regression
        raise AssertionError(f"read path listed the filesystem: {rel}")

    cat._leaf_buckets = boom


def test_manifest_written_and_reads_are_listing_free(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    _stage_commit(spark, cat, 0, [(0, 10), (1, 11), (5, 15)])  # buckets 0,1
    _stage_commit(spark, cat, 1, [(2, 22), (7, 27)])           # buckets 2,3

    # the checkpoint itself carries the bucket→leaf map per delta
    with open(os.path.join(str(tmp_path), "_checkpoint.json")) as f:
        st = json.load(f)
    assert set(st["delta_buckets"]["log"]) == set(st["deltas"]["log"])
    for rel, leaves in st["delta_buckets"]["log"].items():
        assert leaves, f"empty manifest for {rel}"
        for b, leaf in leaves.items():
            assert leaf.startswith(rel) and f"_b={b}" in leaf

    # reads must resolve from the manifest alone
    _forbid_fs_listing(cat)
    assert sorted(r["v"] for r in cat.read("log").collect()) == [10, 11, 15, 22, 27]
    got = cat.read_buckets("log", [1, 2]).select("url_hash", "v").collect()
    # bucket(k) = pmod(url_hash, 4): hashes 1,5 → bucket 1; 2 → bucket 2
    assert sorted(r["v"] for r in got) == [11, 15, 22]


def test_manifest_survives_catalog_reload(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    _stage_commit(spark, cat, 0, [(0, 10), (3, 13)])
    cat2 = _mk(spark, tmp_path)  # fresh catalog = resume path
    _forbid_fs_listing(cat2)
    assert sorted(r["v"] for r in cat2.read("log").collect()) == [10, 13]


def test_compaction_rebuilds_manifest(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    _stage_commit(spark, cat, 0, [(0, 10), (1, 11)])
    _stage_commit(spark, cat, 1, [(4, 44), (2, 22)])  # 4 supersedes hash-0? no: append log
    cat.compact("log")
    st = cat._state
    assert len(st["deltas"]["log"]) == 1
    (crel,) = st["deltas"]["log"]
    assert set(st["delta_buckets"]["log"]) == {crel}

    _forbid_fs_listing(cat)
    assert sorted(r["v"] for r in cat.read("log").collect()) == [10, 11, 22, 44]
    assert sorted(
        r["v"] for r in cat.read_buckets("log", [0]).collect()
    ) == [10, 44]  # hashes 0 and 4 → bucket 0


def test_pre_manifest_checkpoint_falls_back_to_fs(spark, tmp_path):
    """A checkpoint written before the manifest existed (no delta_buckets
    key) must still read correctly via filesystem discovery."""
    cat = _mk(spark, tmp_path)
    _stage_commit(spark, cat, 0, [(0, 10), (1, 11)])
    p = os.path.join(str(tmp_path), "_checkpoint.json")
    with open(p) as f:
        st = json.load(f)
    del st["delta_buckets"]
    with open(p, "w") as f:
        json.dump(st, f)

    cat2 = _mk(spark, tmp_path)
    assert sorted(r["v"] for r in cat2.read("log").collect()) == [10, 11]
    assert sorted(r["v"] for r in cat2.read_buckets("log", [1]).collect()) == [11]


def test_manifest_matches_fs_discovery(spark, tmp_path):
    """The recorded map is exactly what FS discovery would find."""
    cat = _mk(spark, tmp_path)
    _stage_commit(spark, cat, 0, [(i, 100 + i) for i in range(8)])
    (drel,) = cat._state["deltas"]["log"]
    assert cat._delta_leaf_map("log", drel) == cat._leaf_buckets(drel)


def test_meta_staged_until_commit_and_survives_reload(spark, tmp_path):
    """set_meta is staged (invisible before commit), published atomically
    WITH the next commit, and durable across catalog reloads — the
    contract the streaming checkpoint-lineage binding relies on."""
    cat = _mk(spark, tmp_path)
    cat.set_meta("stream_query_id", "q-abc")
    assert cat.get_meta("stream_query_id") is None  # staged, not committed
    _stage_commit(spark, cat, 0, [(0, 10)])
    assert cat.get_meta("stream_query_id") == "q-abc"
    cat2 = _mk(spark, tmp_path)
    assert cat2.get_meta("stream_query_id") == "q-abc"
    assert cat2.get_meta("missing", "dflt") == "dflt"
