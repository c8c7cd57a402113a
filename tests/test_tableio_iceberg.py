"""Iceberg backend: statement-builder units run everywhere; catalog
behavior tests are jar-gated (skip when the session has no Iceberg
catalog — this sandbox ships no jars, see tableio_iceberg.py)."""

from __future__ import annotations

import pytest

from crawler_spark.tableio import (
    APPEND,
    BUCKET_APPEND,
    BUCKET_REPLACE,
    REPLACE,
    _Spec,
)
from crawler_spark.tableio_iceberg import (
    IcebergUnavailable,
    base_columns_sql,
    ddl_for,
    iceberg_available,
    maintenance_sql,
    make_catalog,
)


def test_stage_schema_yields_no_duplicate_partition_column():
    """stage() calls _ensure_table with the ALREADY-AUGMENTED frame (the
    _b / wave column added); base_columns_sql must strip the column
    ddl_for re-appends, or every bucketed/REPLACE table fails its first
    CREATE with a duplicate-column error and the backend cannot
    bootstrap."""
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    seen_aug = StructType(
        [
            StructField("url_hash", LongType()),
            StructField("url", StringType()),
            StructField("_b", IntegerType()),
        ]
    )
    spec = _Spec(BUCKET_APPEND, 32)
    sql = ddl_for("ice.crawl.seen", spec, base_columns_sql(spec, seen_aug))
    assert sql.count("_b") == 2  # column decl + PARTITIONED BY — not 3
    assert "_b int, _b INT" not in sql

    kb_aug = StructType(
        [StructField("site_id", StringType()), StructField("wave", IntegerType())]
    )
    spec = _Spec(REPLACE)
    sql = ddl_for("ice.crawl.kb", spec, base_columns_sql(spec, kb_aug))
    assert sql.count("wave") == 2

    # key_is_bucket tables are NOT augmented: nothing may be stripped
    filt = StructType(
        [StructField("bucket", IntegerType()), StructField("blob", StringType())]
    )
    spec = _Spec(BUCKET_REPLACE, bucket_key="bucket", key_is_bucket=True)
    assert "bucket int" in base_columns_sql(spec, filt)

    # APPEND tables pass through verbatim (a user column named wave or _b
    # on an unpartitioned table must survive)
    spec = _Spec(APPEND)
    assert "wave int" in base_columns_sql(spec, kb_aug)


def test_ddl_bucketed_append_uses_identity_partition():
    sql = ddl_for("ice.crawl.seen", _Spec(BUCKET_APPEND, 32), "url_hash BIGINT, u STRING")
    assert "USING iceberg" in sql
    assert "_b INT" in sql and "PARTITIONED BY (_b)" in sql
    # NOT the bucket transform: murmur3 ids wouldn't match the engine's
    # pmod bucketing that read_buckets/anti-join co-partitioning rely on
    assert "bucket(" not in sql
    assert "'format-version'='2'" in sql


def test_ddl_key_is_bucket_partitions_on_the_key_itself():
    spec = _Spec(BUCKET_REPLACE, bucket_key="bucket", key_is_bucket=True)
    sql = ddl_for("ice.crawl.seen_filters", spec, "bucket INT, blob BINARY")
    assert "PARTITIONED BY (bucket)" in sql
    assert "_b INT" not in sql


def test_ddl_replace_mode_partitions_by_wave():
    sql = ddl_for("ice.crawl.kb", _Spec(REPLACE), "site_id STRING, n BIGINT")
    assert "wave INT" in sql and "PARTITIONED BY (wave)" in sql


def test_ddl_append_mode_is_unpartitioned():
    sql = ddl_for("ice.crawl.crawled", _Spec(APPEND), "url STRING")
    assert "PARTITIONED BY" not in sql


def test_maintenance_actions_cover_compaction_and_expiry():
    acts = maintenance_sql("ice", "ice.crawl.seen", _Spec(BUCKET_APPEND, 32))
    joined = "\n".join(acts)
    assert "rewrite_data_files" in joined
    assert "expire_snapshots" in joined
    assert "remove_orphan_files" in joined
    # procedures take the catalog-relative identifier
    assert "table => 'crawl.seen'" in joined
    # REPLACE tables additionally drop superseded wave partitions
    reps = maintenance_sql("ice", "ice.crawl.kb", _Spec(REPLACE))
    assert any("DELETE FROM ice.crawl.kb WHERE wave <" in a for a in reps)


def test_factory_selects_backends(spark, tmp_path):
    from crawler_spark.tableio import TableCatalog

    cat = make_catalog(spark, str(tmp_path / "pq"), "parquet")
    assert isinstance(cat, TableCatalog)
    with pytest.raises(ValueError):
        make_catalog(spark, str(tmp_path), "delta")


def test_iceberg_unavailable_raises_actionable_error(spark):
    """Sandbox has no jars: the backend must refuse loudly with setup
    instructions, never half-construct."""
    if iceberg_available(spark, "ice"):
        pytest.skip("Iceberg actually available — covered by the gated suite")
    with pytest.raises(IcebergUnavailable, match="iceberg-spark-runtime"):
        make_catalog(spark, "ice.crawl_test", "iceberg")


# -- jar-gated behavior suite (runs only where Iceberg is configured) ----


@pytest.fixture
def ice_cat(spark):
    if not iceberg_available(spark, "ice"):
        pytest.skip("no Iceberg catalog 'ice' in this session")
    cat = make_catalog(spark, "ice.crawl_t", "iceberg")
    yield cat
    cat.destroy()


def test_wave_commit_is_atomic_across_tables(ice_cat, spark):
    ice_cat.register("a", APPEND)
    ice_cat.register("b", BUCKET_APPEND, n_buckets=4)
    df = spark.createDataFrame([(1, "x")], "url_hash LONG, u STRING")
    ice_cat.stage("a", df, 0)
    # staged but uncommitted: invisible (journal has no snapshot yet)
    assert ice_cat.read("a", df.schema).count() == 0
    ice_cat.stage("b", df, 0)
    ice_cat.commit(0)
    assert ice_cat.committed_wave == 0
    assert ice_cat.read("a").count() == 1
    assert ice_cat.read_buckets("b", [1]).count() == 1  # 1 % 4


def test_rollback_orphans_discards_unjournaled_appends(ice_cat, spark):
    ice_cat.register("a", APPEND)
    df = spark.createDataFrame([(1, "x")], "url_hash LONG, u STRING")
    ice_cat.stage("a", df, 0)
    ice_cat.commit(0)
    ice_cat.stage("a", df, 1)  # crash before commit(1)
    from crawler_spark.tableio_iceberg import IcebergTableCatalog

    cat2 = IcebergTableCatalog(spark, ice_cat.root)
    cat2.register("a", APPEND)
    assert cat2.committed_wave == 0
    assert cat2.read("a").count() == 1  # the orphaned append rolled back


# -- journal/rollback bookkeeping: pure, jar-free (VERDICT r4 item 5) ----

def test_parse_journal_empty_and_legacy_and_current():
    from crawler_spark.tableio_iceberg import parse_journal

    assert parse_journal([]) == {
        "wave": -1, "snapshots": {}, "meta": {}, "waves": {}
    }
    # legacy bare-id journals (no staged-wave element) are tolerated
    legacy = [{
        "wave": 3,
        "snapshots": '{"seen": 101, "frontier": 102}',
        "meta": None,
    }]
    j = parse_journal(legacy)
    assert j["snapshots"] == {"seen": 101, "frontier": 102}
    assert j["waves"] == {} and j["meta"] == {}
    current = [{
        "wave": 7,
        "snapshots": '{"seen": [201, 7], "kb": [55, 6]}',
        "meta": '{"frontier_terminal_since_compact": 1200}',
    }]
    j = parse_journal(current)
    assert j["wave"] == 7
    assert j["snapshots"] == {"seen": 201, "kb": 55}
    assert j["waves"] == {"seen": 7, "kb": 6}
    assert j["meta"]["frontier_terminal_since_compact"] == 1200


def test_rollback_plan_only_drifted_existing_tables():
    from crawler_spark.tableio_iceberg import rollback_plan

    journaled = {"seen": 10, "frontier": 20, "kb": None, "ledger": 30}
    current = {
        "seen": 10,       # at its pin → untouched
        "frontier": 21,   # drifted (unpublished stage-write) → roll back
        "kb": 99,         # journaled None → never rolled
        "ledger": None,   # table missing/empty → nothing to roll
    }
    assert rollback_plan(journaled, current) == [("frontier", 20)]
    assert rollback_plan({}, {}) == []


def test_advance_journal_merges_pins_and_meta():
    from crawler_spark.tableio_iceberg import advance_journal

    prev = {
        "wave": 4,
        "snapshots": {"seen": 10, "kb": 5},
        "waves": {"seen": 4, "kb": 2},
        "meta": {"a": 1, "b": 2},
    }
    nxt = advance_journal(
        prev,
        pending={"seen": {"wave": 5}, "frontier": {"wave": 5}},
        pending_meta={"b": 9, "c": 3},
        current={"seen": 11, "frontier": 70},
        wave=5,
    )
    # staged tables advance; untouched kb keeps its pin + staged wave
    assert nxt == {
        "wave": 5,
        "snapshots": {"seen": 11, "kb": 5, "frontier": 70},
        "waves": {"seen": 5, "kb": 2, "frontier": 5},
        "meta": {"a": 1, "b": 9, "c": 3},
    }
    # the input journal is not mutated (crash between bookkeeping and
    # the journal append must leave the in-memory state at the old wave)
    assert prev["snapshots"] == {"seen": 10, "kb": 5}
    assert prev["meta"] == {"a": 1, "b": 2}


def test_journal_disk_row_roundtrips_through_parse():
    from crawler_spark.tableio_iceberg import journal_disk_row, parse_journal

    j = {
        "wave": 9,
        "snapshots": {"seen": 77, "frontier": 88},
        "waves": {"seen": 9, "frontier": 8},
        "meta": {"k": [1, 2]},
    }
    wave, snaps, meta, ts = journal_disk_row(j, committed_at=123.5)
    back = parse_journal([{"wave": wave, "snapshots": snaps, "meta": meta}])
    assert back == j
    assert ts == 123.5
