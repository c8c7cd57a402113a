"""Iceberg backend for the table catalog (production storage).

`tableio.TableCatalog` emulates Iceberg's commit/manifest semantics over
parquet + a JSON checkpoint because this sandbox ships no Iceberg jars
(tableio.py module docstring). This module is the real thing behind the
SAME interface — an engine configured with
``CrawlConfig(catalog_backend="iceberg")`` runs every wave against
Iceberg tables with no other code change. Jar-gated: constructing the
catalog raises ``IcebergUnavailable`` with setup instructions when the
runtime has no Iceberg catalog configured, and the test suite skips.

## Mode mapping (the one-page contract; see docs/ICEBERG.md)

| tableio mode   | layout                              | per-wave write            | maintenance                          |
|----------------|-------------------------------------|---------------------------|--------------------------------------|
| REPLACE        | partitioned by ``wave``             | append snapshot rows      | drop partitions < watermark − keep   |
| APPEND         | unpartitioned (or ``wave``)         | ``writeTo().append()``    | ``rewrite_data_files`` (bin-pack)    |
| BUCKET_APPEND  | identity partition ``_b`` =         | ``writeTo().append()``    | ``rewrite_data_files`` per partition |
|                | ``pmod(url_hash, B)``               |                           | + resolved compaction (MOR logs)     |
| BUCKET_REPLACE | identity partition ``_b``           | ``overwritePartitions()`` | ``expire_snapshots``                 |
|                |                                     | (touched buckets only)    |                                      |

``_b`` is an **identity** partition column (the engine's own
``pmod(url_hash, B)``), NOT Iceberg's ``bucket(B, url_hash)`` transform:
the transform hashes with murmur3, so the engine's bucket ids — which the
seen anti-join co-partitions on and ``read_buckets`` prunes with — would
not line up with Iceberg's partition values. With the identity column,
``read_buckets`` is a plain ``WHERE _b IN (...)`` that Iceberg prunes at
manifest level, and the physical layout matches the parquet backend
byte-for-byte in semantics.

## Atomic multi-table waves

Iceberg commits are atomic per TABLE; a wave commits many. The parquet
backend's pointer-swap generalizes: stage-writes land on each table as
ordinary Iceberg commits, and the WAVE commit point is ONE atomic append
to a ``_commits`` journal table recording ``wave → {table: snapshot_id}``
(+ the staged catalog meta). Readers resolve every table through the
latest journal row and read ``VERSION AS OF snapshot_id`` — a crash
after some table appends but before the journal append leaves those
snapshots unreferenced (invisible to readers), and ``rollback_orphans()``
(called on catalog open, the resume path) rolls each table back to its
journaled snapshot before the wave retries. This is Iceberg's own WAP
(write-audit-publish) pattern with the publish fused across tables.

Reference parity note: the reference engine persists crawl state as
whole-file JSON/SQLite rewrites per batch (reference
src/crawler/state_manager.py); both catalog backends replace that with
O(delta) committed table storage.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from crawler_spark.tableio import (
    APPEND,
    BUCKET_APPEND,
    BUCKET_REPLACE,
    REPLACE,
    _Spec,
)

_COMMITS = "_commits"


class IcebergUnavailable(RuntimeError):
    pass


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True when ``catalog`` is a usable Iceberg catalog in this session
    (jars on the classpath + spark.sql.catalog.<name> configured)."""
    if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
        return True
    except Exception:
        return False


# -- pure statement builders (unit-testable without jars) ----------------


def base_columns_sql(spec: _Spec, schema) -> str:
    """Schema (possibly already carrying the partition column stage()
    adds) → the BASE column list ``ddl_for`` expects. ``ddl_for`` appends
    the partition column itself (``_b`` for engine-bucketed modes,
    ``wave`` for REPLACE), so it must be stripped here — passing the
    augmented schema through verbatim would declare the column twice and
    Spark rejects the CREATE with a duplicate-column error."""
    appended = (
        "_b"
        if spec.mode in (BUCKET_APPEND, BUCKET_REPLACE) and not spec.key_is_bucket
        else "wave"
        if spec.mode == REPLACE
        else None
    )
    return ", ".join(
        f"{f_.name} {f_.dataType.simpleString()}"
        for f_ in schema.fields
        if f_.name != appended
    )


def ddl_for(qualified: str, spec: _Spec, columns_sql: str) -> str:
    """CREATE TABLE IF NOT EXISTS statement for one engine table.

    ``columns_sql`` is the column list (e.g. ``"url_hash BIGINT, ..."``);
    bucketed modes get the ``_b INT`` identity partition column appended.
    Write-distribution properties keep appends from fanning tiny files
    across every partition (the Iceberg analog of the parquet backend's
    delta coalesce)."""
    cols = columns_sql
    part = ""
    props = {
        "format-version": "2",
        "write.distribution-mode": "hash",
        # one wave's delta per bucket should be one file, as in the
        # parquet backend's _b= leaf dirs
        "write.target-file-size-bytes": str(128 * 1024 * 1024),
    }
    if spec.mode in (BUCKET_APPEND, BUCKET_REPLACE):
        if not spec.key_is_bucket:
            cols = f"{columns_sql}, _b INT"
        bucket_col = spec.bucket_key if spec.key_is_bucket else "_b"
        part = f" PARTITIONED BY ({bucket_col})"
    elif spec.mode == REPLACE:
        cols = f"{columns_sql}, wave INT"
        part = " PARTITIONED BY (wave)"
    if spec.mode == BUCKET_REPLACE:
        # replaced partitions leave dead snapshots quickly; let
        # maintenance expire them aggressively
        props["history.expire.max-snapshot-age-ms"] = str(24 * 3600 * 1000)
    props_sql = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
    return (
        f"CREATE TABLE IF NOT EXISTS {qualified} ({cols}) USING iceberg"
        f"{part} TBLPROPERTIES ({props_sql})"
    )


def maintenance_sql(catalog: str, qualified: str, spec: _Spec, keep_waves: int = 3) -> list[str]:
    """The per-table maintenance actions (run out-of-band, e.g. nightly):
    bin-pack small delta files, expire unreferenced snapshots, reclaim
    orphans. REPLACE tables additionally drop superseded wave partitions
    (their rows are unreadable once the journal moves past them)."""
    ident = qualified.split(".", 1)[1] if qualified.startswith(f"{catalog}.") else qualified
    acts = [
        f"CALL {catalog}.system.rewrite_data_files(table => '{ident}')",
        f"CALL {catalog}.system.expire_snapshots(table => '{ident}')",
        f"CALL {catalog}.system.remove_orphan_files(table => '{ident}')",
    ]
    if spec.mode == REPLACE:
        acts.append(
            f"DELETE FROM {qualified} WHERE wave < "
            f"(SELECT max(wave) FROM {qualified}) - {keep_waves}"
        )
    return acts


# -- pure journal bookkeeping (unit-testable without jars) ----------------


def parse_journal(rows: list) -> dict:
    """Latest `_commits` row(s) → in-memory journal state. ``rows`` is
    the (0- or 1-element) collected result of the newest-first read.
    On-disk ``snapshots`` carries ``{table: [snapshot_id, staged_wave]}``;
    bare ids from older journals are tolerated (wave → unknown)."""
    if not rows:
        return {"wave": -1, "snapshots": {}, "meta": {}, "waves": {}}
    r = rows[0]
    snaps = json.loads(r["snapshots"])
    return {
        "wave": r["wave"],
        "snapshots": {
            k: (v[0] if isinstance(v, list) else v) for k, v in snaps.items()
        },
        "waves": {k: v[1] for k, v in snaps.items() if isinstance(v, list)},
        "meta": json.loads(r["meta"] or "{}"),
    }


def rollback_plan(
    journal_snapshots: dict, current: dict
) -> list[tuple[str, int]]:
    """Resume protocol decisions: which tables must roll back to which
    journaled snapshot. ``current`` maps table → its newest snapshot id
    (None = table missing/empty). A table rolls back iff it HAS a
    journaled snapshot, currently exists, and has drifted past it —
    stage-writes of a wave that never published."""
    plan = []
    for name, want in journal_snapshots.items():
        if want is None:
            continue
        cur = current.get(name)
        if cur is not None and cur != want:
            plan.append((name, want))
    return plan


def advance_journal(
    journal: dict,
    pending: dict,
    pending_meta: dict,
    current: dict,
    wave: int,
) -> dict:
    """The commit's bookkeeping, pure: merge the staged tables' current
    snapshot ids and staged waves over the previous journal; untouched
    tables keep their pins, meta is overlay-merged."""
    snaps = dict(journal["snapshots"])
    waves = dict(journal["waves"])
    for name, p in pending.items():
        snaps[name] = current[name]
        waves[name] = p["wave"]
    return {
        "wave": wave,
        "snapshots": snaps,
        "waves": waves,
        "meta": {**journal["meta"], **pending_meta},
    }


def journal_disk_row(journal: dict, committed_at: float) -> tuple:
    """Journal state → the `_commits` append row. Round-trips through
    :func:`parse_journal` exactly."""
    disk = {
        k: [sid, journal["waves"].get(k)]
        for k, sid in journal["snapshots"].items()
    }
    return (
        journal["wave"],
        json.dumps(disk),
        json.dumps(journal["meta"]),
        committed_at,
    )


@dataclass
class IcebergTableCatalog:
    """Drop-in TableCatalog over an Iceberg catalog namespace.

    ``root`` is the namespace, e.g. ``"ice.crawl_prod"`` — kept under the
    same attribute name as the parquet backend so error messages and
    callers (streaming lineage binding reads ``cat.root``) work
    unchanged."""

    spark: SparkSession
    root: str  # "<catalog>.<namespace>"
    tables: dict[str, _Spec] = field(default_factory=dict)

    def __post_init__(self):
        self._catalog = self.root.split(".", 1)[0]
        if not iceberg_available(self.spark, self._catalog):
            raise IcebergUnavailable(
                f"no usable Iceberg catalog {self._catalog!r}: add the "
                "iceberg-spark-runtime jar and set "
                f"spark.sql.catalog.{self._catalog} = "
                "org.apache.iceberg.spark.SparkCatalog (+ its warehouse/"
                "uri confs). The parquet backend (catalog_backend="
                "'parquet') needs neither."
            )
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.root}")
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._q(_COMMITS)} "
            "(wave INT, snapshots STRING, meta STRING, committed_at DOUBLE) "
            "USING iceberg"
        )
        self._pending: dict[str, dict] = {}
        self._pending_meta: dict = {}
        import threading

        self._lock = threading.Lock()
        self._journal = self._load_journal()
        self.rollback_orphans()

    # -- journal (the cross-table atomic commit pointer) -----------------

    def _q(self, name: str) -> str:
        return f"{self.root}.{name}"

    def _load_journal(self) -> dict:
        rows = (
            self.spark.read.table(self._q(_COMMITS))
            # committed_at tiebreak: maintenance publishes (compact /
            # compact_split) append journal rows at the SAME wave
            .orderBy(F.col("wave").desc(), F.col("committed_at").desc())
            .limit(1)
            .collect()
        )
        return parse_journal(rows)

    @property
    def committed_wave(self) -> int:
        return self._journal["wave"]

    def _current_snapshot(self, name: str) -> int | None:
        rows = (
            self.spark.read.table(f"{self._q(name)}.snapshots")
            .orderBy(F.col("committed_at").desc())
            .limit(1)
            .collect()
        )
        return rows[0]["snapshot_id"] if rows else None

    def rollback_orphans(self) -> None:
        """Resume protocol: roll every table back to its journaled
        snapshot, discarding stage-writes of a wave that never published
        (crash between table appends and the journal append). The
        parquet-backend analog is the checkpoint-driven vacuum."""
        # iterate the journal, not self.tables: the catalog is constructed
        # before register() calls, and the journal already names every
        # table a committed wave touched
        current = {
            name: self._current_snapshot(name)
            for name in self._journal["snapshots"]
        }
        for name, want in rollback_plan(self._journal["snapshots"], current):
            ident = self._q(name).split(".", 1)[1]
            self.spark.sql(
                f"CALL {self._catalog}.system.rollback_to_snapshot("
                f"table => '{ident}', snapshot_id => {want})"
            )

    # -- registration / staging / commit ---------------------------------

    def register(
        self,
        name: str,
        mode: str,
        n_buckets: int | None = None,
        bucket_key: str = "url_hash",
        key_is_bucket: bool = False,
    ) -> None:
        self.tables[name] = _Spec(mode, n_buckets, bucket_key, key_is_bucket)

    def _ensure_table(self, name: str, df: DataFrame) -> None:
        spec = self.tables[name]
        self.spark.sql(ddl_for(self._q(name), spec, base_columns_sql(spec, df.schema)))

    def stage(self, name: str, df: DataFrame, wave: int, touched=None) -> None:
        """Write one table's wave delta. Unlike the parquet backend the
        bytes land as per-table Iceberg commits immediately, but they are
        INVISIBLE to readers until ``commit(wave)`` appends the journal
        row (reads pin journaled snapshot ids)."""
        spec = self.tables[name]
        out = df
        if spec.mode in (BUCKET_APPEND, BUCKET_REPLACE) and not spec.key_is_bucket:
            out = df.withColumn(
                "_b",
                F.pmod(F.col(spec.bucket_key), F.lit(spec.n_buckets)).cast("int"),
            )
        elif spec.mode == REPLACE:
            out = df.withColumn("wave", F.lit(wave))
        self._ensure_table(name, out)
        w = out.writeTo(self._q(name))
        if spec.mode == BUCKET_REPLACE:
            w.overwritePartitions()  # dynamic: only the staged buckets
        else:
            w.append()
        with self._lock:
            self._pending[name] = {"wave": wave}

    def commit(self, wave: int) -> None:
        """Publish every staged table atomically: ONE append to the
        journal table, recording each table's current snapshot id."""
        with self._lock:
            pending, self._pending = self._pending, {}
            pending_meta, self._pending_meta = self._pending_meta, {}
        current = {name: self._current_snapshot(name) for name in pending}
        journal = advance_journal(
            self._journal, pending, pending_meta, current, wave
        )
        self._append_journal(journal)
        self._journal = journal

    def _append_journal(self, journal: dict) -> None:
        self.spark.createDataFrame(
            [journal_disk_row(journal, time.time())],
            "wave INT, snapshots STRING, meta STRING, committed_at DOUBLE",
        ).writeTo(self._q(_COMMITS)).append()

    def set_meta(self, key: str, value) -> None:
        with self._lock:
            self._pending_meta[key] = value

    def get_meta(self, key: str, default=None):
        return self._journal["meta"].get(key, default)

    # -- reads (snapshot-pinned through the journal) ----------------------

    def read(self, name: str, schema: StructType | None = None) -> DataFrame:
        sid = self._journal["snapshots"].get(name)
        if sid is None:
            assert schema is not None, f"no committed data and no schema for {name}"
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.option("snapshot-id", str(sid)).table(self._q(name))
        spec = self.tables[name]
        if spec.mode == REPLACE:
            # the journaled staged-wave partition only (appends accrete
            # history; older partitions are maintenance-deleted)
            df = df.filter(
                F.col("wave") == F.lit(self._journal["waves"].get(name, -1))
            ).drop("wave")
        elif spec.mode in (BUCKET_APPEND, BUCKET_REPLACE) and not spec.key_is_bucket:
            df = df.drop("_b")
        return df

    def read_buckets(
        self, name: str, buckets: list[int], schema: StructType | None = None
    ) -> DataFrame:
        """Bucket-pruned read: identity-partition filter, pruned from
        Iceberg manifests (no file listing, no full scan)."""
        spec = self.tables[name]
        sid = self._journal["snapshots"].get(name)
        if sid is None:
            assert schema is not None, f"no committed data and no schema for {name}"
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.option("snapshot-id", str(sid)).table(self._q(name))
        col = spec.bucket_key if spec.key_is_bucket else "_b"
        df = df.filter(F.col(col).isin([int(b) for b in buckets]))
        return df.drop("_b") if not spec.key_is_bucket else df

    # -- maintenance -------------------------------------------------------

    def compact(self, name: str, resolver=None) -> None:
        """MOR resolution compaction: overwrite the table with its
        resolved contents (one atomic Iceberg REPLACE commit), then
        publish the new snapshot through the journal. Pure file bin-pack
        (no row semantics) should instead use ``maintenance_sql`` —
        rewrite_data_files keeps snapshots readable in place."""
        resolved = (resolver or (lambda d: d))(self.read(name))
        spec = self.tables[name]
        if spec.mode in (BUCKET_APPEND,) and not spec.key_is_bucket:
            resolved = resolved.withColumn(
                "_b",
                F.pmod(F.col(spec.bucket_key), F.lit(spec.n_buckets)).cast("int"),
            )
        resolved.writeTo(self._q(name)).overwrite(F.lit(True))
        self._publish_current(name)

    def compact_split(self, name: str, archive_name: str, resolver, hot_filter) -> None:
        """Hot/archive split (frontier): resolved hot rows overwrite the
        hot table, terminal rows append to the archive; both publish in
        one journal row (readers never see the halves separately)."""
        resolved = resolver(self.read(name)).persist()
        try:
            resolved.filter(hot_filter).writeTo(self._q(name)).overwrite(F.lit(True))
            archive = resolved.filter(~hot_filter | hot_filter.isNull())
            self._ensure_table(archive_name, archive)
            archive.writeTo(self._q(archive_name)).append()
        finally:
            resolved.unpersist()
        self._publish_current(name, archive_name)

    def _publish_current(self, *names: str) -> None:
        snaps = dict(self._journal["snapshots"])
        for n in names:
            snaps[n] = self._current_snapshot(n)
        self._journal = {**self._journal, "snapshots": snaps}
        self._append_journal(self._journal)

    def destroy(self) -> None:
        for name in list(self.tables) + [_COMMITS]:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._q(name)}")
        self.spark.sql(f"DROP NAMESPACE IF EXISTS {self.root}")


def make_catalog(spark: SparkSession, root: str, backend: str = "parquet"):
    """Catalog factory: ``backend='parquet'`` (sandbox default, JSON
    checkpoint over parquet dirs) or ``'iceberg'`` (``root`` is then a
    ``catalog.namespace`` identifier rather than a filesystem path)."""
    if backend == "iceberg":
        return IcebergTableCatalog(spark, root)
    if backend != "parquet":
        raise ValueError(f"unknown catalog backend {backend!r}")
    from crawler_spark.tableio import TableCatalog

    return TableCatalog(spark, root)
