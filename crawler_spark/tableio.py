"""Versioned table storage with atomic per-wave commits.

The production design is Iceberg: every engine table is an Iceberg table
partitioned by ``bucket(N, url_hash)`` (frontier/seen) or ``wave``
(crawled/packets/metrics), one atomic transaction set per wave, resume =
read the last committed snapshot set. This sandbox ships no Iceberg jars
and no network (SURVEY §7), so this module provides the same
commit/snapshot semantics over parquet + a JSON manifest:

* each logical table lives under ``{root}/{name}/`` as immutable
  ``v{N}`` parquet snapshot dirs (full-replace tables) or ``d{wave}``
  delta dirs (append tables);
* a checkpoint file ``{root}/_checkpoint.json`` maps the committed wave
  to the exact snapshot/delta set, written via write-temp + atomic
  ``os.replace`` — a crash mid-wave leaves the previous checkpoint
  intact, so resume-from-checkpoint is exact (north-rule requirement);
* reading a table always goes through the checkpoint, so a half-written
  wave is invisible (snapshot isolation per wave).

Writing also serves as per-wave lineage truncation: each wave's outputs
are materialized and read back, so the iterative driver loop never grows
an unbounded logical plan.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

REPLACE = "replace"  # full-snapshot tables: frontier, seen, kb, ledger
APPEND = "append"    # delta tables: crawled, packets, rejected, metrics


@dataclass
class TableCatalog:
    spark: SparkSession
    root: str
    tables: dict[str, str] = field(default_factory=dict)  # name -> mode
    _pending: dict[str, str] = field(default_factory=dict)
    _state: dict = field(default_factory=dict)

    def __post_init__(self):
        os.makedirs(self.root, exist_ok=True)
        self._state = self._load_checkpoint()
        self._lock = threading.Lock()

    # -- checkpoint ----------------------------------------------------

    def _ckpt_path(self) -> str:
        return os.path.join(self.root, "_checkpoint.json")

    def _load_checkpoint(self) -> dict:
        p = self._ckpt_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"wave": -1, "snapshots": {}, "deltas": {}, "committed_at": None}

    @property
    def committed_wave(self) -> int:
        return self._state["wave"]

    def register(self, name: str, mode: str) -> None:
        assert mode in (REPLACE, APPEND)
        self.tables[name] = mode

    # -- staging -------------------------------------------------------

    def stage(self, name: str, df: DataFrame, wave: int) -> None:
        """Write a table's new snapshot/delta for ``wave`` (not yet visible)."""
        mode = self.tables[name]
        if mode == REPLACE:
            rel = f"{name}/v{wave}"
        else:
            rel = f"{name}/d{wave}"
        path = os.path.join(self.root, rel)
        if os.path.exists(path):
            shutil.rmtree(path)  # stale leftover from a crashed wave
        df.write.mode("overwrite").parquet(path)
        with self._lock:
            self._pending[name] = rel

    def commit(self, wave: int) -> None:
        """Atomically publish every staged table as wave ``wave``."""
        new_state = json.loads(json.dumps(self._state))
        for name, rel in self._pending.items():
            if self.tables[name] == REPLACE:
                new_state["snapshots"][name] = rel
            else:
                new_state["deltas"].setdefault(name, []).append(rel)
        new_state["wave"] = wave
        new_state["committed_at"] = time.time()
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f, indent=1)
        os.replace(tmp, self._ckpt_path())  # the atomic commit point
        self._state = new_state
        self._pending = {}

    # -- reads ---------------------------------------------------------

    def read(self, name: str, schema: StructType | None = None) -> DataFrame:
        """Read the committed state of a table (empty DF if never written)."""
        mode = self.tables[name]
        if mode == REPLACE:
            rel = self._state["snapshots"].get(name)
            rels = [rel] if rel else []
        else:
            rels = self._state["deltas"].get(name, [])
        if not rels:
            assert schema is not None, f"no committed data and no schema for {name}"
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, r) for r in rels]
        return self.spark.read.parquet(*paths)

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
