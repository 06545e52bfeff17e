"""Iceberg-style snapshot table layer: atomic commits, time travel,
incremental (snapshot-diff) scans, per-snapshot schema lineage.

The north rule targets "Iceberg tables of source-code repositories"; this
sandbox has no Iceberg runtime jar, so this module implements the subset
of table-format semantics the validation engine actually depends on —
over plain parquet:

- **immutable snapshot manifests**: every commit writes a JSON manifest
  listing exactly the data files it added (with byte size + row count
  harvested from parquet FOOTERS — no data scan), its parent snapshot,
  and the writer schema;
- **atomic commit by pointer swap**: data files land first, then the
  manifest, then the ``metadata/current`` pointer is ``os.replace``d —
  a reader never observes a half-committed snapshot (crash between any
  two steps leaves the table at the old snapshot; test-asserted);
- **time travel**: ``read(snapshot_id=N)`` reconstructs the file set as
  of N and reads it under the schema recorded AT N (files written before
  a column was added yield nulls for it — Iceberg's add-column
  semantics);
- **incremental scan**: ``incremental(after, until)`` reads only files
  added by snapshots in ``(after, until]`` — the primitive that makes
  10^12-file validation affordable: each validation run touches only
  the appended files, never the accumulated table;
- **schema lineage**: ``schema_changes()`` diffs consecutive snapshot
  schemas from metadata alone (zero Spark jobs at any table size).

On a real cluster with the Iceberg runtime these map 1:1 to
``spark.read.option("snapshot-id", …)`` / ``option("start-snapshot-id",
…)`` and the catalog's optimistic pointer swap; ``validate_new_snapshots``
consumes only (snapshot_id, file list, schema) triples, which both
implementations provide. Single-writer is assumed here (the reference
pipeline is single-writer too: each stage owns its output directory,
reference graph/run_graph_builder.py:35-48); real Iceberg lifts that
with catalog CAS.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DATA_DIR = "data"
META_DIR = "metadata"
CURRENT = "current"
WATERMARK = "_snapshot_watermark.json"


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str  # 'append' | 'overwrite'
    added_files: tuple[dict, ...]  # {path(rel), bytes, rows}
    schema_json: str

    @property
    def added_rows(self) -> int:
        return sum(f["rows"] for f in self.added_files)


def _footer_stats(path: Path) -> tuple[int, int]:
    """(bytes, rows) from the parquet footer — metadata-only, no scan.
    This is what Iceberg manifests store per data file; at cluster scale
    the writer records it at commit time for the same reason."""
    import pyarrow.parquet as pq

    return path.stat().st_size, pq.ParquetFile(path).metadata.num_rows


class SnapshotTable:
    """A directory-backed snapshot table. ``create`` once, then
    ``append``/``overwrite`` produce numbered snapshots readable by id."""

    def __init__(self, table_dir: str):
        self.dir = Path(table_dir)
        self.meta = self.dir / META_DIR

    # -- commit path --------------------------------------------------------

    @classmethod
    def create(cls, table_dir: str) -> "SnapshotTable":
        t = cls(table_dir)
        (t.dir / DATA_DIR).mkdir(parents=True, exist_ok=True)
        t.meta.mkdir(parents=True, exist_ok=True)
        if not (t.meta / CURRENT).exists():
            t._swap_pointer(0)
        return t

    def _swap_pointer(self, snapshot_id: int) -> None:
        tmp = self.meta / f"{CURRENT}.tmp.{os.getpid()}"
        tmp.write_text(str(snapshot_id))
        os.replace(tmp, self.meta / CURRENT)  # atomic on POSIX

    def current_id(self) -> int:
        return int((self.meta / CURRENT).read_text())

    def _commit(self, df: DataFrame, operation: str) -> int:
        snap_id = self.current_id() + 1
        rel = f"{DATA_DIR}/snap-{snap_id:06d}"
        out = self.dir / rel
        # 1. data files land in a snapshot-private directory
        df.write.mode("error").parquet(str(out))
        files = []
        for p in sorted(out.glob("*.parquet")):
            nbytes, nrows = _footer_stats(p)
            files.append(
                {"path": f"{rel}/{p.name}", "bytes": nbytes, "rows": nrows}
            )
        # 2. immutable manifest
        manifest = {
            "snapshot_id": snap_id,
            "parent_id": snap_id - 1 or None,
            "operation": operation,
            "added_files": files,
            "schema_json": df.schema.json(),
        }
        mpath = self.meta / f"snap-{snap_id:06d}.json"
        tmp = self.meta / f"snap-{snap_id:06d}.json.tmp.{os.getpid()}"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, mpath)
        # 3. the commit: readers see the snapshot only after this swap
        self._swap_pointer(snap_id)
        return snap_id

    def append(self, df: DataFrame) -> int:
        """Commit ``df`` as a new snapshot on top of the current one."""
        return self._commit(df, "append")

    def overwrite(self, df: DataFrame) -> int:
        """Commit ``df`` as a snapshot that REPLACES the table contents
        (reads at this snapshot or later ignore all earlier files)."""
        return self._commit(df, "overwrite")

    # -- metadata -----------------------------------------------------------

    def snapshot(self, snapshot_id: int) -> Snapshot:
        m = json.loads(
            (self.meta / f"snap-{snapshot_id:06d}.json").read_text()
        )
        return Snapshot(
            snapshot_id=m["snapshot_id"],
            parent_id=m["parent_id"],
            operation=m["operation"],
            added_files=tuple(m["added_files"]),
            schema_json=m["schema_json"],
        )

    def snapshots(self) -> list[Snapshot]:
        return [self.snapshot(i) for i in range(1, self.current_id() + 1)]

    def _live_files(self, until_id: int, after_id: int = 0) -> list[str]:
        """Relative data-file paths visible at ``until_id`` that were
        added strictly after ``after_id`` (honoring overwrites)."""
        files: list[str] = []
        for s in self.snapshots():
            if s.snapshot_id > until_id:
                break
            if s.operation == "overwrite":
                files = []
            if s.snapshot_id > after_id:
                files.extend(f["path"] for f in s.added_files)
        return files

    def schema_at(self, snapshot_id: int) -> T.StructType:
        return T.StructType.fromJson(
            json.loads(self.snapshot(snapshot_id).schema_json)
        )

    def schema_changes(self) -> list[dict]:
        """Per-snapshot schema diff vs parent — metadata only, no Spark
        jobs. Returns [{snapshot_id, added, dropped, retyped}] for
        snapshots whose schema differs from their parent's."""
        out = []
        prev: dict[str, str] = {}
        for s in self.snapshots():
            cur = {
                f.name: f.dataType.simpleString()
                for f in T.StructType.fromJson(json.loads(s.schema_json))
            }
            if prev or s.parent_id:
                added = sorted(set(cur) - set(prev))
                dropped = sorted(set(prev) - set(cur))
                retyped = sorted(
                    k for k in set(cur) & set(prev) if cur[k] != prev[k]
                )
                if added or dropped or retyped:
                    out.append(
                        {
                            "snapshot_id": s.snapshot_id,
                            "added": added,
                            "dropped": dropped,
                            "retyped": retyped,
                        }
                    )
            prev = cur
        return out

    # -- read paths ----------------------------------------------------------

    def _read_files(
        self, spark: SparkSession, files: list[str], schema: T.StructType
    ) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        # the recorded schema is authoritative: files written before a
        # column existed yield nulls for it (Iceberg add-column semantics),
        # and Catalyst still prunes/pushes down against the parquet scan.
        return spark.read.schema(schema).parquet(
            *[str(self.dir / f) for f in files]
        )

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        """Table contents as of ``snapshot_id`` (default: current)."""
        sid = self.current_id() if snapshot_id is None else snapshot_id
        if sid == 0:
            raise ValueError("table has no snapshots yet")
        return self._read_files(
            spark, self._live_files(sid), self.schema_at(sid)
        )

    def incremental(
        self,
        spark: SparkSession,
        after_id: int,
        until_id: int | None = None,
    ) -> DataFrame:
        """Rows added by snapshots in ``(after_id, until_id]`` — the
        validation increment. Reads ONLY the appended files; the
        accumulated table is never rescanned."""
        until = self.current_id() if until_id is None else until_id
        if until == 0:
            raise ValueError("table has no snapshots yet")
        if until <= after_id:
            return self._read_files(spark, [], self.schema_at(until))
        return self._read_files(
            spark,
            self._live_files(until, after_id=after_id),
            self.schema_at(until),
        )


# -- snapshot-aware incremental validation -----------------------------------

def validate_new_snapshots(
    spark: SparkSession,
    table: SnapshotTable,
    spec,
    ckpt_dir: str,
    **checkpoint_kwargs,
):
    """Validate exactly the rows appended since the last validated
    snapshot, then advance the watermark.

    Each increment runs as its own checkpointed validation under
    ``ckpt_dir/snap-NNNNNN`` — per-partition manifests make the
    increment itself resumable mid-run, and the watermark advances only
    after the increment completes, so a crash re-validates at most one
    increment (and within it, only incomplete partitions). At 10^12
    accumulated files this is the difference between scanning the
    appended batch and scanning the table.

    Returns (validated_until_snapshot_id, ValidationResult | None);
    result is None when the watermark is already current.
    """
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        run_with_checkpoint,
    )

    wm_path = Path(ckpt_dir) / WATERMARK
    watermark = (
        json.loads(wm_path.read_text())["last_validated"]
        if wm_path.exists()
        else 0
    )
    current = table.current_id()
    if current <= watermark:
        return watermark, None

    inc = table.incremental(spark, after_id=watermark, until_id=current)
    res = run_with_checkpoint(
        inc,
        spec,
        str(Path(ckpt_dir) / f"snap-{current:06d}"),
        run_id=f"snap-{current:06d}",
        **checkpoint_kwargs,
    )
    wm_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = wm_path.with_suffix(f".tmp.{os.getpid()}")
    tmp.write_text(
        json.dumps({"last_validated": current, "previous": watermark})
    )
    os.replace(tmp, wm_path)
    return current, res
