"""Run-state storage: per-round parquet snapshots + a JSON manifest.

Plays the role Iceberg snapshots would on a real cluster (SURVEY.md §7
keeps the layer thin so the Iceberg catalog can slot in where the
sandbox lacks the connector): every round's frontier / seen / results
/ metrics appends land in ``round=K`` directories, and the manifest is
only advanced — by atomic rename — once all of round K's writes are
complete. A killed run therefore resumes from the last *complete*
round: re-read the manifest, load ``frontier/round=r`` and the union
of ``seen/round<=r``, continue. This is the checkpoint/resume +
per-partition-lineage requirement of the north rule.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = ["RunStore"]

_TABLES = ("frontier", "seen", "results", "metrics", "members")


class RunStore:
    def __init__(self, root: str | os.PathLike, crawler: str, run_id: str):
        self.dir = Path(root) / crawler / run_id
        self.dir.mkdir(parents=True, exist_ok=True)

    @property
    def manifest_path(self) -> Path:
        return self.dir / "manifest.json"

    def read_manifest(self) -> dict | None:
        if not self.manifest_path.exists():
            return None
        return json.loads(self.manifest_path.read_text())

    def _commit_manifest(self, manifest: dict) -> None:
        tmp = self.dir / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        tmp.replace(self.manifest_path)  # atomic on POSIX

    def round_path(self, table: str, rnd: int) -> str:
        return str(self.dir / table / f"round={rnd}")

    def write_round(self, table: str, rnd: int, df: DataFrame) -> None:
        assert table in _TABLES, table
        df.write.mode("overwrite").parquet(self.round_path(table, rnd))

    def write_round_local(
        self, table: str, rnd: int, rows: list[dict]
    ) -> None:
        """Driver-side parquet write for tiny tables (metrics rows).

        Round-tripping a 36-row local relation through a Spark write
        job costs ~5s of scheduling+commit; pyarrow writes it in
        microseconds and spark.read.parquet reads it identically."""
        assert table in _TABLES, table
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = Path(self.round_path(table, rnd))
        path.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist(rows), path / "part-00000.parquet"
        )

    def partition_rows(self, table: str, rnd: int) -> list[int]:
        """Per-partition row counts of a checkpointed round table, read
        from the parquet FOOTERS (driver-local, microseconds) — each
        written file is one partition of the job that produced it, so
        this is per-partition lineage with zero Spark jobs. (Iceberg
        manifests carry the same per-file row counts.)"""
        import pyarrow.parquet as pq

        p = Path(self.round_path(table, rnd))
        if not p.is_dir():
            return []
        return [
            pq.ParquetFile(f).metadata.num_rows
            for f in sorted(p.glob("*.parquet"))
        ]

    def read_round(
        self, spark: SparkSession, table: str, rnd: int, schema: str | None = None
    ) -> DataFrame | None:
        """``schema`` (DDL string) skips parquet schema inference — one
        less driver job per read on the hot loop's fixed-schema tables."""
        p = self.round_path(table, rnd)
        if not os.path.isdir(p):
            return None
        reader = spark.read.schema(schema) if schema else spark.read
        return reader.parquet(p)

    def read_all(
        self,
        spark: SparkSession,
        table: str,
        upto_round: int,
        schema: str | None = None,
    ) -> DataFrame | None:
        paths = [
            self.round_path(table, r)
            for r in range(upto_round + 1)
            if os.path.isdir(self.round_path(table, r))
        ]
        if not paths:
            return None
        reader = spark.read.schema(schema) if schema else spark.read
        return reader.parquet(*paths)

    # ---- crawler-scoped shared tables (survive across runs) ---------
    # The reference's crawler-scoped tags (http cache, incremental
    # skip markers — memorious/logic/http.py:147, context.py:127-148)
    # outlive any single run_id; they live beside the run dirs.

    def shared_path(self, table: str) -> Path:
        return self.dir.parent / "_shared" / table

    def read_shared(
        self, spark: SparkSession, table: str, schema: str | None = None
    ) -> DataFrame | None:
        """Reads a SNAPSHOT: the file list is pinned at call time, so a
        later append to the same directory cannot leak into this
        DataFrame — appending to a path invalidates any cache built
        over it and the recompute would otherwise re-list the dir and
        see the writer's own output (observed: a sequence-tag anti-join
        that erased its own batch). Iceberg gives this for free via
        snapshot ids; pinned file lists are the parquet-dir analogue."""
        p = self.shared_path(table)
        if not p.is_dir():
            return None
        files = sorted(str(f) for f in p.glob("*.parquet"))
        if not files:
            return None
        reader = spark.read.schema(schema) if schema else spark.read
        return reader.parquet(*files)

    def append_shared(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(str(self.shared_path(table)))

    def replace_shared(self, table: str, df: DataFrame) -> None:
        """Version-swap rewrite of a shared table (``df`` may read the
        table's current contents — e.g. a MERGE result): materialize
        into ``<table>__new`` first, then swap directories. The Iceberg
        analogue is a MERGE INTO snapshot commit."""
        target = self.shared_path(table)
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.with_name(table + "__new")
        df.write.mode("overwrite").parquet(str(tmp))
        old = target.with_name(table + "__old")
        shutil.rmtree(old, ignore_errors=True)
        if target.exists():
            target.rename(old)
        tmp.rename(target)
        shutil.rmtree(old, ignore_errors=True)

    def flush_crawler(self) -> None:
        """The reference's ``crawler.flush()`` (memorious/logic/
        crawler.py:89-96): drop EVERY crawler-scoped shared table —
        tags, http cache, incremental markers, sequence once-only
        state, db/ftm sink tables — so the next run behaves like the
        crawler's very first (everything re-fetches and re-stores).
        Per-run round data (frontier/seen/results under run dirs) is
        untouched: the reference flushes its Redis/SQL state, not its
        archived output."""
        shared_root = self.dir.parent / "_shared"
        if shared_root.is_dir():
            shutil.rmtree(shared_root)

    def commit_round(self, rnd: int, stats: dict) -> None:
        """Advance the manifest: round ``rnd`` is durable and complete."""
        manifest = self.read_manifest() or {"rounds": []}
        manifest["last_complete_round"] = rnd
        manifest["rounds"] = [r for r in manifest["rounds"] if r["round"] != rnd]
        manifest["rounds"].append({"round": rnd, **stats})
        manifest["rounds"].sort(key=lambda r: r["round"])
        self._commit_manifest(manifest)

    def finish(self, status: str) -> None:
        manifest = self.read_manifest() or {}
        manifest["status"] = status
        self._commit_manifest(manifest)

    def abort_requested(self) -> bool:
        """Driver checks a kill-file between rounds (the reference
        checks a Redis abort flag before each op,
        memorious/model/crawl.py:98-113)."""
        return (self.dir / "ABORT").exists()

    def truncate_after(self, rnd: int) -> None:
        """Drop anything written after complete round ``rnd`` (crash
        cleanup) and prune its manifest entries — a resume must never
        pick up counters from rounds that no longer exist on disk.

        Round r writes its NEXT frontier under ``frontier/round=r+1``,
        so the frontier table's cutoff is ``rnd + 1`` — deleting it
        would leave the resumed run nothing to read."""
        manifest = self.read_manifest()
        if manifest is not None and "rounds" in manifest:
            manifest["rounds"] = [
                r for r in manifest["rounds"] if r["round"] <= rnd
            ]
            if manifest.get("last_complete_round", -1) > rnd:
                manifest["last_complete_round"] = rnd
            self._commit_manifest(manifest)
        for table in _TABLES:
            cutoff = rnd + 1 if table == "frontier" else rnd
            tdir = self.dir / table
            if not tdir.is_dir():
                continue
            for child in tdir.iterdir():
                if child.name.startswith("round="):
                    try:
                        k = int(child.name.split("=", 1)[1])
                    except ValueError:
                        continue
                    if k > cutoff:
                        shutil.rmtree(child)
