"""Iceberg-model snapshot table on parquet (SURVEY.md §7.3).

The north rule mandates an Iceberg sink; this sandbox has no Iceberg
runtime jar and no network, so this module implements the same commit
model from first principles:

* **immutable data files** (parquet), each owning exactly one hash
  bucket of the key space;
* a **JSON manifest** per snapshot version listing the live data files,
  the applied-batch ledger, and lineage;
* an **atomically-renamed pointer** (``_current.json`` via
  ``os.replace``) — the only mutable object, so readers always see a
  complete snapshot and a crash mid-commit leaves the previous snapshot
  intact (files without a committed manifest are invisible garbage).

Exactly-once: the manifest carries ``applied_batches`` (batch_id →
version).  ``merge_apply`` on an already-applied batch_id is a no-op,
so foreachBatch replays after a crash are idempotent (SURVEY.md §4.2).

Scale design: the table is hash-bucketed on ``conv_id`` into
``n_buckets`` buckets.  A merge touches only buckets containing changed
conversations — at 100 TB with (say) 8192 buckets and a micro-batch
touching 1% of conversations, ~99% of the table's files are carried
forward untouched in the new manifest; only affected buckets are read,
anti-joined, and rewritten.  The anti-join build side is the per-batch
collapsed change set, which AQE converts to a broadcast join at runtime
when small.  On a cluster with ``iceberg-spark-runtime`` this sink swaps
for ``DataFrame.mergeInto`` (API verified present in PySpark 4.1.2) by
configuration — the public surface below mirrors what it needs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import KEY_COLS, TRANSCRIPT_COLS, TRANSCRIPT_SCHEMA


def bucket_expr(n_buckets: int):
    """Deterministic bucket id for a conv_id (xxhash64, never Python hash)."""
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


class SnapshotTable:
    """A bucketed, snapshot-versioned transcript table.

    Layout::

        root/
          data/<commit-uuid>/_bucket=NN/part-*.parquet
          snapshots/v%010d.json
          _current.json          -> {"version": N}
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # ---------------------------------------------------------------- io

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_current.json")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "snapshots", f"v{version:010d}.json")

    def current_version(self) -> int:
        """0 = empty table (no snapshot committed yet)."""
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return 0

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {
                "version": 0,
                "n_buckets": self.n_buckets,
                "files": [],
                "applied_batches": {},
                "lineage": [],
            }
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def _atomic_write_json(self, path: str, obj: dict) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _commit(self, manifest: dict) -> int:
        version = manifest["version"]
        self._atomic_write_json(self._manifest_path(version), manifest)
        self._atomic_write_json(self._pointer_path(), {"version": version})
        return version

    # -------------------------------------------------------------- read

    def read(self, version: int | None = None) -> DataFrame:
        """Current (or time-travel) table state, transcript columns only."""
        return self._read_files([f["path"] for f in self.manifest(version)["files"]])

    def _read_files(self, paths: list[str]) -> DataFrame:
        if not paths:
            return self.spark.createDataFrame([], TRANSCRIPT_SCHEMA)
        return self.spark.read.schema(TRANSCRIPT_SCHEMA).parquet(*paths).select(
            *TRANSCRIPT_COLS
        )

    def time_travel(self, version: int) -> DataFrame:
        return self.read(version)

    def applied_batches(self) -> dict:
        return self.manifest()["applied_batches"]

    # ------------------------------------------------------------- write

    def _write_commit_files(self, df: DataFrame) -> list[dict]:
        """Write ``df`` (transcript cols + _bucket) one-file-set-per-bucket;
        return manifest file entries.  The bucket id is kept both as a
        partition directory (for file bookkeeping) and could be re-derived
        from conv_id on read, so leaf files remain self-contained."""
        commit_id = uuid.uuid4().hex
        out_dir = os.path.join(self.root, "data", commit_id)
        (
            df.repartition(F.col("_bucket"))
            .sortWithinPartitions(*KEY_COLS)
            .write.partitionBy("_bucket")
            .parquet(out_dir)
        )
        entries: list[dict] = []
        for bucket_dir in os.listdir(out_dir):
            if not bucket_dir.startswith("_bucket="):
                continue
            bucket = int(bucket_dir.split("=", 1)[1])
            for fn in os.listdir(os.path.join(out_dir, bucket_dir)):
                if fn.endswith(".parquet"):
                    entries.append(
                        {
                            "path": os.path.join(out_dir, bucket_dir, fn),
                            "bucket": bucket,
                        }
                    )
        return entries

    def overwrite(self, df: DataFrame, batch_id: str | None = None) -> int:
        """Replace the whole table with ``df`` (bootstrap / full snapshot)."""
        cur = self.manifest()
        entries = self._write_commit_files(
            df.select(*TRANSCRIPT_COLS).withColumn("_bucket", bucket_expr(self.n_buckets))
        )
        version = cur["version"] + 1
        ledger = dict(cur["applied_batches"])
        if batch_id is not None:
            ledger[str(batch_id)] = version
        return self._commit(
            {
                "version": version,
                "parent": cur["version"],
                "n_buckets": self.n_buckets,
                "files": entries,
                "applied_batches": ledger,
                "lineage": cur["lineage"]
                + [
                    {
                        "op": "overwrite",
                        "version": version,
                        "batch_id": batch_id,
                        "wall_ts": time.time(),
                    }
                ],
            }
        )

    def merge_apply(
        self,
        collapsed: DataFrame,
        batch_id: str | int,
        extra_lineage: dict | None = None,
    ) -> int:
        """Exactly-once MERGE of a *collapsed* change set (one row per
        (conv_id, turn_idx), carrying the winning ``op``/payload/lsn —
        see operators/dedup.collapse_latest).

        Semantics (north_star): matched + op='D' → delete; matched →
        update; not-matched + op≠'D' → insert; replay of an applied
        batch_id → no-op.

        Physical plan: prune to affected buckets (file-level, via the
        manifest) → left-anti join current-bucket rows against changed
        keys (AQE broadcasts the small side) → union the upsert images →
        rewrite only those buckets.
        """
        cur = self.manifest()
        if str(batch_id) in cur["applied_batches"]:
            return cur["version"]  # idempotent replay

        collapsed = collapsed.withColumn("_bucket", bucket_expr(self.n_buckets))
        collapsed.persist()
        try:
            affected = {
                r["_bucket"] for r in collapsed.select("_bucket").distinct().collect()
            }
            keep = [f for f in cur["files"] if f["bucket"] not in affected]
            touch_paths = [f["path"] for f in cur["files"] if f["bucket"] in affected]

            current_rows = self._read_files(touch_paths)
            changed_keys = collapsed.select(*KEY_COLS)
            survivors = current_rows.join(changed_keys, on=KEY_COLS, how="left_anti")
            upserts = collapsed.where(F.col("op") != "D").select(*TRANSCRIPT_COLS)
            new_data = (
                survivors.unionByName(upserts)
                .withColumn("_bucket", bucket_expr(self.n_buckets))
            )
            new_entries = self._write_commit_files(new_data)

            version = cur["version"] + 1
            ledger = dict(cur["applied_batches"])
            ledger[str(batch_id)] = version
            lineage_entry = {
                "op": "merge",
                "version": version,
                "batch_id": str(batch_id),
                "affected_buckets": sorted(affected),
                "wall_ts": time.time(),
            }
            if extra_lineage:
                lineage_entry.update(extra_lineage)
            return self._commit(
                {
                    "version": version,
                    "parent": cur["version"],
                    "n_buckets": self.n_buckets,
                    "files": keep + new_entries,
                    "applied_batches": ledger,
                    "lineage": cur["lineage"] + [lineage_entry],
                }
            )
        finally:
            collapsed.unpersist()
