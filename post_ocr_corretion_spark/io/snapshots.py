"""Iceberg-style snapshot commits over parquet (north rule: "resumable
from the last committed snapshot/checkpoint, per-partition lineage rows
and counters") — no Iceberg jar in this container, so the commit protocol
is implemented directly; the semantics it reproduces are the table-format
basics (S6 analog — the reference's checkpoint/resume,
seq2seqTraining.py:65-93):

layout:
    <base>/data/snapshot=<id>/*.parquet     the rows
    <base>/lineage/snapshot=<id>/*.parquet  per-file lineage counters
    <base>/_snapshots/<id>.json             the COMMIT marker (atomic
                                            rename; a snapshot without its
                                            marker is invisible garbage)

- writers never touch previous snapshots (append-only, time-travelable);
- the marker is written last via tmp+rename — readers can never observe a
  half-written snapshot (crash-resume safety);
- lineage rows carry per-parquet-file row counts + key bounds, computed
  from the files actually written (exactly-once accounting);
- ``resume_or_run`` is the driver-side resume: if a committed snapshot
  exists, read it back instead of recomputing.
"""
from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotWriter:
    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(os.path.join(base_dir, "_snapshots"), exist_ok=True)

    # ---- manifest bookkeeping -------------------------------------------
    def committed_snapshots(self) -> list[int]:
        d = os.path.join(self.base, "_snapshots")
        out = []
        for name in os.listdir(d):
            if name.endswith(".json"):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def latest(self) -> int | None:
        ids = self.committed_snapshots()
        return ids[-1] if ids else None

    def manifest(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.base, "_snapshots", f"{snapshot_id}.json")) as f:
            return json.load(f)

    def _claim_sid(self) -> int:
        """Allocate the next snapshot id via an O_CREAT|O_EXCL claim file —
        two concurrent writers on one base dir can never pick the same sid
        and silently cross-commit (ADVICE r1); the loser just advances. A
        claim whose writer crashed pre-commit burns its id (append-only,
        ids need not be dense). Claims are dotfiles, invisible to
        ``committed_snapshots``."""
        sid = (self.latest() or 0) + 1
        while True:
            claim = os.path.join(self.base, "_snapshots", f".{sid}.claim")
            try:
                os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                return sid
            except FileExistsError:
                sid += 1

    # ---- write path ------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        key_col: str | None = None,
        counters: dict | None = None,
        counters_fn=None,
        partition_by: list[str] | None = None,
    ) -> int:
        """``counters_fn`` is evaluated AFTER the data write (use it to
        read ``Observation.get``, which only resolves post-action).
        ``partition_by`` writes hive-partitioned data under the snapshot
        (the Iceberg partition-spec analog) — readers filtering on those
        columns get partition pruning for free."""
        sid = self._claim_sid()
        data_path = os.path.join(self.base, "data", f"snapshot={sid}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)
        if counters_fn is not None:
            counters = dict(counters or {}, **counters_fn())

        spark = df.sparkSession
        written = spark.read.parquet(data_path)
        lineage_cols = [
            F.input_file_name().alias("file"),
        ]
        lin = written.select(*lineage_cols, *( [F.col(key_col)] if key_col else [] ))
        aggs = [F.count(F.lit(1)).alias("rows")]
        if key_col:
            aggs += [F.min(key_col).alias("key_min"), F.max(key_col).alias("key_max")]
        lineage = lin.groupBy("file").agg(*aggs)
        lineage_path = os.path.join(self.base, "lineage", f"snapshot={sid}")
        lineage.write.mode("overwrite").parquet(lineage_path)

        # total rows from the lineage just written (sum of per-file rows)
        # instead of a THIRD scan of the data files
        total_rows = int(
            spark.read.parquet(lineage_path).agg(F.sum("rows")).collect()[0][0] or 0
        )
        manifest = {
            "snapshot_id": sid,
            "rows": total_rows,
            "data_path": data_path,
            "lineage_path": lineage_path,
            "committed_at": time.time(),
            "schema": df.schema.simpleString(),
            # the PRE-write schema, pinned (ADVICE r2): hive partition
            # inference on readback moves partition columns to the end and
            # re-infers numeric-looking strings as ints; read() applies
            # this so resumed DataFrames match the fresh-run branch
            # column-for-column and dtype-for-dtype.
            "schema_json": df.schema.json(),
            "counters": counters or {},  # job-level counters travel WITH the commit
        }
        tmp = os.path.join(self.base, "_snapshots", f".{sid}.json.tmp")
        final = os.path.join(self.base, "_snapshots", f"{sid}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, final)  # the atomic commit point
        return sid

    # ---- read path ---------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        sid = snapshot_id if snapshot_id is not None else self.latest()
        if sid is None or sid not in self.committed_snapshots():
            raise FileNotFoundError(f"no committed snapshot {snapshot_id!r} under {self.base}")
        m = self.manifest(sid)
        schema_json = m.get("schema_json")
        if schema_json:
            from pyspark.sql.types import StructType

            pinned = StructType.fromJson(json.loads(schema_json))
            # .schema() pins partition-column dtypes; the select pins order
            return spark.read.schema(pinned).parquet(m["data_path"]).select(
                *[f.name for f in pinned.fields]
            )
        return spark.read.parquet(m["data_path"])

    def read_lineage(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        sid = snapshot_id if snapshot_id is not None else self.latest()
        return spark.read.parquet(self.manifest(sid)["lineage_path"])

    def compact(
        self, spark: SparkSession, snapshot_id: int | None = None, target_files: int = 8
    ) -> int:
        """Iceberg ``rewrite_data_files`` analog: rewrite a committed
        snapshot's data into ``target_files`` files as a NEW snapshot
        (append-only — the source snapshot stays time-travelable). The
        manifest records the provenance (``compacted_from``). Returns the
        new snapshot id."""
        src = snapshot_id if snapshot_id is not None else self.latest()
        df = self.read(spark, src).coalesce(target_files)
        sid = self.write(df, counters={"compacted_from": src})
        m = self.manifest(sid)
        m["compacted_from"] = src
        tmp = os.path.join(self.base, "_snapshots", f".{sid}.json.tmp2")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.rename(tmp, os.path.join(self.base, "_snapshots", f"{sid}.json"))
        return sid

    def diff(self, spark: SparkSession, sid_a: int, sid_b: int, key_col: str) -> DataFrame:
        """Changelog between two snapshots keyed by ``key_col``:
        (key, change) with change ∈ {added, removed} — keys present in b
        but not a, and vice versa (an Iceberg incremental-read analog;
        content changes under the same key are out of scope for this
        key-level diff)."""
        a = self.read(spark, sid_a).select(F.col(key_col).alias("key")).distinct()
        b = self.read(spark, sid_b).select(F.col(key_col).alias("key")).distinct()
        added = b.join(a, "key", "left_anti").select("key", F.lit("added").alias("change"))
        removed = a.join(b, "key", "left_anti").select("key", F.lit("removed").alias("change"))
        return added.unionByName(removed)

    def resume_or_run(
        self,
        spark: SparkSession,
        job,
        key_col: str | None = None,
        counters_fn=None,
        partition_by: list[str] | None = None,
    ) -> tuple[DataFrame, bool]:
        """Returns (df, resumed). ``job() -> DataFrame`` runs only when no
        committed snapshot exists — the north-rule resume semantics."""
        if self.latest() is not None:
            return self.read(spark), True
        df = job()
        sid = self.write(df, key_col=key_col, counters_fn=counters_fn, partition_by=partition_by)
        return self.read(spark, sid), False
