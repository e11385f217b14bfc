"""Spark 4 Python DataSource WRITER: a manifest-committed parquet sink.

The io/snapshots.py commit protocol (write parts → atomically publish a
manifest; readers only trust manifested files) re-expressed through
Spark's official sink API (``DataSourceWriter``): each task writes its
partition to a uniquely-named parquet part and returns a
``WriterCommitMessage`` carrying (file, rows); the DRIVER's ``commit``
publishes the manifest atomically (tmp + rename) only after every task
succeeded, and ``abort`` removes the orphaned parts. A reader that
trusts only the manifest (``read_manifest`` below) therefore never
observes a half-written result — torn writes leave orphan part files
that the manifest simply never mentions.

This is the task-commit/job-commit split every distributed sink needs
at 1000-executor scale: task outputs are speculatively written (safe
under retries — unique names, last manifest wins), and visibility is a
single driver-side atomic rename.

Filesystem contract (ADVICE r4): paths are plain ``os``-level paths, so
driver and executors MUST share the filesystem the path lives on —
local[*] trivially, NFS/FUSE-mounted HDFS/S3 on a cluster. A
non-shared-FS deployment needs the same paths routed through a DFS
client; the commit PROTOCOL (unique part names, manifest-only
visibility, atomic rename) is FS-agnostic and unchanged. Parts are
written with the DECLARED writer schema (converted to Arrow), never
inferred from the rows — a partition whose column is entirely NULL still
writes the correct type, so mixed-part reads never mistype or drop it.

Usage:
    spark.dataSource.register(ManifestParquetDataSource)
    df.write.format("manifest_parquet").option("path", p).mode("append").save()
    read_manifest(spark, p)   # only manifested parts
"""
from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


@dataclass
class PartCommit(WriterCommitMessage):
    file: str
    rows: int


def _arrow_schema(spark_schema):
    """Declared writer schema → pyarrow schema (ADVICE r4: inferring each
    part's schema from its rows types an all-NULL column as null and
    breaks mixed-part reads)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def _write_part(path: str, rows: list[dict], schema) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    fname = f"part-{uuid.uuid4().hex}.parquet"
    if rows:
        pq.write_table(pa.Table.from_pylist(rows, schema=_arrow_schema(schema)), os.path.join(path, fname))
    return fname if rows else ""


class ManifestParquetWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_parquet requires .option('path', ...)")
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator):
        """Runs per task: write this partition to a uniquely-named part
        (task retries can never collide) and report it for the manifest."""
        rows = [r.asDict() for r in iterator]
        fname = _write_part(self.path, rows, self.schema)
        return PartCommit(file=fname, rows=len(rows))

    def commit(self, messages):
        """Driver-side job commit: publish the manifest atomically. Runs
        only after EVERY task reported success. ``mode('append')`` merges
        the new parts into the prior manifest (single-writer contract —
        concurrent committers need the O_EXCL snapshot-id claims of
        io/snapshots.py, the full multi-snapshot protocol); overwrite
        mode publishes only this job's parts (prior parts become
        manifest-invisible orphans)."""
        files = [
            {"file": m.file, "rows": m.rows}
            for m in messages
            if m is not None and m.file
        ]
        mpath = os.path.join(self.path, MANIFEST)
        if not self.overwrite and os.path.exists(mpath):
            with open(mpath) as f:
                files = json.load(f)["files"] + files
        tmp = os.path.join(self.path, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump({"files": files, "total_rows": sum(x["rows"] for x in files)}, f)
        os.replace(tmp, mpath)  # atomic publish

    def abort(self, messages):
        """Failed job: remove the speculative parts; the manifest was
        never touched, so readers saw nothing."""
        for m in messages or []:
            if m is not None and m.file:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except FileNotFoundError:
                    pass


class ManifestStreamWriter(DataSourceStreamWriter):
    """Streaming form: one manifest PER MICRO-BATCH
    (``_MANIFEST-<batchId>.json``), published atomically on the driver's
    batch commit. Exactly-once comes from idempotent replay: a batch
    re-attempt regenerates parts under fresh unique names and its commit
    REPLACES that batchId's manifest, so the failed attempt's parts are
    never manifested — ``read_manifest_stream`` (union of per-batch
    manifests) can't observe duplicates or torn batches."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_parquet requires .option('path', ...)")
        self.schema = schema

    def write(self, iterator):
        rows = [r.asDict() for r in iterator]
        fname = _write_part(self.path, rows, self.schema)
        return PartCommit(file=fname, rows=len(rows))

    def commit(self, messages, batchId: int) -> None:
        files = [
            {"file": m.file, "rows": m.rows} for m in messages if m is not None and m.file
        ]
        tmp = os.path.join(self.path, f".manifest.{batchId}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"batch_id": batchId, "files": files, "total_rows": sum(x["rows"] for x in files)},
                f,
            )
        os.replace(tmp, os.path.join(self.path, f"_MANIFEST-{batchId}.json"))

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is not None and m.file:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except FileNotFoundError:
                    pass


class ManifestParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def writer(self, schema, overwrite: bool):
        return ManifestParquetWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return ManifestStreamWriter(self.options, schema)


def read_manifest_stream(spark, path: str):
    """Union of all per-batch manifests — the consistent view of the
    streaming sink (replayed/aborted attempts are invisible)."""
    import glob

    files = []
    for mf in sorted(glob.glob(os.path.join(path, "_MANIFEST-*.json"))):
        with open(mf) as f:
            files += [os.path.join(path, x["file"]) for x in json.load(f)["files"]]
    if not files:
        raise ValueError(f"no per-batch manifests under {path}")
    return spark.read.parquet(*files)


def read_manifest(spark, path: str):
    """Read ONLY the parts the manifest publishes — orphans from torn or
    aborted writes are invisible by construction."""
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    files = [os.path.join(path, x["file"]) for x in man["files"]]
    if not files:
        raise ValueError(f"manifest at {path} lists no files")
    return spark.read.parquet(*files)
