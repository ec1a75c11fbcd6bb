"""`xmlexport` — a full PySpark Python Data Source (Spark 4
``pyspark.sql.datasource``): batch + streaming WRITER exporting any
DataFrame as sharded XML with two-phase commit, and a manifest-driven
READER that loads a committed export back as a table (one input
partition per shard).

The reference serves OAI-PMH XML per request (cdcagg_oai/serve.py
renders one response at a time); the batch-export counterpart here is a
SINK: each partition writes one ``part-*.xml`` shard, and the job is
atomic under the writer protocol —

- ``write(iterator)`` runs ON EXECUTORS: renders the partition's rows to
  a temp file (``.tmp`` suffix) and returns a ``WriterCommitMessage``
  carrying (tmp name, final name, row count). A task retry overwrites
  its own temp file; nothing is visible yet.
- ``commit(messages)`` runs ON THE DRIVER exactly once, after every task
  succeeded: renames each temp shard to its final name and writes
  ``_MANIFEST.json`` (shard list + row totals) LAST — a reader that
  requires the manifest can never observe a half-committed export.
- ``abort(messages)`` removes whatever temp shards the failed job left.

This is the same rename-on-commit discipline Hadoop output committers
use, expressed through the Python DS API; at 100 TB the per-partition
shard write is embarrassingly parallel and the driver touches only
commit messages (one tiny object per partition, never row data).

Usage:
    spark.dataSource.register(XMLExportDataSource)
    df.write.format("xmlexport").option("path", out_dir) \
        .option("root", "records").mode("append").save()

Reference parity: templates/*.xml record rendering is the per-request
form (oai/render.py); this module is its distributed bulk-export dual
(operators/export.py holds the mapInPandas variant — the writer form
adds job-level atomicity).
"""

from __future__ import annotations

import json
import os
import uuid
from xml.sax.saxutils import escape

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


class ShardCommit(WriterCommitMessage):
    """Per-task result: where the temp shard is, where it belongs, and
    how many records it holds (picklable; crosses executor→driver)."""

    def __init__(self, tmp_path: str, final_name: str, n_records: int):
        self.tmp_path = tmp_path
        self.final_name = final_name
        self.n_records = n_records


def _render_row(row, columns: list[str]) -> str:
    parts = ["  <record>"]
    for name, value in zip(columns, row):
        if value is None:
            continue
        parts.append(
            f'    <field name="{escape(str(name))}">'
            f"{escape(str(value))}</field>")
    parts.append("  </record>")
    return "\n".join(parts)


class _XMLShardWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("xmlexport requires .option('path', <dir>)")
        self.path = path
        self.root = options.get("root", "records")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    # --- executor side -----------------------------------------------------
    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final_name = f"part-{pid:05d}.xml"
        # task-attempt-unique temp name: a retried task never fights its
        # zombie predecessor over one file
        tmp_path = os.path.join(self.path,
                                f".{final_name}.{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp_path, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            f.write(f"<{self.root}>\n")
            for row in iterator:
                f.write(_render_row(row, self.columns))
                f.write("\n")
                n += 1
            f.write(f"</{self.root}>\n")
        return ShardCommit(tmp_path, final_name, n)

    # --- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".xml") or name == MANIFEST:
                    os.remove(os.path.join(self.path, name))
        shards = []
        for m in messages:
            os.replace(m.tmp_path, os.path.join(self.path, m.final_name))
            shards.append({"shard": m.final_name, "records": m.n_records})
        manifest = {
            "shards": sorted(shards, key=lambda s: s["shard"]),
            "total_records": sum(s["records"] for s in shards),
            "columns": self.columns,
        }
        # manifest LAST, via its own temp+rename: the export is visible
        # all-or-nothing to manifest-driven readers
        tmp = os.path.join(self.path, f".{MANIFEST}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _XMLShardStreamWriter(DataSourceStreamWriter):
    """Streaming form of the sink: tasks render EPOCH-AGNOSTIC temp
    shards (executors are never told the batch id); ``commit(messages,
    batchId)`` — driver-side, once per epoch — moves them into
    ``epoch=N/`` and writes that epoch's manifest last. A replayed epoch (restart, at-least-once
    upstream) re-renders fresh temps and re-renames over the SAME final
    names, so replay is idempotent: the epoch directory is only ever one
    complete rendering of that microbatch."""

    def __init__(self, options: dict, schema):
        path = options.get("path")
        if not path:
            raise ValueError("xmlexport requires .option('path', <dir>)")
        self.path = path
        self.root = options.get("root", "records")
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp_path = os.path.join(
            self.path, f".stream-part-{pid:05d}.{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp_path, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            f.write(f"<{self.root}>\n")
            for row in iterator:
                f.write(_render_row(row, self.columns))
                f.write("\n")
                n += 1
            f.write(f"</{self.root}>\n")
        return ShardCommit(tmp_path, f"part-{pid:05d}.xml", n)

    def commit(self, messages, batchId: int) -> None:
        epoch_dir = os.path.join(self.path, f"epoch={batchId}")
        os.makedirs(epoch_dir, exist_ok=True)
        shards = []
        for m in messages:
            os.replace(m.tmp_path, os.path.join(epoch_dir, m.final_name))
            shards.append({"shard": m.final_name, "records": m.n_records})
        manifest = {
            "epoch": batchId,
            "shards": sorted(shards, key=lambda s: s["shard"]),
            "total_records": sum(s["records"] for s in shards),
            "columns": self.columns,
        }
        tmp = os.path.join(epoch_dir, f".{MANIFEST}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(epoch_dir, MANIFEST))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _XMLShardReader(DataSourceReader):
    """Read an export back as a table: the MANIFEST is the source of
    truth (schema + shard list — a half-committed export is invisible
    because the manifest lands last), one input partition per shard, so
    read parallelism equals write parallelism. All columns come back as
    strings (the export stringifies; omitted null fields return NULL)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("xmlexport requires .option('path', <dir>)")
        manifest_path = os.path.join(path, MANIFEST)
        if not os.path.exists(manifest_path):
            raise ValueError(f"no {MANIFEST} in {path!r}: nothing committed")
        with open(manifest_path, encoding="utf-8") as f:
            self.manifest = json.load(f)
        self.path = path

    def schema(self) -> str:
        return ", ".join(f"`{c}` string" for c in self.manifest["columns"])

    def partitions(self):
        return [_ShardPartition(os.path.join(self.path, s["shard"]))
                for s in self.manifest["shards"]]

    def read(self, partition: _ShardPartition):
        import xml.etree.ElementTree as ET

        columns = self.manifest["columns"]
        root = ET.parse(partition.path).getroot()
        for rec in root.findall("record"):
            fields = {f.get("name"): f.text or ""
                      for f in rec.findall("field")}
            yield tuple(fields.get(c) for c in columns)


class XMLExportDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xmlexport"

    def writer(self, schema, overwrite: bool) -> _XMLShardWriter:
        return _XMLShardWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> _XMLShardStreamWriter:
        return _XMLShardStreamWriter(self.options, schema)

    def schema(self) -> str:
        return _XMLShardReader(self.options).schema()

    def reader(self, schema) -> _XMLShardReader:
        return _XMLShardReader(self.options)
