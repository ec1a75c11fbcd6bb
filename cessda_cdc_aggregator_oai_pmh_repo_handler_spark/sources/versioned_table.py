"""Versioned parquet table with ATOMIC manifest swap — the lakehouse-lite
snapshot-isolation primitive this engine's corpus maintenance sits on when
no Delta/Iceberg runtime is available (the same publish discipline as the
xmlexport sink's two-phase commit and expectations.gated_write, promoted
to a reusable table format):

- every commit stages its parquet files under ``data/`` (a unique
  per-commit subdirectory — never touching live files), writes an
  immutable ``_manifests/v{N}.json`` naming EXACTLY the snapshot's files,
  and publishes by atomically replacing the single ``_VERSION`` pointer
  (``os.replace``; rename is the one primitive object stores and POSIX
  agree is atomic);
- readers resolve pointer → manifest → explicit file list, so a crashed
  half-staged commit is invisible (its files are unreferenced) and a
  reader planning against version N keeps a stable snapshot while writers
  publish N+1 (time travel = read any retained manifest);
- writers pass ``expected_version`` for optimistic concurrency: the
  publish step re-reads the pointer and refuses on a lost race;
- ``vacuum`` deletes data files unreferenced by the retained manifests —
  the only destructive step, explicitly separated from publish.

At 100 TB the manifest lists files, not rows: commit cost is one rename
regardless of data volume, and snapshot reads prune to the manifest's
files before Spark ever lists the directory."""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """The table advanced past the writer's expected version."""


def _pointer_path(path: str) -> str:
    return os.path.join(path, "_VERSION")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, "_manifests", f"v{version}.json")


def current_version(path: str) -> int:
    with open(_pointer_path(path)) as f:
        return int(f.read().strip())


def read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def versions(path: str) -> list[int]:
    mdir = os.path.join(path, "_manifests")
    return sorted(int(n[1:-5]) for n in os.listdir(mdir)
                  if n.startswith("v") and n.endswith(".json"))


def _stage(df: DataFrame, path: str, version: int) -> list[str]:
    stage_dir = os.path.join(path, "data", f"{version}-{uuid.uuid4().hex}")
    df.write.parquet(stage_dir)
    return sorted(
        os.path.join(stage_dir, n) for n in os.listdir(stage_dir)
        if n.startswith("part-") and n.endswith(".parquet"))


def _publish(path: str, manifest: dict, expected_parent: int) -> int:
    """Write the immutable manifest, then atomically swing the pointer —
    refusing if another writer advanced it first."""
    version = manifest["version"]
    os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
    if os.path.exists(_pointer_path(path)):
        now = current_version(path)
        if now != expected_parent:
            raise ConcurrentWriteError(
                f"expected version {expected_parent}, table is at {now}")
    # manifests are immutable: an existing v{N}.json means another writer
    # claimed this version — never overwrite it
    if version != 0 and os.path.exists(_manifest_path(path, version)):
        raise ConcurrentWriteError(f"version {version} already claimed")
    with open(_manifest_path(path, version), "w") as f:
        json.dump(manifest, f)
    tmp = _pointer_path(path) + f".{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _pointer_path(path))
    return version


def create(df: DataFrame, path: str) -> int:
    """Initialize the table at version 0."""
    os.makedirs(path, exist_ok=True)
    files = _stage(df, path, 0)
    return _publish(path, {"version": 0, "parent": None, "op": "create",
                           "files": files}, expected_parent=0)


def append(df: DataFrame, path: str,
           expected_version: int | None = None) -> int:
    parent = current_version(path) if expected_version is None \
        else expected_version
    version = parent + 1
    files = _stage(df, path, version)
    prev = read_manifest(path, parent)
    return _publish(path, {"version": version, "parent": parent,
                           "op": "append", "files": prev["files"] + files},
                    expected_parent=parent)


def overwrite(df: DataFrame, path: str,
              expected_version: int | None = None) -> int:
    parent = current_version(path) if expected_version is None \
        else expected_version
    version = parent + 1
    files = _stage(df, path, version)
    return _publish(path, {"version": version, "parent": parent,
                           "op": "overwrite", "files": files},
                    expected_parent=parent)


def read(spark: SparkSession, path: str,
         version: int | None = None) -> DataFrame:
    """Snapshot read: exactly the manifest's files, any retained version."""
    v = current_version(path) if version is None else version
    return spark.read.parquet(*read_manifest(path, v)["files"])


def append_batch_exactly_once(batch: DataFrame, path: str,
                              epoch: int) -> int | None:
    """foreachBatch-shaped append: the microbatch epoch rides the
    manifest, so an at-least-once redelivery finds its epoch already
    committed in the manifest chain and becomes a no-op — streaming
    exactly-once ON TOP of the snapshot table, with no side channel.
    Returns the published version, or None for a skipped replay."""
    head = current_version(path)
    v, m = head, read_manifest(path, head)
    while True:
        if m.get("epoch") == epoch:
            return None  # replayed epoch: already in the chain
        if m.get("parent") is None:
            break
        v = m["parent"]
        m = read_manifest(path, v)
    version = head + 1
    files = _stage(batch, path, version)
    prev = read_manifest(path, head)
    return _publish(path, {"version": version, "parent": head,
                           "op": "append", "epoch": epoch,
                           "files": prev["files"] + files},
                    expected_parent=head)


def start_append_stream(spark: SparkSession, source_dir: str, schema,
                        path: str, checkpoint: str):
    """Continuously append a parquet-landing stream to the versioned
    table, one snapshot per microbatch."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(source_dir))
    return (stream.writeStream
            .foreachBatch(lambda b, eid: append_batch_exactly_once(
                b, path, int(eid)))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop manifests (and their now-unreferenced data files) older than
    the last ``keep_last`` versions. Returns the deleted file paths."""
    vs = versions(path)
    keep, drop = vs[-keep_last:], vs[:-keep_last]
    live = {f for v in keep for f in read_manifest(path, v)["files"]}
    dead: list[str] = []
    for v in drop:
        for f in read_manifest(path, v)["files"]:
            if f not in live and os.path.exists(f):
                os.remove(f)
                dead.append(f)
        os.remove(_manifest_path(path, v))
    # sweep now-empty stage dirs
    data_dir = os.path.join(path, "data")
    for d in os.listdir(data_dir):
        full = os.path.join(data_dir, d)
        if os.path.isdir(full) and not any(
                n.endswith(".parquet") for n in os.listdir(full)):
            shutil.rmtree(full)
    return dead
