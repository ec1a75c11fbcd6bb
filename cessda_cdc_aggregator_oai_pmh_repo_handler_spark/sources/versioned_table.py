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


class SchemaEvolutionError(RuntimeError):
    """Incompatible schema change (type conflict, undeclared drift, or
    re-adding a dropped column — the field-ID-less limitation)."""


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
    files = sorted(
        os.path.join(stage_dir, n) for n in os.listdir(stage_dir)
        if n.startswith("part-") and n.endswith(".parquet"))
    # commit-time integrity checksums, computed IN THE CLUSTER over the
    # just-written files (one task per file) — the driver never re-reads
    # the staged bytes, so a wide compaction's commit cost stays O(files)
    # on the driver instead of O(bytes) (VERDICT r5 #3 / round-6 task 5)
    _STAGED_CHECKSUMS.update(
        _checksums_distributed(df.sparkSession, files))
    return files


# staged-file checksum cache: filled by _stage (distributed), drained by
# _publish when it assembles the manifest. Driver-local, per-process.
_STAGED_CHECKSUMS: dict[str, str] = {}


def _md5_file(f: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(f, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _checksums(files: list[str]) -> dict:
    return {f: _md5_file(f) for f in files}


def _checksums_distributed(spark: SparkSession, files: list[str]) -> dict:
    """md5 of each file computed by executor tasks (shared storage: the
    same paths the executors just wrote). Falls back to the driver loop
    for trivial lists where a job isn't worth scheduling."""
    if len(files) <= 1:
        return _checksums(files)
    sc = spark.sparkContext
    pairs = (sc.parallelize(files, len(files))
             .map(lambda f: (f, _md5_file(f))).collect())
    return dict(pairs)


def verify_integrity(path: str, version: int | None = None,
                     spark: SparkSession | None = None) -> dict:
    """Bit-rot / tamper audit: recompute every manifest-listed file's md5
    (data AND delete files) against the checksums recorded at commit
    time. Returns {"ok": [...], "corrupt": [...], "unchecked": [...]}
    — unchecked = files from commits made before checksumming existed.
    Pass ``spark`` to recompute in the cluster (one task per file — the
    100 TB mode); without it the driver reads each file itself. A corrupt
    file is recoverable from the parent snapshot as long as vacuum
    hasn't run."""
    v = current_version(path) if version is None else version
    m = read_manifest(path, v)
    recorded = m.get("checksums", {})
    targets = m["files"] + m.get("delete_vectors", {}).get("files", [])
    checkable = [f for f in targets if f in recorded]
    actual = (_checksums_distributed(spark, checkable) if spark is not None
              else _checksums(checkable))
    report = {"ok": [], "corrupt": [], "unchecked": []}
    for f in targets:
        want = recorded.get(f)
        if want is None:
            report["unchecked"].append(f)
        elif actual[f] == want:
            report["ok"].append(f)
        else:
            report["corrupt"].append(f)
    return report


def _file_stats(files: list[str]) -> dict:
    """Per-file column min/max ZONE MAPS read from the parquet FOOTERS
    (pyarrow metadata — no data pages touched): the manifest-level
    statistics `read_pruned` skips files with. Strings/ints/floats only;
    a column missing stats in any row group is omitted for that file."""
    import pyarrow.parquet as pq

    out = {}
    for f in files:
        meta = pq.ParquetFile(f).metadata
        cols: dict = {"__rows__": [meta.num_rows, meta.num_rows]}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                st = col.statistics
                name = col.path_in_schema
                if st is None or not st.has_min_max:
                    cols[name] = None
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        cols[name] = None
                        continue
                if not isinstance(mn, (int, float, str)):
                    cols[name] = None
                    continue
                prev = cols.get(name)
                if prev is None and name in cols:
                    continue
                cols[name] = ([min(prev[0], mn), max(prev[1], mx)]
                              if prev else [mn, mx])
        out[f] = {k: v for k, v in cols.items() if v is not None}
    return out


BLOOM_BITS = 8192      # per (file, column) filter size
BLOOM_HASHES = 5
EPOCH_MEMORY = 64      # recent streaming epochs carried per manifest


def build_blooms(spark: SparkSession, path: str, version: int,
                 column: str) -> int:
    """Attach a per-file BLOOM FILTER on ``column`` to an existing
    manifest version (zone maps' complement: they skip on RANGES of
    clustered keys, blooms skip POINT lookups on keys with no layout at
    all). Distributed build: per (file, bit-position) rows reduce to one
    bitset per file — executors never ship values, only set bits. The
    manifest is rewritten in place (bloom metadata is additive; the file
    list and pointer are untouched, so this is not a new version)."""
    from pyspark.sql import functions as F

    m = read_manifest(path, version)
    blooms: dict[str, str] = {}
    for f in m["files"]:
        # schema-aware per-file read: a file written before `column` was
        # added to an evolved schema yields NULLs, not an analysis error
        rows = (_read_files(spark, m, [f]).select(
            F.col(column).cast("string").alias("v")).distinct())
        bits = bytearray(BLOOM_BITS // 8)
        pos = (rows.select(F.explode(F.array(*[
            (F.crc32(F.concat(F.lit(f"{k}|"), F.col("v")))
             % F.lit(BLOOM_BITS)) for k in range(BLOOM_HASHES)
        ])).alias("p")).distinct().collect())
        for r in pos:
            p = int(r["p"])
            bits[p // 8] |= 1 << (p % 8)
        import base64

        blooms[f] = base64.b64encode(bytes(bits)).decode()
    m.setdefault("blooms", {})[column] = blooms
    # temp + os.replace: the live, pointer-referenced manifest must never
    # be exposed to a torn in-place write (ADVICE r5) — same atomic
    # discipline as _publish's pointer swap
    mpath = _manifest_path(path, version)
    mtmp = mpath + f".{uuid.uuid4().hex}.tmp"
    with open(mtmp, "w") as f:
        json.dump(m, f)
    os.replace(mtmp, mpath)
    return len(blooms)


def _read_files(spark: SparkSession, m: dict, files: list[str]):
    """Read a manifest file subset under the snapshot's DECLARED schema
    (evolution contract: pre-add files yield NULLs, dropped physical
    columns are pruned); raw parquet read for pre-schema-tracking
    tables."""
    raw = m.get("schema")
    if raw:
        from pyspark.sql.types import StructType

        return spark.read.schema(
            StructType.fromJson(json.loads(raw))).parquet(*files)
    return spark.read.parquet(*files)


def read_point(spark: SparkSession, path: str, column: str, value,
               version: int | None = None) -> tuple[DataFrame, int, int]:
    """Point lookup through the manifest blooms: skip every file whose
    filter proves the key absent; files without a bloom stay (safe
    side). Returns (df, total_files, files_read).

    The probe value is normalized through the SAME engine-side
    ``CAST(x AS STRING)`` the bloom was built from — Python ``str()``
    diverges for booleans ('True' vs 'true'), decimals and some floats,
    which would silently bloom-skip a present key (ADVICE r5). ints and
    strings take the fast path (the renderings provably coincide)."""
    import base64

    from pyspark.sql import functions as F

    v = current_version(path) if version is None else version
    m = read_manifest(path, v)
    blooms = m.get("blooms", {}).get(column, {})
    if isinstance(value, str) or (isinstance(value, int)
                                  and not isinstance(value, bool)):
        probe = str(value)
    else:
        probe = spark.range(1).select(
            F.lit(value).cast("string").alias("v")).first()["v"]
    keep = []
    for f in m["files"]:
        b64 = blooms.get(f)
        if b64 is None:
            keep.append(f)
            continue
        bits = base64.b64decode(b64)
        import zlib

        hits = all(
            bits[(zlib.crc32(f"{k}|{probe}".encode()) % BLOOM_BITS) // 8]
            >> ((zlib.crc32(f"{k}|{probe}".encode()) % BLOOM_BITS) % 8) & 1
            for k in range(BLOOM_HASHES))
        if hits:
            keep.append(f)
    pred = F.col(column).cast("string") == probe

    def _with_deletes(df: DataFrame) -> DataFrame:
        dv = m.get("delete_vectors")
        if dv:  # same merge-on-read semantics as read()
            dead = spark.read.parquet(*dv["files"]).select(
                F.col("k").alias(dv["key"])).distinct()
            df = df.join(F.broadcast(dead), on=dv["key"], how="left_anti")
        return df

    if not keep:
        return (_read_files(spark, m, m["files"]).filter(F.lit(False)),
                len(m["files"]), 0)
    return (_with_deletes(_read_files(spark, m, keep).filter(pred)),
            len(m["files"]), len(keep))


def _publish(path: str, manifest: dict, expected_parent: int) -> int:
    """Write the immutable manifest, then atomically swing the pointer —
    refusing if another writer advanced it first.

    Crash recovery (ADVICE r5): a writer that died between writing
    ``v{N}.json`` and the pointer swap must not wedge the table forever.
    A manifest whose version is AHEAD of the pointer is an abandoned
    claim — it is replaced (temp file + ``os.replace``), and after the
    pointer swing the manifest is re-read to verify this commit's nonce
    won any photo-finish race (the loser raises ConcurrentWriteError and
    its staged files wait for vacuum)."""
    version = manifest["version"]
    os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
    if os.path.exists(_pointer_path(path)):
        now = current_version(path)
        if now != expected_parent:
            raise ConcurrentWriteError(
                f"expected version {expected_parent}, table is at {now}")
        if now >= version and version != 0:
            # the pointer already covers this version: genuinely committed
            raise ConcurrentWriteError(f"version {version} already committed")
    # integrity: checksum every newly staged file once (parent entries
    # carry over so a commit's cost stays proportional to what it wrote).
    # Staged files were checksummed in-cluster at write time (_stage);
    # anything not covered (delete files staged before this change, old
    # tables) falls back to the driver loop.
    parent = manifest.get("parent")
    pm = read_manifest(path, parent) if parent is not None else {}
    prior = pm.get("checksums", {})
    listed = manifest["files"] + manifest.get("delete_vectors",
                                              {}).get("files", [])
    manifest["checksums"] = {
        **{f: c for f, c in prior.items() if f in listed},
        **{f: _STAGED_CHECKSUMS.pop(f)
           for f in listed if f in _STAGED_CHECKSUMS},
    }
    manifest["checksums"].update(
        _checksums([f for f in listed if f not in manifest["checksums"]]))
    # bounded recent-epoch set rides every manifest so exactly-once replay
    # detection reads ONLY the head manifest (no parent-chain walk — which
    # vacuum would sever and which is O(versions) per batch; ADVICE r5)
    inherited = pm.get("recent_epochs", [])
    own = [manifest["epoch"]] if "epoch" in manifest else []
    manifest["recent_epochs"] = (inherited + own)[-EPOCH_MEMORY:]
    # schema tracking rides every manifest: ops that don't change it
    # (append/merge/compact/delete) inherit the parent's declaration, so
    # readers always find the snapshot's schema in ONE manifest read
    for meta_key in ("schema", "dropped_columns"):
        if meta_key not in manifest and meta_key in pm:
            manifest[meta_key] = pm[meta_key]
    manifest["commit_id"] = uuid.uuid4().hex
    import time as _time

    manifest["committed_at"] = _time.time()  # TIMESTAMP AS OF resolution
    mpath = _manifest_path(path, version)
    mtmp = mpath + f".{uuid.uuid4().hex}.tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, mpath)  # atomic: replaces abandoned claims, never
    #                          leaves a torn manifest (ADVICE r5)
    tmp = _pointer_path(path) + f".{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _pointer_path(path))
    if read_manifest(path, version).get("commit_id") != manifest["commit_id"]:
        raise ConcurrentWriteError(
            f"lost photo-finish race publishing version {version}")
    return version


def create(df: DataFrame, path: str) -> int:
    """Initialize the table at version 0."""
    os.makedirs(path, exist_ok=True)
    files = _stage(df, path, 0)
    return _publish(path, {"version": 0, "parent": None, "op": "create",
                           "files": files, "stats": _file_stats(files),
                           "schema": df.schema.json()},
                    expected_parent=0)


def version_asof(path: str, ts: float) -> int:
    """Delta's ``TIMESTAMP AS OF``: the newest RETAINED version whose
    commit time is ≤ ``ts`` (manifests record ``committed_at`` at
    publish). Raises if every retained commit is newer — the caller
    asked for history that vacuum already dropped (or a pre-table time).
    Scan cost: one manifest read per retained version, driver-local."""
    best = None
    for v in versions(path):
        at = read_manifest(path, v).get("committed_at")
        if at is not None and at <= ts and (best is None or v > best):
            best = v
    if best is None:
        raise ValueError(
            f"no retained version committed at or before {ts}")
    return best


def table_schema(path: str, version: int | None = None):
    """The snapshot's declared schema (StructType), or None for tables
    created before schema tracking."""
    from pyspark.sql.types import StructType

    v = current_version(path) if version is None else version
    raw = read_manifest(path, v).get("schema")
    return StructType.fromJson(json.loads(raw)) if raw else None


def _strip_nullability(t):
    """Type-JSON normalized for compatibility checks: nullability markers
    removed at every depth (parquet round-trips and builders legitimately
    disagree on nullable flags — a required field fits a nullable slot),
    timestamp_ntz folded into timestamp (this engine pins the session
    timezone to UTC, making the two representations value-identical; a
    parquet round-trip freely flips between them), and per-field
    "metadata" annotations dropped (e.g. the watermark's
    spark.watermarkDelayMs tag — annotations, not types)."""
    if isinstance(t, dict):
        return {k: _strip_nullability(v) for k, v in t.items()
                if k not in ("nullable", "containsNull",
                             "valueContainsNull", "metadata")}
    if isinstance(t, list):
        return [_strip_nullability(x) for x in t]
    if t == "timestamp_ntz":
        return "timestamp"
    return t


def _schema_fields(manifest_or_schema) -> dict:
    """{name: nullability-normalized dataType-json} from a manifest's
    schema declaration."""
    if manifest_or_schema is None:
        return {}
    raw = (manifest_or_schema.get("schema")
           if isinstance(manifest_or_schema, dict) else manifest_or_schema)
    if not raw:
        return {}
    return {f["name"]: json.dumps(_strip_nullability(f["type"]),
                                  sort_keys=True)
            for f in json.loads(raw)["fields"]}


def _check_append_schema(df: DataFrame, prev: dict) -> None:
    declared = _schema_fields(prev)
    if not declared:
        return  # pre-schema-tracking table: legacy behavior
    incoming = _schema_fields(df.schema.json())
    if incoming != declared:
        extra = sorted(set(incoming) - set(declared))
        missing = sorted(set(declared) - set(incoming))
        changed = sorted(n for n in set(incoming) & set(declared)
                         if incoming[n] != declared[n])
        details = "; ".join(
            f"{n}: table={declared[n]} incoming={incoming[n]}"
            for n in changed)
        raise SchemaEvolutionError(
            f"append schema drift (extra={extra}, missing={missing}, "
            f"type-changed={changed}); use append_evolve for declared "
            f"evolution{'; ' + details if details else ''}")


def append(df: DataFrame, path: str,
           expected_version: int | None = None) -> int:
    parent = current_version(path) if expected_version is None \
        else expected_version
    version = parent + 1
    prev = read_manifest(path, parent)
    _check_append_schema(df, prev)
    files = _stage(df, path, version)
    return _publish(path, {"version": version, "parent": parent,
                           "op": "append", "files": prev["files"] + files,
                           "stats": {**prev.get("stats", {}),
                                     **_file_stats(files)},
                           "blooms": prev.get("blooms", {}),
                           **({"delete_vectors": prev["delete_vectors"]}
                              if prev.get("delete_vectors") else {})},
                    expected_parent=parent)


def append_evolve(df: DataFrame, path: str,
                  expected_version: int | None = None) -> int:
    """SCHEMA-EVOLVING append (the Delta `mergeSchema` / Iceberg
    add-column idiom): new columns in ``df`` extend the table schema;
    columns ``df`` omits stay declared and read as NULL from the new
    files; shared columns must keep their exact type (no silent
    widening). Existing data files are NEVER rewritten — evolution is a
    manifest-only schema change plus an ordinary file append, O(batch)
    at any table size. Re-adding a previously dropped column name is
    refused: without Iceberg-style field IDs, parquet files written
    before the drop still carry the old values under that name and a
    re-add would resurrect them (the documented limitation field IDs
    exist to solve)."""
    parent = current_version(path) if expected_version is None \
        else expected_version
    version = parent + 1
    prev = read_manifest(path, parent)
    if not prev.get("schema"):
        # a legacy (pre-schema-tracking) table: evolving against an
        # UNKNOWN declaration would silently narrow reads to this batch's
        # columns — establish a declaration first (overwrite/compact)
        raise SchemaEvolutionError(
            "table has no schema declaration; overwrite or compact it "
            "once to establish one before evolving")
    declared = _schema_fields(prev)
    incoming = _schema_fields(df.schema.json())
    dropped = set(prev.get("dropped_columns", []))
    conflicts = sorted(n for n in incoming
                       if n in declared and incoming[n] != declared[n])
    if conflicts:
        raise SchemaEvolutionError(
            f"type conflict on {conflicts}: evolution may add columns, "
            "never retype them")
    resurrected = sorted((set(incoming) - set(declared)) & dropped)
    if resurrected:
        raise SchemaEvolutionError(
            f"column(s) {resurrected} were dropped; re-adding would "
            "resurrect pre-drop values from old files (no field IDs)")
    import pyspark.sql.types as T

    base = (T.StructType.fromJson(json.loads(prev["schema"])).fields
            if prev.get("schema") else [])
    evolved = T.StructType(
        list(base) + [f for f in df.schema.fields
                      if f.name not in declared])
    files = _stage(df, path, version)
    return _publish(path, {"version": version, "parent": parent,
                           "op": "append_evolve",
                           "files": prev["files"] + files,
                           "stats": {**prev.get("stats", {}),
                                     **_file_stats(files)},
                           "blooms": prev.get("blooms", {}),
                           "schema": evolved.json(),
                           **({"delete_vectors": prev["delete_vectors"]}
                              if prev.get("delete_vectors") else {})},
                    expected_parent=parent)


def drop_column(path: str, column: str,
                expected_version: int | None = None) -> int:
    """METADATA-ONLY column drop: a new snapshot declaring the schema
    without ``column`` — zero data files touched (readers' explicit
    schema simply stops projecting it; parquet column pruning means the
    bytes are never even scanned). The name goes on the table's
    ``dropped_columns`` tombstone list so a later re-add can't resurrect
    old values. Commit cost: one manifest write, at 100 TB exactly like
    at 100 KB."""
    import pyspark.sql.types as T

    parent = current_version(path) if expected_version is None \
        else expected_version
    prev = read_manifest(path, parent)
    if not prev.get("schema"):
        raise SchemaEvolutionError("table has no schema declaration")
    base = T.StructType.fromJson(json.loads(prev["schema"]))
    if column not in base.names:
        raise SchemaEvolutionError(f"no column {column!r} in schema")
    evolved = T.StructType([f for f in base.fields if f.name != column])
    return _publish(
        path,
        {"version": parent + 1, "parent": parent, "op": "drop_column",
         "files": prev["files"], "stats": prev.get("stats", {}),
         "blooms": prev.get("blooms", {}),
         "schema": evolved.json(),
         "dropped_columns": sorted(
             set(prev.get("dropped_columns", [])) | {column}),
         **({"delete_vectors": prev["delete_vectors"]}
            if prev.get("delete_vectors") else {})},
        expected_parent=parent)


def overwrite(df: DataFrame, path: str,
              expected_version: int | None = None,
              epoch: int | None = None) -> int:
    parent = current_version(path) if expected_version is None \
        else expected_version
    version = parent + 1
    files = _stage(df, path, version)
    # a full overwrite replaces every data file, so it declares its own
    # schema and clears drop tombstones (no pre-drop file can resurrect)
    return _publish(path, {"version": version, "parent": parent,
                           "op": "overwrite", "files": files,
                           "stats": _file_stats(files),
                           "schema": df.schema.json(),
                           "dropped_columns": [],
                           **({"epoch": epoch} if epoch is not None else {})},
                    expected_parent=parent)


def count_rows(path: str, version: int | None = None) -> int | None:
    """Snapshot row count from MANIFEST footer statistics alone — zero
    Spark jobs (the `__rows__` zone-map slot carries each file's
    parquet-footer num_rows). None if any file lacks stats or the
    snapshot has merge-on-read deletes pending (those subtract at read
    time, so only a data read can count them)."""
    v = current_version(path) if version is None else version
    m = read_manifest(path, v)
    if m.get("delete_vectors"):
        return None
    stats = m.get("stats", {})
    total = 0
    for f in m["files"]:
        r = stats.get(f, {}).get("__rows__")
        if r is None:
            return None
        total += int(r[0])
    return total


def read(spark: SparkSession, path: str,
         version: int | None = None) -> DataFrame:
    """Snapshot read: exactly the manifest's files, any retained version;
    MERGE-ON-READ deletes (delete_keys) apply as a broadcast anti-join
    against the snapshot's delete files."""
    from pyspark.sql import functions as F

    v = current_version(path) if version is None else version
    m = read_manifest(path, v)
    df = _read_files(spark, m, m["files"])
    dv = m.get("delete_vectors")
    if dv:
        dead = spark.read.parquet(*dv["files"]).select(
            F.col("k").alias(dv["key"])).distinct()
        df = df.join(F.broadcast(dead), on=dv["key"], how="left_anti")
    return df


def delete_keys(spark: SparkSession, path: str, key_col: str,
                keys: DataFrame) -> int:
    """MERGE-ON-READ delete: record the doomed keys in a tiny delete
    file instead of rewriting data (publish cost ∝ deletes, not table);
    every read of this and later snapshots anti-joins them out.
    Accumulates across calls; ``compact`` MATERIALIZES the deletions
    (rewrites survivors) and clears the vectors — the write-amplification
    trade made explicit. One key column per table (the common case);
    time travel before this version still shows the rows."""
    head = current_version(path)
    prev = read_manifest(path, head)
    pdv = prev.get("delete_vectors")
    if pdv and pdv["key"] != key_col:
        raise ValueError(f"existing delete vectors use key {pdv['key']}")
    version = head + 1
    from pyspark.sql import functions as F

    dfiles = _stage(keys.select(F.col(key_col).alias("k")).distinct(),
                    path, version)
    return _publish(path, {
        "version": version, "parent": head, "op": "delete",
        "files": prev["files"], "stats": prev.get("stats", {}),
        "blooms": prev.get("blooms", {}),
        "delete_vectors": {"key": key_col,
                           "files": (pdv["files"] if pdv else []) + dfiles},
    }, expected_parent=head)


def append_batch_exactly_once(batch: DataFrame, path: str,
                              epoch: int) -> int | None:
    """foreachBatch-shaped append: the microbatch epoch rides the
    manifest, so an at-least-once redelivery finds its epoch already
    committed in the manifest chain and becomes a no-op — streaming
    exactly-once ON TOP of the snapshot table, with no side channel.
    Returns the published version, or None for a skipped replay.

    Replay detection reads ONLY the head manifest's bounded
    ``recent_epochs`` set (O(1) per batch; vacuum-safe — no parent-chain
    walk). Manifests from before that field existed fall back to the
    chain walk, stopping gracefully at a vacuumed (missing) parent."""
    head = current_version(path)
    m = read_manifest(path, head)
    if "recent_epochs" in m:
        if epoch in m["recent_epochs"]:
            return None  # replayed epoch: already committed
    else:  # pre-upgrade manifest: legacy walk, tolerant of vacuumed links
        while True:
            if m.get("epoch") == epoch:
                return None
            if m.get("parent") is None:
                break
            try:
                m = read_manifest(path, m["parent"])
            except FileNotFoundError:
                break  # vacuumed past here: older epochs are done epochs
    version = head + 1
    files = _stage(batch, path, version)
    prev = read_manifest(path, head)
    return _publish(path, {"version": version, "parent": head,
                           "op": "append", "epoch": epoch,
                           "files": prev["files"] + files,
                           "stats": {**prev.get("stats", {}),
                                     **_file_stats(files)},
                           "blooms": prev.get("blooms", {}),
                           **({"delete_vectors": prev["delete_vectors"]}
                              if prev.get("delete_vectors") else {})},
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


def read_pruned(spark: SparkSession, path: str, column: str,
                lo, hi, version: int | None = None
                ) -> tuple[DataFrame, int, int]:
    """Manifest-level DATA SKIPPING: drop files whose zone map proves no
    row of ``column`` lies in [lo, hi] BEFORE Spark ever lists or opens
    them, then apply the residual filter. Returns (df, total_files,
    files_read) so callers (and tests) can see the skipping happen. At
    100 TB this is the planner-independent skipping tier: the manifest
    is driver-local metadata, so a selective predicate touches a handful
    of footers instead of the table."""
    from pyspark.sql import functions as F

    v = current_version(path) if version is None else version
    m = read_manifest(path, v)
    stats = m.get("stats", {})
    keep = []
    for f in m["files"]:
        zone = stats.get(f, {}).get(column)
        if zone is None or (zone[1] >= lo and zone[0] <= hi):
            keep.append(f)  # keep on overlap OR missing stats (safe side)
    pred = F.col(column).between(lo, hi)
    if not keep:
        return (_read_files(spark, m, m["files"]).filter(F.lit(False)),
                len(m["files"]), 0)
    df = _read_files(spark, m, keep).filter(pred)
    dv = m.get("delete_vectors")
    if dv:  # same merge-on-read semantics as read()
        dead = spark.read.parquet(*dv["files"]).select(
            F.col("k").alias(dv["key"])).distinct()
        df = df.join(F.broadcast(dead), on=dv["key"], how="left_anti")
    return df, len(m["files"]), len(keep)


def merge(spark: SparkSession, updates: DataFrame, path: str, key: str,
          max_retries: int = 3) -> int:
    """Transactional UPSERT: read the head snapshot, keep every current
    row whose key is not updated (left anti), union the updates, publish
    as an overwrite AGAINST THE SNAPSHOT VERSION — a lost race re-reads
    and retries, so concurrent mergers serialize instead of clobbering."""
    last: ConcurrentWriteError | None = None
    for _ in range(max_retries):
        head = current_version(path)
        cur = read(spark, path, head)
        merged = (cur.join(updates.select(key).distinct(), on=key,
                           how="left_anti")
                  .unionByName(updates))
        try:
            return overwrite(merged, path, expected_version=head)
        except ConcurrentWriteError as e:
            last = e
    raise last


def epoch_committed(path: str, epoch: int) -> bool:
    """True iff ``epoch`` is in the head manifest's bounded recent-epoch
    set — the O(1) exactly-once replay probe (no chain walk)."""
    m = read_manifest(path, current_version(path))
    return epoch in m.get("recent_epochs", []) or m.get("epoch") == epoch


def merge_keys(spark: SparkSession, updates: DataFrame, path: str,
               key: str, epoch: int | None = None,
               max_retries: int = 3) -> int | None:
    """File-granular COPY-ON-WRITE upsert — the Delta ``MERGE INTO``
    shape: only files that can contain an updated key are rewritten
    (survivors anti-joined, then unioned with the updates); every other
    file carries over by reference. Candidate files are chosen from the
    manifest zone maps on ``key`` against the batch's key range — after a
    key-clustered ``compact``, a batch touches ~the files its key range
    covers, so merge I/O is batch-sized against a corpus-sized table
    (``merge``, by contrast, rewrites the whole snapshot every time).

    Pending merge-on-read delete vectors are materialized into the
    rewritten files and carried for the untouched ones. ``epoch`` rides
    the manifest for exactly-once under foreachBatch replays (returns
    None for a skipped replay). Lost optimistic races retry."""
    from pyspark.sql import functions as F

    last: ConcurrentWriteError | None = None
    for _ in range(max_retries):
        head = current_version(path)
        if epoch is not None and epoch_committed(path, epoch):
            return None
        m = read_manifest(path, head)
        # fail loudly on schema drift instead of a deep unionByName error;
        # evolution goes through append_evolve, never a merge side door
        _check_append_schema(updates, m)
        stats = m.get("stats", {})
        bounds = updates.agg(
            F.min(F.col(key)).alias("lo"),
            F.max(F.col(key)).alias("hi")).first()
        lo, hi = bounds["lo"], bounds["hi"]
        touched, untouched = [], []
        for f in m["files"]:
            zone = stats.get(f, {}).get(key)
            if lo is None or zone is None or (zone[1] >= lo
                                              and zone[0] <= hi):
                touched.append(f)  # overlap or no stats: must rewrite
            else:
                untouched.append(f)
        if m.get("delete_vectors"):
            # pending deletes apply globally on read — a carried vector
            # would also hit re-upserted keys in the new files, so a merge
            # over pending deletes materializes them everywhere
            touched, untouched = list(m["files"]), []
        keys_df = updates.select(key).distinct()
        if touched:
            cur = _read_files(spark, m, touched)
            dv = m.get("delete_vectors")
            if dv:  # materialize pending deletes into the rewrite
                dead = spark.read.parquet(*dv["files"]).select(
                    F.col("k").alias(key)).distinct()
                cur = cur.join(F.broadcast(dead), on=key, how="left_anti")
            survivors = cur.join(keys_df, on=key, how="left_anti")
            out = survivors.unionByName(updates)
        else:
            out = updates
        version = head + 1
        new_files = _stage(out, path, version)
        manifest = {
            "version": version, "parent": head, "op": "merge",
            "files": untouched + new_files,
            "stats": {**{f: s for f, s in stats.items() if f in untouched},
                      **_file_stats(new_files)},
            **({"epoch": epoch} if epoch is not None else {}),
        }
        try:
            return _publish(path, manifest, expected_parent=head)
        except ConcurrentWriteError as e:
            last = e
    raise last


def compact_zorder(spark: SparkSession, path: str, col_a: str, col_b: str,
                   target_files: int = 8, bits: int = 8) -> int:
    """Z-ORDER clustered compaction: rewrite the current snapshot
    range-partitioned on the Morton interleave of TWO integer columns
    (``sources.zorder_layout.zvalue`` — pure codegen bit math), so the
    manifest zone maps become selective on BOTH dimensions at once — a
    range probe on either column prunes files, the property 1-D
    clustering gives only its sort key. Columns are rank-normalized to
    ``bits`` quantiles first (ntile), so skew in either key cannot
    collapse the curve. Same snapshot semantics as ``compact``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .zorder_layout import zvalue

    head = current_version(path)
    df = read(spark, path, head)
    buckets = 1 << bits
    na = F.ntile(buckets).over(Window.orderBy(col_a)) - 1
    nb = F.ntile(buckets).over(Window.orderBy(col_b)) - 1
    clustered = (df.withColumn("__z",
                               zvalue(na.cast("long"), nb.cast("long"),
                                      bits))
                 .repartitionByRange(target_files, "__z")
                 .sortWithinPartitions("__z")
                 .drop("__z"))
    version = head + 1
    files = _stage(clustered, path, version)
    return _publish(path, {"version": version, "parent": head,
                           "op": "compact",
                           "cluster_by": f"zorder({col_a},{col_b})",
                           "files": files, "stats": _file_stats(files)},
                    expected_parent=head)


def compact(spark: SparkSession, path: str, target_files: int = 1,
            cluster_by: str | None = None) -> int:
    """OPTIMIZE: rewrite the current snapshot into ``target_files`` files
    — optionally RANGE-CLUSTERED on a column (repartitionByRange + sort
    within partitions), which is what makes the manifest zone maps
    selective: after clustering, each file owns a disjoint key range, so
    `read_pruned` touches ~1 file per range probe instead of all of
    them. Publishes as a new version (time travel across the rewrite
    keeps working; the old layout stays until vacuum)."""
    head = current_version(path)
    df = read(spark, path, head)
    if cluster_by is not None:
        df = (df.repartitionByRange(target_files, cluster_by)
              .sortWithinPartitions(cluster_by))
    else:
        df = df.coalesce(target_files)
    version = head + 1
    files = _stage(df, path, version)
    # a compaction materializes the whole snapshot, so (like overwrite) it
    # DECLARES the schema — this is also how a legacy table gains a
    # declaration — and clears drop tombstones: the rewrite read under the
    # declared schema, so no surviving file carries a dropped column and
    # the name becomes safely reusable
    return _publish(path, {"version": version, "parent": head,
                           "op": "compact", "cluster_by": cluster_by,
                           "files": files, "stats": _file_stats(files),
                           "schema": df.schema.json(),
                           "dropped_columns": []},
                    expected_parent=head)


def table_changes(spark: SparkSession, path: str, v_from: int,
                  v_to: int) -> DataFrame:
    """CHANGE DATA FEED between two retained snapshots: every row of the
    table diff tagged ``_change = 'insert' | 'delete'`` (an update under
    merge semantics shows as delete+insert of the key's old/new rows).
    Multiset semantics via ``exceptAll`` — duplicate rows count. Because
    snapshots are immutable manifests, the feed is reproducible for as
    long as both versions are retained; downstream consumers get CDC
    without the writer ever logging changes."""
    from pyspark.sql import functions as F

    old = read(spark, path, v_from)
    new = read(spark, path, v_to)
    return (new.exceptAll(old).withColumn("_change", F.lit("insert"))
            .unionByName(
                old.exceptAll(new).withColumn("_change", F.lit("delete"))))


def refresh_aggregate(spark: SparkSession, path: str, agg_state: dict,
                      group_col: str, sum_col: str) -> dict:
    """INCREMENTAL VIEW MAINTENANCE: a materialized per-group
    (count, sum) aggregate maintained from the CDC feed instead of
    recomputed — inserts add (+1, +x), deletes subtract, groups reaching
    count 0 drop out. count/sum are self-maintainable under
    insert+delete (no rescan ever needed; min/max are NOT — they need a
    rescan on delete, which is why this maintains the algebraic pair).
    ``agg_state`` is {'version': v, 'rows': {group: [count, sum]}} — at
    100 TB the state is group-cardinality-sized and the work per refresh
    is CHANGE-sized, not table-sized."""
    from pyspark.sql import functions as F

    head = current_version(path)
    if head == agg_state["version"]:
        return agg_state
    feed = table_changes(spark, path, agg_state["version"], head)
    sign = F.when(F.col("_change") == "insert", 1).otherwise(-1)
    # group_col / sum_col accept any SQL expression (a bare column name
    # is one), so views over DERIVED dimensions and measures — e.g. the
    # /metrics live-record flag — stay self-maintainable too
    deltas = (feed.select(F.expr(group_col).alias("__g"), "_change",
                          F.expr(sum_col).alias("__s"))
              .groupBy("__g")
              .agg(F.sum(sign).alias("dn"),
                   F.sum(sign * F.col("__s")).alias("ds")).collect())
    rows = {k: list(v) for k, v in agg_state["rows"].items()}
    for r in deltas:
        key = r["__g"]
        n0, s0 = rows.get(key, (0, 0.0))
        n1, s1 = n0 + r["dn"], s0 + float(r["ds"] or 0.0)
        if n1 <= 0:
            rows.pop(key, None)
        else:
            rows[key] = [n1, s1]
    return {"version": head, "rows": rows}


def bootstrap_aggregate(spark: SparkSession, path: str, group_col: str,
                        sum_col: str) -> dict:
    """Full-scan initialization of the maintained aggregate at the
    current version (the one table-sized pass; every later refresh is
    change-sized)."""
    from pyspark.sql import functions as F

    head = current_version(path)
    rows = {r["__g"]: [r["n"], float(r["s"])]
            for r in read(spark, path, head)
            .select(F.expr(group_col).alias("__g"),
                    F.expr(sum_col).alias("__s"))
            .groupBy("__g")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("__s").alias("s")).collect()}
    return {"version": head, "rows": rows}


def _refs_path(path: str) -> str:
    return os.path.join(path, "_refs.json")


def _read_refs(path: str) -> dict:
    try:
        with open(_refs_path(path)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _write_refs(path: str, refs: dict) -> None:
    # same crash-invisibility discipline as the pointer: temp + os.replace
    tmp = _refs_path(path) + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(refs, f)
    os.replace(tmp, _refs_path(path))


def tag(path: str, name: str, version: int | None = None) -> int:
    """Pin a named ref (Iceberg-style tag) to a snapshot version — the
    'release-2026-08' handle a training run records so the exact corpus
    snapshot stays addressable after the table moves on. Tags protect
    their manifest (and its data files) from vacuum. Defaults to the
    current version; re-tagging an existing name moves it."""
    v = current_version(path) if version is None else version
    if not os.path.exists(_manifest_path(path, v)):
        raise ValueError(f"cannot tag version {v}: no such manifest")
    refs = _read_refs(path)
    refs[name] = v
    _write_refs(path, refs)
    return v


def delete_tag(path: str, name: str) -> None:
    refs = _read_refs(path)
    refs.pop(name, None)
    _write_refs(path, refs)


def list_tags(path: str) -> dict:
    """name → version, sorted by name."""
    return dict(sorted(_read_refs(path).items()))


def version_for_tag(path: str, name: str) -> int:
    refs = _read_refs(path)
    if name not in refs:
        raise ValueError(f"unknown tag {name!r}; have {sorted(refs)}")
    return refs[name]


def read_tag(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Snapshot read by named ref: ``read(..., version_for_tag(...))``."""
    return read(spark, path, version=version_for_tag(path, name))


def history(spark: SparkSession, path: str) -> DataFrame:
    """Metadata table — the ``DESCRIBE HISTORY`` twin (Delta/Iceberg
    parity): one row per retained version with its operation, commit
    time, parent, and file counts. Reads only manifests (never data), so
    cost is O(retained versions) regardless of table size."""
    rows = []
    for v in versions(path):
        m = read_manifest(path, v)
        rows.append((v, m.get("parent"), m.get("op"),
                     float(m.get("committed_at") or 0.0),
                     len(m.get("files", [])),
                     len(m.get("delete_vectors", {}).get("files", [])),
                     m.get("commit_id"),
                     m.get("epoch")))
    return spark.createDataFrame(
        rows,
        "version int, parent int, op string, committed_at double, "
        "n_files int, n_delete_files int, commit_id string, epoch long")


def files_table(spark: SparkSession, path: str,
                version: int | None = None) -> DataFrame:
    """Metadata table — the ``table.files`` twin: one row per data file
    in a snapshot, with size, recorded checksum, and the zone-map
    min/max per column (JSON) the pruners read. Manifest-only, no data
    scan."""
    v = current_version(path) if version is None else version
    m = read_manifest(path, v)
    stats, sums = m.get("stats", {}), m.get("checksums", {})
    rows = []
    for f in m["files"]:
        size = os.path.getsize(f) if os.path.exists(f) else None
        rows.append((f, size, sums.get(f), json.dumps(stats.get(f, {}))))
    return spark.createDataFrame(
        rows, "file string, bytes long, md5 string, zone_maps string")


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop manifests (and their now-unreferenced data files) older than
    the last ``keep_last`` versions. Tagged versions are always retained
    (and their files stay live). Returns the deleted file paths."""
    def all_files(m: dict) -> list[str]:
        return m["files"] + m.get("delete_vectors", {}).get("files", [])

    vs = versions(path)
    tagged = set(_read_refs(path).values())
    keep = sorted(set(vs[-keep_last:]) | (tagged & set(vs)))
    drop = [v for v in vs if v not in keep]
    live = {f for v in keep for f in all_files(read_manifest(path, v))}
    dead: list[str] = []
    for v in drop:
        for f in all_files(read_manifest(path, v)):
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
