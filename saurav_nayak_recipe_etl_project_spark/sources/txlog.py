"""Log-structured ACID table on plain parquet — the Delta/Iceberg
core re-built from first principles, because the warehouse side of
this engine needs O(delta) appends, not snapshot rewrites.

The reference reloads its warehouse with WRITE_TRUNCATE on every
refresh (bigquery_loader_function/main.py:20-40); maintenance.py's
publish_with_audit upgraded that to audited, versioned SNAPSHOTS (each
publish rewrites the table). This module is the next rung — the one
its own docstring points at ("on a table format with row-level merge
the plans are the same, only the sink changes"): a transaction LOG of
add/remove FILE actions, so

- APPEND writes only the new files + one log entry — O(delta) at any
  table size (a year of nightly drops never rewrites January);
- DELETE rewrites only the files whose min/max stats can contain
  matching rows — file-granular, stats-pruned;
- READ resolves the live file set by log replay; `version=` gives
  time travel; a simple-predicate `where=` prunes files by stats
  BEFORE Spark ever lists them (the log is the coarse index);
- COMPACT folds small files remove+add in one atomic commit, a
  no-op to every reader;
- CONCURRENT writers race on the next version file with
  O_CREAT|O_EXCL (optimistic concurrency, the Delta protocol's
  mutual-exclusion primitive); a losing read-modify-write op then
  runs LOGICAL conflict resolution (_commit_rmw, the Delta
  ConflictChecker / WriteSerializable behavior): rival blind appends
  that touched none of the files it read commute — the op re-commits
  unchanged and the rival's files stay live — while rivals that
  removed/DV'd a read file or changed table metadata surface
  TxConflict for a real re-derivation;
- STREAMING appends carry a (app_id, batch_id) txn action; a
  replayed micro-batch is detected and skipped — the idempotent-sink
  recipe every foreachBatch writer in streaming/ hand-rolls,
  provided by the table itself (Delta's txn/SetTransaction);
- VACUUM deletes data files unreferenced by the last K versions and
  records the horizon; time travel past it fails LOUDLY, not with a
  missing-file stack trace.

100 TB posture: the log is checkpointed — `tx_checkpoint` folds the
action log into a parquet snapshot published via a `_last_checkpoint`
pointer (the Delta checkpoint protocol), so reads replay O(tail)
commits instead of O(commits) JSON; data stays distributed parquet;
stats pruning means a key-ranged read opens the log, not the object
store listing. Single-filesystem O_EXCL is the commit primitive here;
on an object store it becomes put-if-absent — the swap every table
format performs.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from saurav_nayak_recipe_etl_project_spark.functions.localframe import (
    local_frame,
)

_LOG_DIR = "_txlog"
_HORIZON = "_vacuum_horizon"
_CKPT_SUFFIX = ".checkpoint.parquet"
_CKPT_PTR = "_last_checkpoint"


class TxConflict(Exception):
    """Another writer committed this version first — re-read the
    latest snapshot and retry the whole read-modify-write."""


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _json_versions(table: str) -> list[int]:
    """Versions with a raw JSON commit file still present."""
    d = _log_path(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def _checkpoint_versions(table: str) -> list[int]:
    d = _log_path(table)
    if not os.path.isdir(d):
        return []
    n = len(_CKPT_SUFFIX)
    return sorted(
        int(f[:-n]) for f in os.listdir(d)
        if f.endswith(_CKPT_SUFFIX) and f[:-n].isdigit()
    )


def _versions(table: str) -> list[int]:
    """All readable versions: JSON commits plus checkpoint-only
    versions (a cleaned log keeps the checkpointed snapshot live)."""
    return sorted(set(_json_versions(table)) | set(_checkpoint_versions(table)))


def latest_version(table: str) -> int:
    """-1 when the table has no commits yet."""
    vs = _versions(table)
    return vs[-1] if vs else -1


def _commit(table: str, version: int, actions: list[dict],
            txn: dict | None = None,
            schema: dict | None = None,
            checks: dict | None = None,
            colmap: dict | None = None,
            partition_by: list | None = None,
            retired: list | None = None) -> None:
    """Atomically create version file `version` — O_CREAT|O_EXCL is
    the mutual exclusion: exactly one writer wins a version number.
    Each commit records the table schema, CHECK constraints, and the
    logical→physical column mapping; a commit that passes none of
    them carries the prior version's forward."""
    if schema is None and version > 0:
        schema = _schema_at(table, version - 1)
    if checks is None:
        checks = _checks_at(table, version - 1) if version > 0 else {}
    if colmap is None:
        colmap = _colmap_at(table, version - 1) if version > 0 else {}
    if partition_by is None:
        partition_by = (_partition_by_at(table, version - 1)
                        if version > 0 else [])
    if retired is None:
        retired = _retired_at(table, version - 1) if version > 0 else []
    import time

    os.makedirs(_log_path(table), exist_ok=True)
    path = os.path.join(_log_path(table), f"{version:011d}.json")
    payload = json.dumps(
        {"actions": actions, "txn": txn, "schema": schema,
         "checks": checks, "colmap": colmap,
         "partition_by": partition_by, "retired": retired,
         "ts": round(time.time(), 6)}) + "\n"
    # publish the FULL payload atomically: write a private temp file,
    # then hard-link it to the version name (link fails if the name is
    # taken — same mutual exclusion as O_EXCL, but no window where a
    # reader or a crash can observe a half-written/empty version file)
    tmp = path + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise TxConflict(
            f"version {version} of {table} was committed by another "
            "writer; re-read the latest snapshot and retry"
        ) from None
    finally:
        os.unlink(tmp)


def _read_json_commit(table: str, v: int) -> dict:
    with open(os.path.join(_log_path(table), f"{v:011d}.json")) as f:
        return json.loads(f.read())


def _load_checkpoint(
        table: str, v: int
) -> tuple[dict, dict | None, dict, dict, dict, list, list]:
    """(live files, schema, txn high-water marks, check constraints,
    column mapping, partition columns, retired physical names) from
    the parquet checkpoint at version v."""
    import pyarrow.parquet as pq

    path = os.path.join(_log_path(table), f"{v:011d}{_CKPT_SUFFIX}")
    t = pq.read_table(path)
    live = {
        f: json.loads(s) for f, s in
        zip(t.column("file").to_pylist(), t.column("stats_json").to_pylist())
    }
    meta = t.schema.metadata or {}
    schema = (json.loads(meta[b"schema_json"].decode())
              if b"schema_json" in meta else None)
    txns = (json.loads(meta[b"txns_json"].decode())
            if b"txns_json" in meta else {})
    checks = (json.loads(meta[b"checks_json"].decode())
              if b"checks_json" in meta else {})
    colmap = (json.loads(meta[b"colmap_json"].decode())
              if b"colmap_json" in meta else {})
    partition_by = (json.loads(meta[b"partition_by_json"].decode())
                    if b"partition_by_json" in meta else [])
    retired = (json.loads(meta[b"retired_json"].decode())
               if b"retired_json" in meta else [])
    return live, schema, txns, checks, colmap, partition_by, retired


def _best_checkpoint(table: str, version: int) -> int:
    """The newest checkpoint at or below `version`, -1 if none. The
    `_last_checkpoint` pointer is consulted FIRST (one file read — on
    an object store this is the whole point of the Delta pointer
    protocol: no log-directory listing on the happy path); the
    directory listing is only the fallback for reads BELOW the
    pointer (older-checkpoint time travel) or a missing/racing
    pointer."""
    ptr = last_checkpoint_version(table)
    if ptr is not None and ptr <= version:
        return ptr
    return max((c for c in _checkpoint_versions(table) if c <= version),
               default=-1)


def _resolve_snapshot(table: str,
                      version: int | None = None) -> tuple[dict, int, int]:
    """Replay to `version` through the best checkpoint at or below it:
    (live files, json commits replayed, checkpoint version used or -1).
    The replay cost is O(tail-past-checkpoint), not O(commits) — the
    Delta `_last_checkpoint` read path. Versions are dense by
    construction (every commit is latest+1), so a missing tail file
    means the log was cleaned past its checkpoint — loud error."""
    vs = _versions(table)
    if not vs:
        raise ValueError(f"{table} has no transaction log")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(f"version {version} does not exist "
                         f"(have {vs[0]}..{vs[-1]}; commits below a "
                         "checkpoint may have been cleaned)")
    horizon = vacuum_horizon(table)
    if version < horizon:
        raise ValueError(
            f"version {version} of {table} was vacuumed (horizon "
            f"{horizon}) — its data files no longer exist")
    base = _best_checkpoint(table, version)
    tail = [v for v in _json_versions(table) if base < v <= version]
    expected = list(range(base + 1, version + 1))
    if tail != expected:
        # The pointer's tail is broken — almost always a REGRESSED
        # _last_checkpoint (the pointer write is a plain replace, so
        # two checkpointers interleaving read-then-write can still
        # move it backwards past the monotonic guard) whose commits a
        # clean already folded. Before declaring the table unreadable,
        # fall back to the DIRECTORY listing: checkpoint parquet files
        # are never cleaned, so a newer listed checkpoint <= version
        # repairs the replay (the rare failure path pays the listing;
        # the happy path stays one pointer read).
        listed = max((c for c in _checkpoint_versions(table)
                      if c <= version), default=-1)
        if listed > base:
            base = listed
            tail = [v for v in _json_versions(table)
                    if base < v <= version]
            expected = list(range(base + 1, version + 1))
    if tail != expected:
        raise ValueError(
            f"{table} log is missing commits {sorted(set(expected) - set(tail))} "
            f"between checkpoint {base} and version {version} — cannot replay")
    live: dict = {}
    if base >= 0:
        live = _load_checkpoint(table, base)[0]
    for v in tail:
        for a in _read_json_commit(table, v)["actions"]:
            if a["op"] == "add":
                live[a["file"]] = a.get("stats") or {}
            elif a["op"] == "remove":
                live.pop(a["file"], None)
            elif a["op"] == "dv":
                # deletion vector: the file stays live, its stats grow
                # a _dvs list (which rides through checkpoints inside
                # stats_json untouched); later DVs on the same file
                # ACCUMULATE. A dv on a non-live file is log
                # corruption — loud.
                if a["file"] not in live:
                    raise ValueError(
                        f"{table} commit {v}: deletion vector targets "
                        f"non-live file {a['file']} — corrupt log")
                st = dict(live[a["file"]])
                st["_dvs"] = list(st.get("_dvs", [])) + [a["dv"]]
                live[a["file"]] = st
    return live, len(tail), base


def snapshot_files(table: str, version: int | None = None) -> dict:
    """Replay the log: {relative file path: stats dict} live at
    `version` (latest when None). Resolves through the latest
    checkpoint at or below `version` when one exists."""
    return _resolve_snapshot(table, version)[0]


def vacuum_horizon(table: str) -> int:
    p = os.path.join(_log_path(table), _HORIZON)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def _schema_fields(df: DataFrame) -> dict:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


# Sanctioned LOSSLESS type widenings (the Delta/Iceberg evolution
# set this engine supports): exactly the promotions Spark 4.1's
# parquet readers up-cast in place when handed the wider requested
# schema (verified: int32 files read as bigint, float as double).
_WIDENINGS = {
    ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
    ("float", "double"),
}


def _merged_schema(prior: dict, now: dict) -> dict:
    """The schema a commit should record: prior columns keep the
    WIDER of the two types (a narrow source never regresses the
    table; a widening source promotes it — with the evolution flag,
    enforced by _check_schema), new columns append after."""
    out = {}
    for c, t in prior.items():
        nt = now.get(c)
        out[c] = nt if (nt is not None and (t, nt) in _WIDENINGS) else t
    for c, t in now.items():
        if c not in out:
            out[c] = t
    return out


def _schema_ddl(schema: dict) -> str:
    return ", ".join(f"`{c}` {t}" for c, t in schema.items())


# relative data-file path at the end of an absolute/URI path:
# data/<txdir>/(<hive col=value dirs>/)*<file> — the optional middle
# segments carry partition values; requiring the `=` keeps the match
# anchored to the real layout even if the table's own path contains a
# "data/" segment
_REL_FILE_RE = r"(data/[^/]+(?:/[^/]+=[^/]+)*/[^/]+)$"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _rel_file_expr() -> F.Column:
    """The scanned row's ON-DISK relative data-file path, from
    `_metadata.file_path`. The metadata column is a URI, so
    hive-escaped partition dir names arrive re-encoded (s=x%3Ay →
    s=x%253Ay) — decode the URI layer ONCE so the value matches the
    log's file keys (which keep the hive escaping). The '+' pre-escape
    guards url_decode's form-semantics ('+' is never URI-encoded)."""
    enc = F.regexp_extract(F.col("_metadata.file_path"),
                           _REL_FILE_RE, 1)
    return F.url_decode(F.regexp_replace(enc, r"\+", "%2B"))


def _attach_partition_cols(df: DataFrame, pby: list,
                           phys_types: dict) -> DataFrame:
    """Derive hive partition columns from `_metadata.file_path`
    (`.../col=value/...`), url-decoded, NULL for the hive default
    marker, cast to the committed type. Runs entirely JVM-side in the
    scan's projection — no per-file reads, no discovery pass."""
    import re as _re

    def _decode(col):
        # url_decode treats '+' as a space (application/x-www-form
        # semantics) but neither URI nor hive path escaping ENCODES
        # '+', so pre-escape it — only genuine %XX sequences decode
        return F.url_decode(F.regexp_replace(col, r"\+", "%2B"))

    for p in pby:
        enc = F.regexp_extract(
            F.col("_metadata.file_path"),
            "/" + _re.escape(p) + "=([^/]+)/", 1)
        # TWO decode layers: _metadata.file_path is a URI (the
        # hive-escaped dir name s=x%3Ay arrives as s=x%253Ay), so
        # decode the URI encoding first, then the hive escaping
        raw = _decode(_decode(enc))
        df = df.withColumn(
            p,
            F.when(raw == _HIVE_NULL, F.lit(None))
            .otherwise(raw).cast(phys_types.get(p, "string")))
    return df


def _read_files(spark: SparkSession, table: str, files: list[str],
                version: int | None = None,
                live: dict | None = None) -> DataFrame:
    """Read data files under the COMMITTED schema at `version` (latest
    when None): files that predate an additive evolution NULL-backfill
    the new columns, and narrow-generation files up-cast in place
    (int→bigint, float→double) — the type-widening read contract a
    mergeSchema inference cannot provide (it refuses to merge int and
    bigint footers). Falls back to mergeSchema for a log that predates
    schema recording.

    `live` (the snapshot's {file: stats}) additionally applies any
    DELETION VECTORS the stats carry: rows named by (file, position)
    in the snapshot's DV parquet are anti-joined out via the parquet
    reader's `_metadata.row_index` — merge-on-read delete, no file
    rewrite. Callers reading snapshot state MUST pass live or DV'd
    rows silently resurrect.

    Column mapping: the files store PHYSICAL names (stable across
    renames); the scan is pinned to the physical schema and the frame
    is renamed to the LOGICAL names of `version` at the end — a
    rename-then-read sees old files under the new name with zero
    rewrites."""
    v = latest_version(table) if version is None else version
    schema = _schema_at(table, v)
    colmap = _colmap_at(table, v)
    pby = _partition_by_at(table, v)
    if schema:
        phys = {_phys(colmap, c): t for c, t in schema.items()}
        # partition columns live in the DIRECTORY names, not the files
        file_phys = {p: t for p, t in phys.items() if p not in pby}
        reader = spark.read.schema(_schema_ddl(file_phys))
    else:
        phys = {}
        reader = spark.read.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(table, f) for f in files])
    if pby and schema:
        # re-materialize hive partition values from the scanned path —
        # one scan over any number of tx dirs (Spark's own partition
        # discovery refuses multiple roots), values typed by the
        # committed schema, NULLs via the hive default marker
        df = _attach_partition_cols(df, pby, phys)
        df = df.select(*phys)  # committed column order
    ren = {p: c for c, p in colmap.items() if p != c}
    if ren:
        df = df.withColumnsRenamed(ren)
    if live:
        dv_dirs = sorted({d for f in files
                          for d in (live.get(f) or {}).get("_dvs", [])})
        if dv_dirs:
            dv = spark.read.schema("file string, pos long").parquet(
                *[os.path.join(table, d) for d in dv_dirs])
            df = (
                df.withColumn("__dv_f", _rel_file_expr())
                .withColumn("__dv_p", F.col("_metadata.row_index"))
                .join(dv,
                      (F.col("__dv_f") == dv["file"])
                      & (F.col("__dv_p") == dv["pos"]),
                      "left_anti")
                .drop("__dv_f", "__dv_p")
            )
    return df


def _schema_at(table: str, version: int) -> dict | None:
    """The committed table schema at `version` — from the JSON commit
    when present, else from the checkpoint that replaced it."""
    if version < 0:
        return None
    if version in _json_versions(table):
        return _read_json_commit(table, version).get("schema")
    if version in _checkpoint_versions(table):
        return _load_checkpoint(table, version)[1]
    return None


def _checks_at(table: str, version: int) -> dict:
    """The CHECK constraints in force at `version` — {name: [col, op,
    literal]} from the JSON commit when present, else from the
    checkpoint that replaced it."""
    if version < 0:
        return {}
    if version in _json_versions(table):
        return _read_json_commit(table, version).get("checks") or {}
    if version in _checkpoint_versions(table):
        return _load_checkpoint(table, version)[3]
    return {}


def table_checks(table: str) -> dict:
    """The currently-enforced CHECK constraints."""
    return _checks_at(table, latest_version(table))


def _colmap_at(table: str, version: int) -> dict:
    """The logical→physical column mapping at `version` (the
    Delta/Iceberg column-mapping idea: a RENAME changes only the
    LOGICAL name; data files keep writing the stable PHYSICAL name —
    the name the column was created under — so zero files are
    rewritten and old files read under the new name). Empty dict =
    identity (tables that never renamed pay nothing)."""
    if version < 0:
        return {}
    if version in _json_versions(table):
        return _read_json_commit(table, version).get("colmap") or {}
    if version in _checkpoint_versions(table):
        return _load_checkpoint(table, version)[4]
    return {}


def table_colmap(table: str) -> dict:
    """The current logical→physical column mapping (empty = identity)."""
    return _colmap_at(table, latest_version(table))


def _partition_by_at(table: str, version: int) -> list:
    """The table's PHYSICAL partition columns at `version` (fixed at
    table creation — the Delta/Iceberg partition-spec contract this
    engine supports; empty = unpartitioned). At 100 TB this is the
    FIRST prune: hive-style `col=value` directories whose values ride
    in every add-action's stats (`_part`), matched before any min/max
    stats are consulted."""
    if version < 0:
        return []
    if version in _json_versions(table):
        return _read_json_commit(table, version).get("partition_by") or []
    if version in _checkpoint_versions(table):
        return _load_checkpoint(table, version)[5]
    return []


def table_partition_by(table: str) -> list:
    """The table's physical partition columns (empty = unpartitioned)."""
    return _partition_by_at(table, latest_version(table))


def _retired_at(table: str, version: int) -> list:
    """PHYSICAL column names retired by tx_drop_column as of
    `version` — monotonically growing: a retired physical name still
    has bytes in old data files, so no later column may ever map to
    it (the field-id guarantee, done with names)."""
    if version < 0:
        return []
    if version in _json_versions(table):
        return _read_json_commit(table, version).get("retired") or []
    if version in _checkpoint_versions(table):
        return _load_checkpoint(table, version)[6]
    return []


_PYOPS = {
    "=": lambda a, b: a == b,
    "<=": lambda a, b: a <= b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    ">": lambda a, b: a > b,
}


def _part_prunes(stats: dict, pcol: str, op: str, value) -> bool:
    """True when the file's recorded partition VALUE proves it cannot
    match `pcol op value` — the directory-level prune, consulted
    BEFORE min/max stats (and valid even when the writer recorded no
    stats columns)."""
    part = stats.get("_part") or {}
    if pcol not in part or part[pcol] is None:
        return False
    try:
        return not _PYOPS[op](part[pcol], value)
    except TypeError:
        return False  # incomparable types: never skip blindly


def _phys(colmap: dict, col: str) -> str:
    """Physical name of logical column `col` (identity when unmapped).
    File stats are keyed by PHYSICAL names (stable across renames), so
    every stats-prune translates its predicate column through this."""
    return colmap.get(col, col)


def _to_physical(df: DataFrame, colmap: dict) -> DataFrame:
    """Rename a logical-named DataFrame to physical names for writing
    (no-op without renames)."""
    ren = {c: p for c, p in colmap.items()
           if p != c and c in df.columns}
    return df.withColumnsRenamed(ren) if ren else df


def _validate_checks(df: DataFrame, checks: dict, table: str) -> None:
    """SQL-standard CHECK semantics: a row passes when the predicate
    is TRUE or UNKNOWN (NULL); it is a violation only when FALSE. One
    pass counts every constraint's violations; any violation raises
    with the per-constraint counts — the write is rejected whole (the
    Delta ADD CONSTRAINT write contract)."""
    if not checks:
        return
    aggs = []
    for name, (col, op, value) in sorted(checks.items()):
        pred = _OPS[op](F.col(col), F.lit(value))
        aggs.append(
            F.sum(F.when(pred.eqNullSafe(F.lit(False)), 1).otherwise(0))
            .alias(name))
    row = df.agg(*aggs).first()
    bad = {n: int(row[n] or 0) for n in sorted(checks) if row[n]}
    if bad:
        raise ValueError(
            f"tx CHECK constraint violation for {table}: {bad} rows "
            f"fail {sorted(bad)} — the write is rejected whole "
            "(drop the constraint deliberately or fix the data)")


_CHECK_NAME_RE = r"^[A-Za-z_][A-Za-z0-9_]{0,127}$"


def tx_set_check(spark: SparkSession, table: str, name: str,
                 constraint: tuple) -> int:
    """ALTER TABLE ADD CONSTRAINT ... CHECK (the Delta write
    contract): records `constraint` = (col, op, literal) in the log —
    every subsequent append/merge validates its rows and is rejected
    whole on any violation. EXISTING data is validated first (a
    constraint the current table violates raises instead of being
    recorded — Delta semantics). One metadata-only commit; constraints
    ride through checkpoints and survive log cleaning.

    Constraint names are plain identifiers (letter/underscore then
    word characters, <=128 chars): the name is used verbatim as an
    aggregation alias and Row field key in _validate_checks, so a
    name with dots/backticks/spaces would break or mis-resolve every
    subsequent write's validation (ADVICE r13) — rejected here, at
    record time, not at the 400th append.

    RESTORE note: tx_restore reinstates a historical snapshot; by
    default (no session passed) it does NOT re-validate constraints
    added after that snapshot — the Delta RESTORE semantics. Pass
    tx_restore(..., spark=...) to validate the restored rows against
    the constraints currently in force."""
    import re

    if not re.match(_CHECK_NAME_RE, name):
        raise ValueError(
            f"tx CHECK constraint name {name!r} is not a plain "
            "identifier ([A-Za-z_][A-Za-z0-9_]*, <=128 chars) — the "
            "name doubles as an aggregation alias in validation")
    base = latest_version(table)
    if base < 0:
        raise ValueError(f"{table} has no commits — append first")
    checks = dict(_checks_at(table, base))
    _validate_checks(read_table(spark, table), {name: constraint}, table)
    checks[name] = list(constraint)
    _commit(table, base + 1, [], checks=checks)
    return base + 1


def tx_drop_check(table: str, name: str) -> int:
    """ALTER TABLE DROP CONSTRAINT: one metadata-only commit."""
    base = latest_version(table)
    checks = dict(_checks_at(table, base))
    if name not in checks:
        raise ValueError(f"{table} has no CHECK constraint {name!r} "
                         f"(have {sorted(checks)})")
    del checks[name]
    _commit(table, base + 1, [], checks=checks)
    return base + 1


def tx_rename_column(table: str, old: str, new: str) -> int:
    """ALTER TABLE RENAME COLUMN via column mapping (the Delta
    `columnMapping.mode=name` / Iceberg field-id idea, r13 verdict
    item 3): ONE metadata-only commit changes the LOGICAL name; the
    PHYSICAL name (the name the column was created under) stays on
    disk forever, so ZERO data files are rewritten — old files read
    under the new name through the mapping, new appends write the
    physical name, stats stay keyed by it, and time travel to a
    pre-rename version reads the old name (the contract as of that
    version). CHECK constraints referencing the column are rewritten
    to the new name in the same commit.

    Renaming BACK to the physical name drops the mapping entry
    (identity restored). Renaming TO a name that is another column's
    physical name is rejected — the physical namespace must stay
    unambiguous (the same rule _check_schema enforces for added
    columns)."""
    base = latest_version(table)
    if base < 0:
        raise ValueError(f"{table} has no commits — append first")
    schema = _schema_at(table, base)
    if not schema:
        raise ValueError(f"{table} records no schema — cannot rename")
    if old not in schema:
        raise ValueError(f"{table} has no column {old!r} "
                         f"(have {sorted(schema)})")
    if new in schema:
        raise ValueError(f"{table} already has a column {new!r}")
    if not new or "`" in new:
        raise ValueError(f"invalid column name {new!r}")
    colmap = dict(_colmap_at(table, base))
    phys_old = colmap.pop(old, old)
    for c in schema:
        if c != old and _phys(colmap, c) == new:
            raise ValueError(
                f"cannot rename {old!r} to {new!r}: {new!r} is column "
                f"{c!r}'s physical name — pick an unshadowed name")
    if phys_old != new:
        colmap[new] = phys_old
    new_schema = {(new if c == old else c): t for c, t in schema.items()}
    checks = {
        n: [new if spec[0] == old else spec[0], spec[1], spec[2]]
        for n, spec in _checks_at(table, base).items()
    }
    _commit(table, base + 1, [], schema=new_schema, checks=checks,
            colmap=colmap)
    return base + 1


def tx_drop_column(table: str, col: str) -> int:
    """ALTER TABLE DROP COLUMN via column mapping (the second half of
    the Delta/Iceberg rename/drop mapping, r14): ONE metadata-only
    commit removes the LOGICAL column — zero data files rewritten
    (the bytes stay in place; readers simply stop requesting the
    column), time travel to a pre-drop version still reads it, and
    the physical name is RETIRED forever: a later re-add of the same
    logical name (tx_append with evolution) gets a FRESH physical
    name, so old data can never resurrect through it — the field-id
    guarantee, done with names. Rejected for partition columns (the
    directory layout depends on them — Delta's rule) and for columns
    a CHECK constraint references (drop the constraint deliberately
    first); dropping the last column is meaningless."""
    base = latest_version(table)
    if base < 0:
        raise ValueError(f"{table} has no commits")
    schema = _schema_at(table, base)
    if not schema:
        raise ValueError(f"{table} records no schema — cannot drop")
    if col not in schema:
        raise ValueError(f"{table} has no column {col!r} "
                         f"(have {sorted(schema)})")
    if len(schema) == 1:
        raise ValueError(
            f"cannot drop {col!r}: it is the last column of {table}")
    colmap = dict(_colmap_at(table, base))
    phys = colmap.pop(col, col)
    if phys in _partition_by_at(table, base):
        raise ValueError(
            f"cannot drop {col!r}: it is a partition column of "
            f"{table} (the directory layout depends on it)")
    refs = sorted(n for n, spec in _checks_at(table, base).items()
                  if spec[0] == col)
    if refs:
        raise ValueError(
            f"cannot drop {col!r}: CHECK constraints {refs} reference "
            "it — tx_drop_check them deliberately first")
    new_schema = {c: t for c, t in schema.items() if c != col}
    retired = list(_retired_at(table, base))
    if phys not in retired:
        retired.append(phys)
    _commit(table, base + 1, [], schema=new_schema, colmap=colmap,
            retired=retired)
    return base + 1


def check_audit(spark: SparkSession, table: str) -> DataFrame:
    """Constraints-audit readout (r13 verdict item 7): per CHECK
    constraint currently in force, the pass / violate / unknown row
    counts over the CURRENT data — the observable surface of the A20
    write-rejection contract (write rejection itself is not
    one-SQL-observable; this is). ONE aggregation pass computes every
    constraint's counts; SQL-standard three-valued semantics surface
    explicitly: `n_unknown` counts rows where the predicate is NULL
    (those rows PASS the write contract), so
    n_pass + n_violate + n_unknown == n_rows. Enforced invariant: a
    committed table always audits n_violate = 0 — a nonzero count here
    means someone mutated data files out-of-band. Version resolved
    ONCE: the audited rows and the constraint set come from the same
    snapshot (the read_table single-resolution rule)."""
    v = latest_version(table)
    checks = _checks_at(table, v)
    if not checks:
        return spark.createDataFrame(
            [],
            "constraint_name string, col string, op string, "
            "value_str string, n_rows long, n_pass long, "
            "n_violate long, n_unknown long")
    df = read_table(spark, table, version=v)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, (col, op, value) in sorted(checks.items()):
        pred = _OPS[op](F.col(col), F.lit(value))
        aggs.append(
            F.sum(F.when(pred.eqNullSafe(F.lit(False)), 1).otherwise(0))
            .alias(f"_viol_{name}"))
        aggs.append(
            F.sum(F.when(pred.isNull(), 1).otherwise(0))
            .alias(f"_unk_{name}"))
    row = df.agg(*aggs).first()
    n = int(row["_n"])
    out = []
    for name, (col, op, value) in sorted(checks.items()):
        viol = int(row[f"_viol_{name}"] or 0)
        unk = int(row[f"_unk_{name}"] or 0)
        out.append((name, col, op, str(value), n, n - viol - unk,
                    viol, unk))
    return local_frame(
        spark, out,
        "constraint_name string, col string, op string, "
        "value_str string, n_rows long, n_pass long, "
        "n_violate long, n_unknown long")


def _check_schema(df: DataFrame, table: str, evolve: bool,
                  at_version: int | None = None,
                  allow_readd: bool = False) -> dict | None:
    """Schema enforcement (the Delta contract): an append whose
    columns drift from the table raises unless `evolve=True`.
    Evolution is additive columns plus sanctioned LOSSLESS widenings
    (int→bigint, float→double — the Delta/Iceberg type-widening set);
    any other type change or a dropped column is always an error
    (silent narrowing corrupts every reader downstream; rewrite the
    table deliberately instead). A source NARROWER than the table is
    accepted without the flag: the committed schema stays the wide
    one and reads up-cast the narrow files in place — no contract
    change happened. `at_version` pins the check to a captured base
    version so callers can make check-then-commit atomic (a rival
    commit in between bumps the version and the commit raises
    TxConflict). Returns the prior schema it checked against (None
    for a fresh table) so callers reuse it instead of re-reading the
    commit file."""
    v = latest_version(table) if at_version is None else at_version
    if v < 0:
        return None
    prior = _schema_at(table, v)
    if prior is None:
        return None
    now = _schema_fields(df)
    changed = {c: (prior[c], now[c]) for c in prior
               if c in now and now[c] != prior[c]}
    widened = {c: t for c, t in changed.items() if t in _WIDENINGS}
    illegal = {c: t for c, t in changed.items()
               if t not in _WIDENINGS and (t[1], t[0]) not in _WIDENINGS}
    dropped = [c for c in prior if c not in now]
    added = [c for c in now if c not in prior]
    if illegal or dropped:
        raise ValueError(
            f"tx schema change rejected for {table}: "
            f"type changes {illegal}, dropped columns {dropped} — "
            "evolution is additive columns and lossless widening "
            "(int->bigint, float->double) only; rewrite the table to "
            "restructure it (renames: tx_rename_column)")
    if added:
        # an added column may not shadow a renamed column's PHYSICAL
        # name — its files would collide with the mapped column's
        # storage namespace
        renamed = {p for c, p in _colmap_at(table, v).items() if p != c}
        shadow = [c for c in added if c in renamed]
        if shadow:
            raise ValueError(
                f"tx schema evolution rejected for {table}: new "
                f"columns {shadow} shadow a renamed column's physical "
                "name — pick different names")
        # nor may it reuse a DROPPED column's physical name: the old
        # files still hold that column's bytes, which would silently
        # resurrect. tx_append re-adds safely (fresh physical name,
        # allow_readd); other writers route there.
        if not allow_readd:
            reused = [c for c in added if c in _retired_at(table, v)]
            if reused:
                raise ValueError(
                    f"tx schema evolution rejected for {table}: "
                    f"columns {reused} reuse a retired (dropped) "
                    "column's physical name — re-add via tx_append "
                    "(which assigns a fresh physical name) or pick "
                    "different names")
    if (added or widened) and not evolve:
        raise ValueError(
            f"tx schema drift for {table}: new columns {added}, "
            f"widened types {widened} — pass "
            "allow_schema_evolution=True to apply them deliberately")
    return prior


def _footer_file_stats(path: str, cols: list[str]) -> dict | None:
    """min/max stats for `cols` from one parquet file's footer, or None
    when any chunk lacks usable statistics (caller falls back). Chunks
    are matched by EXACT path_in_schema — ADVICE r14: matching by LEAF
    name let a nested struct field named like a stat column alias the
    wrong chunk; any absent/ambiguous path disqualifies the file. A
    file with zero rows returns {} (caller skips it, mirroring the
    read-back aggregate, which emits no group for an empty part
    file)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if md.num_rows == 0:
        return {}
    stats = {"rows": md.num_rows, "bytes": os.path.getsize(path)}
    if not cols:
        return stats
    paths = [md.row_group(0).column(i).path_in_schema
             for i in range(md.num_columns)]
    for c in cols:
        if paths.count(c) != 1:
            return None  # absent or ambiguous leaf path: fall back
        idx = paths.index(c)
        mn = mx = None
        for rg in range(md.num_row_groups):
            cc = md.row_group(rg).column(idx)
            st = cc.statistics
            rg_rows = md.row_group(rg).num_rows
            if st is None or (not st.has_min_max
                              and not (st.has_null_count
                                       and st.null_count == rg_rows)):
                return None  # rows present but no stats: fall back
            if st.has_min_max:
                v_mn, v_mx = st.min, st.max
                mn = v_mn if mn is None else min(mn, v_mn)
                mx = v_mx if mx is None else max(mx, v_mx)
        stats[c] = [mn, mx]
    return stats


def _classify_part_value(raw: str) -> tuple:
    """Classify one hive partition dir value (already unescaped):
    ("null", None) for the hive NULL marker, ("int", i) for a
    CANONICAL integer rendering, ("str", raw) for a value no Spark
    partition-type inference rule would re-type, ("amb", None) for
    anything inference could plausibly parse as a number, date or
    timestamp (non-canonical ints, float/decimal/scientific notation,
    ISO-date prefixes) — those force the read-back fallback so Spark
    itself does the typing."""
    import re as _re

    if raw == _HIVE_NULL:
        return "null", None
    try:
        i = int(raw)
        return ("int", i) if str(i) == raw else ("amb", None)
    except ValueError:
        pass
    try:
        float(raw)
        return "amb", None
    except ValueError:
        pass
    if _re.match(r"^\d{4}-\d{2}-\d{2}", raw):
        return "amb", None
    return "str", raw


def _type_part_column(raw_values: list) -> dict | None:
    """COLUMN-WIDE partition typing, replicating Spark's inference
    rule (the read-back lane's source of truth): Spark types the whole
    column, not each value — all canonical ints ⇒ int; any plain
    string in the mix ⇒ EVERY value reads back as its raw string; any
    ambiguous value ⇒ None (no fast path). Returns {raw -> typed} or
    None."""
    kinds = {}
    for raw in raw_values:
        kinds[raw] = _classify_part_value(raw)
        if kinds[raw][0] == "amb":
            return None
    non_null = {k for k, (kind, _v) in kinds.items() if kind != "null"}
    all_int = all(kinds[k][0] == "int" for k in non_null)
    out = {}
    for raw, (kind, val) in kinds.items():
        if kind == "null":
            out[raw] = None
        elif all_int:
            out[raw] = val
        else:
            out[raw] = raw  # column is string-typed: raw rendering
    return out


def _footer_stats_actions(dest: str, sub: str, cols: list[str],
                          partition_by: list | None = None
                          ) -> list[dict] | None:
    """Per-file add-action stats from the parquet FOOTERS of the files
    just written — the production table-format idiom (Delta/Iceberg
    take write stats from the writer, never from a second read), and
    one whole Spark job less per commit than the read-back aggregate.
    Driver-side metadata reads, O(touched files) like the commit
    itself. Returns None when any stat column is non-numeric or any
    footer lacks usable statistics (the caller then falls back to the
    read-back aggregate, which is always correct):

    - only integer/float/boolean columns qualify — parquet writers may
      TRUNCATE binary (string) min/max, which would record a prefix as
      the min and corrupt stats pruning;
    - a chunk with rows but no min/max (e.g. a double chunk holding
      NaN — writers drop stats rather than mis-order NaN) disqualifies
      the file: Spark's MAX treats NaN as the largest double, footer
      stats ignore it, and recording the smaller max could let a
      reader prune a file that matches. The fallback reproduces the
      old numbers exactly in every such case.

    `partition_by` (r15, VERDICT item 4): hive-partitioned writes
    qualify too — dir names are unescaped driver-side (unquote — the
    same %XX layer F.url_decode removes on the read side), values
    typed by the column-wide inference replica (_type_part_column;
    anything Spark could type differently falls back), partition
    columns get the read-back lane's [v, v] stats and `_part` entry.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    partition_by = partition_by or []
    if partition_by:
        files = sorted(_glob.glob(os.path.join(
            dest, *(["*=*"] * len(partition_by)), "*.parquet")))
    else:
        files = sorted(_glob.glob(os.path.join(dest, "*.parquet")))
    if not files:
        return []
    file_cols = [c for c in cols if c not in partition_by]
    schema = pq.read_schema(files[0])
    import pyarrow as pa

    for c in file_cols:
        if c not in schema.names:
            return None
        t = schema.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_boolean(t)):
            return None
    # decode + column-type the partition values across ALL files first
    # (Spark's inference is column-wide, so per-file typing would drift
    # from the read-back lane on mixed values)
    from urllib.parse import unquote

    raw_parts: dict[str, list] = {}  # path -> [raw value per pcol]
    if partition_by:
        per_col: list[list] = [[] for _ in partition_by]
        for path in files:
            comps = os.path.relpath(os.path.dirname(path),
                                    dest).split(os.sep)
            if len(comps) != len(partition_by):
                return None
            raws = []
            for j, (p, comp) in enumerate(zip(partition_by, comps)):
                if not comp.startswith(f"{p}="):
                    return None
                raw = unquote(comp[len(p) + 1:])
                raws.append(raw)
                per_col[j].append(raw)
            raw_parts[path] = raws
        typed = [_type_part_column(v) for v in per_col]
        if any(t is None for t in typed):
            return None
    actions = []
    for path in files:
        stats = _footer_file_stats(path, file_cols)
        if stats is None:
            return None
        if not stats:
            continue  # empty part file: no add action (as before)
        if partition_by:
            part_vals = {p: typed[j][raw_parts[path][j]]
                         for j, p in enumerate(partition_by)}
            for p in partition_by:
                stats[p] = [part_vals[p], part_vals[p]]
            stats["_part"] = part_vals
        rel = os.path.join(sub, os.path.relpath(path, dest))
        actions.append({"op": "add", "file": rel, "stats": stats})
    return actions


def _dv_file_list(dest: str) -> list[str]:
    """Distinct data-file paths named by the DV parquet just written,
    read driver-side from the 'file' column ONLY (dictionary-encoded
    strings — metadata-scale bytes even for billions of positions),
    replacing the whole Spark read-back job each DV commit used to run
    (r15, guide §1.2: don't re-launch a job to learn what you just
    wrote). Reads the actual written bytes, so the answer is identical
    to the old `back.select("file").distinct().collect()`."""
    import glob as _glob

    import pyarrow.parquet as pq

    out: set[str] = set()
    for p in _glob.glob(os.path.join(dest, "*.parquet")):
        t = pq.read_table(p, columns=["file"])
        out.update(t.column("file").unique().to_pylist())
    return sorted(out)


def _write_files(df: DataFrame, table: str,
                 stats_cols: list[str] | None,
                 partition_by: list | None = None) -> list[dict]:
    """Write the dataframe as new data files under data/tx-<uuid>/ and
    return their add-actions with per-file min/max stats. Stats come
    from the parquet FOOTERS when every stat column is numeric (the
    production-format idiom — zero extra Spark jobs; see
    _footer_stats_actions); otherwise from one read of the delta
    grouped by input_file_name (same numbers). All column names here
    are PHYSICAL (callers translate through the colmap).

    `partition_by` writes hive-style `col=value` directories under the
    tx dir (one file never spans partitions); partition values are
    recorded TYPED in each add-action's stats under `_part` (the
    directory-level prune input) and the partition columns get [v, v]
    min/max stats for free. Stat and partition columns must be
    JSON-primitive types (string/int/float/bool)."""
    spark = df.sparkSession
    sub = os.path.join("data", f"tx-{uuid.uuid4().hex[:12]}")
    dest = os.path.join(table, sub)
    if partition_by:
        df.write.partitionBy(*partition_by).parquet(dest)
        # an EMPTY partitioned write emits no part files at all (plain
        # writes emit one schema-carrying empty file) — no add actions
        if not any(fn.endswith(".parquet")
                   for _root, _dirs, fns in os.walk(dest) for fn in fns):
            return []
        # footer fast path (r15: partitioned too — hive dir values are
        # decoded driver-side; any value Spark's column-wide partition
        # inference could type differently falls back to the read-back
        # lane below, which stays the source of truth)
        actions = _footer_stats_actions(dest, sub, list(stats_cols or []),
                                        partition_by)
        if actions is not None:
            return actions
        # basePath re-materializes the partition columns for the stats
        back = spark.read.option("basePath", dest).parquet(dest)
    else:
        df.write.parquet(dest)
        actions = _footer_stats_actions(dest, sub, list(stats_cols or []))
        if actions is not None:
            return actions
        back = spark.read.parquet(dest)
    cols = list(stats_cols or [])
    cols += [p for p in partition_by or [] if p not in cols]
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    rows = (
        back.groupBy(F.input_file_name().alias("_f")).agg(*aggs).collect()
    )
    actions = []
    from urllib.parse import unquote

    for r in rows:
        # relative path INCLUDING partition dirs: everything from the
        # uuid'd tx dir on (unique in the URI by construction).
        # input_file_name() returns a URI, so hive-escaped dir names
        # (s=p%3Dq) arrive double-encoded (%253D) — unquote ONCE back
        # to the on-disk name (unquote leaves literal '+' alone)
        uri = r["_f"]
        rel = unquote(uri[uri.index(sub):])
        stats = {"rows": r["_rows"],
                 "bytes": os.path.getsize(os.path.join(table, rel))}
        for c in cols:
            stats[c] = [r[f"_min_{c}"], r[f"_max_{c}"]]
        if partition_by:
            stats["_part"] = {p: r[f"_min_{p}"] for p in partition_by}
        actions.append({"op": "add", "file": rel, "stats": stats})
    return actions


def _discard_written(table: str, actions: list[dict]) -> None:
    """Remove the data dirs a failed (never-committed) write produced —
    they are invisible to every reader (the log never references them),
    so this is cleanup, not a state change. Removes the whole tx dir
    (partitioned writes nest hive dirs below it)."""
    import shutil

    for d in sorted({os.path.join(*a["file"].split("/")[:2])
                     for a in actions if a["op"] == "add"}):
        shutil.rmtree(os.path.join(table, d), ignore_errors=True)


def _read_written(spark: SparkSession, actions: list[dict],
                  table: str, colmap: dict | None = None,
                  base: int | None = None) -> DataFrame:
    """The rows a pending commit would make live — read back from the
    files actually written, so validation sees the committed BYTES,
    not a second evaluation of a possibly non-deterministic source
    (ADVICE r13: rand()/timestamp sources could otherwise commit rows
    that were never validated). Files store physical names; the frame
    comes back LOGICAL (checks reference logical columns), with hive
    partition columns re-derived from the paths."""
    df = spark.read.parquet(
        *[os.path.join(table, a["file"]) for a in actions
          if a["op"] == "add"])
    v = latest_version(table) if base is None else base
    pby = _partition_by_at(table, v)
    if pby:
        schema = _schema_at(table, v) or {}
        phys_types = {_phys(colmap or {}, c): t
                      for c, t in schema.items()}
        df = _attach_partition_cols(df, pby, phys_types)
    ren = {p: c for c, p in (colmap or {}).items() if p != c}
    return df.withColumnsRenamed(ren) if ren else df


def tx_append(df: DataFrame, table: str,
              stats_cols: list[str] | None = None,
              txn: dict | None = None,
              allow_schema_evolution: bool = False,
              partition_by: list[str] | None = None) -> int:
    """Append-only commit: new files + one log entry, O(delta).
    Returns the committed version.

    `partition_by` (r13 verdict item 4, first commit only): the table
    becomes hive-partitioned — every write lays files out under
    `col=value` directories, partition values ride typed in the log,
    and a partition predicate prunes files BEFORE min/max stats are
    consulted (the directory-level first prune a 100 TB read needs).
    The partition spec is fixed at creation (the Delta/Iceberg
    contract); later appends may restate it but not change it."""
    actions = None
    # blind appends COMMUTE, so a lost race is retried at the next
    # version number automatically (the Delta protocol's append
    # auto-resolution); read-modify-write ops (delete/merge/compact)
    # get the converse through _commit_rmw: rival blind appends
    # commute with them, anything touching their read set or the
    # table metadata surfaces TxConflict.
    # Each attempt captures base = latest_version FIRST and runs the
    # txn-replay and schema checks AGAINST THAT BASE, then commits at
    # base+1: a rival commit landing anywhere in the window (including
    # during the multi-second _write_files) bumps the version, the
    # commit raises TxConflict, and the checks re-run against the new
    # state — no stale-check/fresh-commit TOCTOU. A rival replay of
    # the same (app, batch) therefore turns the retry into a no-op,
    # and a rival schema evolution fails the retry loudly instead of
    # being silently regressed by a stale schema recommit.
    colmap_used = None
    for _ in range(20):
        base = latest_version(table)
        if txn is not None:
            last = last_txn_batch(table, txn["app"], at_version=base)
            if last is not None and txn["batch"] <= last:
                return base  # idempotent replay: no-op
        prior = _check_schema(df, table, allow_schema_evolution,
                              at_version=base, allow_readd=True)
        # files store PHYSICAL names; a rival RENAME between retries
        # invalidates already-written files (wrong physical names) —
        # discard and rewrite under the new mapping
        colmap = _colmap_at(table, base)
        # re-adding a DROPPED column name: assign a FRESH physical
        # name so the old files' bytes (under the retired name) can
        # never resurrect — the new column starts NULL everywhere
        retired = _retired_at(table, base)
        readds = [c for c in df.columns
                  if c in retired and c not in (prior or {})]
        if readds:
            colmap = dict(colmap)
            taken = (set(retired) | set(df.columns)
                     | {_phys(colmap, x) for x in (prior or {})})
            for c in readds:
                i = 2
                while f"{c}__{i}" in taken:
                    i += 1
                colmap[c] = f"{c}__{i}"
                taken.add(f"{c}__{i}")
        pby = _partition_by_at(table, base)
        if partition_by is not None:
            req = [_phys(colmap, c) for c in partition_by]
            if base < 0:
                pby = req
            elif req != pby:
                raise ValueError(
                    f"tx partition spec is fixed at table creation: "
                    f"{table} is partitioned by {pby}, append asked "
                    f"for {req}")
        if actions is not None and colmap != colmap_used:
            _discard_written(table, actions)
            actions = None
        if actions is None:
            actions = _write_files(
                _to_physical(df, colmap), table,
                [_phys(colmap, c) for c in stats_cols or []], pby)
            colmap_used = colmap
        # CHECK constraints as of base, validated against the WRITTEN
        # BYTES (read-back of the new files — ADVICE r13: validating
        # the source DataFrame is a second evaluation, so a
        # non-deterministic source could commit rows never validated;
        # Delta enforces invariants on the rows actually written). A
        # rival changing the checks mid-write forces TxConflict at
        # base+1 and this re-validates (the same pinning as the schema
        # check). A violation discards the uncommitted files.
        checks = _checks_at(table, base)
        if checks:
            try:
                _validate_checks(
                    _read_written(df.sparkSession, actions, table,
                                  colmap, base),
                    checks, table)
            except ValueError:
                _discard_written(table, actions)
                raise
        # record the MERGED schema: a narrow source never regresses a
        # widened table; a widening/evolving source promotes it
        # (prior comes back from the check — one commit-file read)
        schema = _merged_schema(prior, _schema_fields(df)) if prior \
            else _schema_fields(df)
        try:
            _commit(table, base + 1, actions, txn, schema,
                    colmap=colmap, partition_by=pby)
            return base + 1
        except TxConflict:
            continue
    raise TxConflict(
        f"append to {table} lost 20 straight version races — "
        "writer storm, back off")


def _commit_rmw(table: str, base: int, actions: list[dict],
                read_set: set, schema: dict | None = None) -> int:
    """Commit a read-modify-write op (delete/merge/compact) with
    Delta-style LOGICAL conflict resolution (the ConflictChecker /
    WriteSerializable behavior): losing the version race to a rival
    commit no longer aborts unconditionally — the rival's commits are
    inspected, and if they are BLIND APPENDS that touched none of the
    files this op read (`read_set`) and changed no table metadata,
    the same actions re-commit at the next version (the rival's new
    files simply stay live — appends commute with file-granular
    rewrites of OTHER files). A rival that removed or DV'd a file in
    the read set, changed schema/checks/colmap/partitioning, or whose
    commit was already cleaned away raises TxConflict: the op's
    derivation is genuinely stale and the CALLER must re-derive.
    At 100 TB this is the difference between nightly compaction
    blocking every ingest writer and the two proceeding unbothered."""
    schema0 = _schema_at(table, base)
    checks0 = _checks_at(table, base)
    colmap0 = _colmap_at(table, base)
    pby0 = _partition_by_at(table, base)
    v = base
    for _ in range(20):
        try:
            _commit(table, v + 1, actions, schema=schema)
            return v + 1
        except TxConflict:
            latest = latest_version(table)
            for rv in range(v + 1, latest + 1):
                try:
                    e = _read_json_commit(table, rv)
                except FileNotFoundError:
                    raise TxConflict(
                        f"version {rv} of {table} was cleaned while "
                        "this writer raced — re-derive from the "
                        "latest snapshot") from None
                for a in e["actions"]:
                    if a["op"] in ("remove", "dv") and \
                            a["file"] in read_set:
                        raise TxConflict(
                            f"concurrent commit {rv} {a['op']}d "
                            f"{a['file']}, which this operation read "
                            "— re-derive from the latest snapshot")
            if (_schema_at(table, latest) != schema0
                    or _checks_at(table, latest) != checks0
                    or _colmap_at(table, latest) != colmap0
                    or _partition_by_at(table, latest) != pby0):
                raise TxConflict(
                    f"concurrent metadata change on {table} "
                    "(schema/constraints/column mapping/partitioning) "
                    "— re-derive from the latest snapshot")
            v = latest
    raise TxConflict(
        f"read-modify-write on {table} lost 20 straight version "
        "races — writer storm, back off")


def _overlaps(stats: dict, col: str, op: str, value) -> bool:
    """Can a file with these stats contain a row matching
    `col op value`? Missing stats → must read (never skip blindly)."""
    rng = stats.get(col)
    if not rng or rng[0] is None:
        return True
    lo, hi = rng
    if op == "=":
        return lo <= value <= hi
    if op == "<=":
        return lo <= value
    if op == "<":
        return lo < value
    if op == ">=":
        return hi >= value
    if op == ">":
        return hi > value
    raise ValueError(f"unsupported predicate op {op!r}")


_OPS = {
    "=": lambda c, v: c == v,
    "<=": lambda c, v: c <= v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    ">": lambda c, v: c > v,
}


def read_table(spark: SparkSession, table: str,
               version: int | None = None,
               where: tuple | None = None,
               timestamp: float | None = None) -> DataFrame:
    """Snapshot read (time travel with `version=`, or TIMESTAMP AS OF
    with `timestamp=` — resolved to the latest commit at or before it,
    the Delta rule). `where` is a simple predicate tuple (col, op,
    literal): files whose stats cannot contain a match are pruned
    BEFORE the scan, and the residual filter is applied to the
    survivors — log-level data skipping. Empty snapshots need the
    schema from somewhere, so an empty live set raises (a table with
    zero commits is a bug at this layer, not an empty DataFrame)."""
    if timestamp is not None:
        if version is not None:
            raise ValueError(
                "pass version= OR timestamp=, not both")
        version = version_at_timestamp(table, timestamp)
    # resolve 'latest' ONCE: files and schema must come from the SAME
    # version — a rival evolution committing between two independent
    # latest_version() calls would return snapshot-N rows under
    # schema@N+1 (r13 review finding)
    if version is None:
        version = latest_version(table)
    live = snapshot_files(table, version)
    if not live:
        raise ValueError(f"{table} snapshot is empty")
    files = sorted(live)
    if where is not None:
        col, op, value = where
        pcol = _phys(_colmap_at(table, version), col)
        # partition prune FIRST (directory-level: exact values, valid
        # even with no stats columns recorded), then min/max stats
        files = [f for f in files
                 if not _part_prunes(live[f], pcol, op, value)
                 and _overlaps(live[f], pcol, op, value)]
        if not files:
            # preserve the FULL (merged) schema: fall back to the
            # whole file list — a single arbitrary file could predate
            # an additive evolution and silently lack new columns.
            # The predicate matches nothing, parquet row-group stats
            # skip the data pages, and zero-match reads are rare.
            files = sorted(live)
    df = _read_files(spark, table, files, version, live)
    if where is not None:
        col, op, value = where
        df = df.filter(_OPS[op](F.col(col), F.lit(value)))
    return df


def tx_delete_where(spark: SparkSession, table: str, where: tuple,
                    stats_cols: list[str] | None = None,
                    deletion_vectors: bool = False) -> int:
    """File-granular delete: only files whose stats can contain a
    matching row are touched; every other file is untouched.

    Two physical strategies, same logical result:
    - copy-on-write (default): touched files are REWRITTEN (survivor
      rows re-added) in one atomic remove+add commit — reads stay
      plain scans, the delete pays the rewrite.
    - `deletion_vectors=True` (the Delta DV / Iceberg v2
      position-delete design): the matching rows' (file, row_index)
      positions are written as a small DV parquet and the commit
      records only `dv` actions — ZERO data files rewritten, so
      deleting 100 rows from a 1 GB file costs O(deleted rows), the
      100 TB delete story. Reads merge-on-read: _read_files anti-joins
      the positions via `_metadata.row_index`. Later DVs accumulate;
      compaction/merge rewrites fold DVs away (their rows vanish with
      the removed file); vacuum keeps DV files alive while any kept
      snapshot references them. Both modes are NULL-safe: a NULL
      predicate never deletes a row."""
    col, op, value = where
    base = latest_version(table)
    live = snapshot_files(table, base)
    colmap = _colmap_at(table, base)
    pcol = _phys(colmap, col)
    touched = [f for f in sorted(live)
               if not _part_prunes(live[f], pcol, op, value)
               and _overlaps(live[f], pcol, op, value)]
    if not touched:
        # no file's stats can contain a match: a no-op delete commits
        # NOTHING — an empty version would pollute history and the CDF
        # version sequence for zero state change
        return base
    pred = _OPS[op](F.col(col), F.lit(value))
    if deletion_vectors:
        sub = os.path.join("data", f"dv-{uuid.uuid4().hex[:12]}")
        dest = os.path.join(table, sub)
        # read WITH the current DVs applied: rows already deleted must
        # not be re-recorded; pred IS TRUE keeps NULL rows out
        hits = (
            _read_files(spark, table, touched, base, live)
            .filter(pred.eqNullSafe(F.lit(True)))
            .select(
                _rel_file_expr().alias("file"),
                F.col("_metadata.row_index").alias("pos"),
            )
        )
        hits.write.parquet(dest)
        dv_files = _dv_file_list(dest)
        if not dv_files:
            # stats overlapped but nothing matched: remove the empty
            # DV dir, commit nothing
            import shutil
            shutil.rmtree(dest, ignore_errors=True)
            return base
        actions = [{"op": "dv", "file": f, "dv": sub} for f in dv_files]
        return _commit_rmw(table, base, actions, set(touched))
    # NULL-safe survivor filter: ~(col op value) is NULL (not
    # false) when the column is NULL, and a plain filter drops
    # NULL rows — silently deleting rows the predicate never
    # matched. A delete keeps every row whose predicate is not
    # TRUE, so coalesce the negation to TRUE for NULLs.
    survivors = _read_files(spark, table, touched, base, live).filter(
        F.coalesce(~pred, F.lit(True)))
    actions = [{"op": "remove", "file": f} for f in touched]
    actions += _write_files(_to_physical(survivors, colmap), table,
                            [_phys(colmap, c) for c in stats_cols or []],
                            _partition_by_at(table, base))
    # schema carried forward; blind-append rivals commute (_commit_rmw)
    return _commit_rmw(table, base, actions, set(touched))


def _cluster(df: DataFrame, cluster_by, target_files: int) -> DataFrame:
    """Re-layout for a compaction rewrite: a single column
    range-clusters (tight disjoint 1-D min/max per file); a PAIR of
    numeric columns Z-ORDERS (Morton-interleaved equi-width ranks via
    operators/layout.py — every file gets a small min/max BOX in both
    dimensions, so stats pruning works on either column alone: the
    Delta OPTIMIZE ZORDER layout)."""
    if cluster_by is None:
        return df.repartition(target_files)
    if isinstance(cluster_by, (list, tuple)):
        if len(cluster_by) == 1:
            cluster_by = cluster_by[0]
        elif len(cluster_by) == 2:
            from saurav_nayak_recipe_etl_project_spark.operators.layout import (
                optimize_layout_zorder,
            )

            return optimize_layout_zorder(
                df, cluster_by[0], cluster_by[1], target_files)
        else:
            raise ValueError(
                "cluster_by supports one column (range) or two "
                "(Z-order); higher dimensions dilute pruning power "
                "per dimension — pick the two hottest predicates")
    return df.repartitionByRange(
        target_files, cluster_by).sortWithinPartitions(cluster_by)


def tx_compact(spark: SparkSession, table: str, target_files: int = 1,
               stats_cols: list[str] | None = None,
               cluster_by=None) -> int:
    """Fold the live file set into `target_files` files — remove+add
    in ONE commit, so every reader sees either the old layout or the
    new one, never both or neither. `cluster_by` range-partitions +
    sorts the rewrite on that column so post-compact files carry
    TIGHT DISJOINT min/max ranges and stats skipping stays effective
    after compaction; a PAIR of columns Z-orders the rewrite
    (Morton-interleaved ranks — both columns prune alone, the Delta
    OPTIMIZE ZORDER layout)."""
    base = latest_version(table)
    live = snapshot_files(table, base)
    colmap = _colmap_at(table, base)
    df = _read_files(spark, table, sorted(live), base, live)
    df = _cluster(df, cluster_by, target_files)
    actions = _write_files(_to_physical(df, colmap), table,
                           [_phys(colmap, c) for c in stats_cols or []],
                           _partition_by_at(table, base))
    actions += [{"op": "remove", "file": f} for f in sorted(live)]
    return _commit_rmw(table, base, actions, set(live))


def tx_optimize(spark: SparkSession, table: str,
                target_file_bytes: int = 128 * 1024 * 1024,
                stats_cols: list[str] | None = None,
                cluster_by=None,
                where: tuple | None = None) -> int:
    """Bin-packing OPTIMIZE (the Delta OPTIMIZE / small-file
    compaction, r14): rewrite ONLY the live files smaller than
    `target_file_bytes` into ~target-sized files; files already at
    target are NOT touched — unlike `tx_compact`, which rewrites the
    whole table, this is the nightly maintenance shape that stays
    O(small files) at any table size. Sizes come from the per-file
    `bytes` stats (getsize fallback for pre-r14 commits). Deletion
    vectors on the packed files fold away with the rewrite; packing is
    partition-aware for free (_write_files re-partitions hive layout);
    a rival blind append during the pack commutes via _commit_rmw —
    OPTIMIZE never blocks ingest. No-op (no commit) when fewer than
    two small files exist. Returns the committed (or current)
    version.

    `where=(col, op, literal)` scopes the pack to the files the
    predicate can match — OPTIMIZE WHERE, the partition-scoped
    maintenance shape: at 100 TB you pack TODAY'S partition after the
    day closes, not the whole table; files other partitions own are
    untouched by construction (directory-level prune first, then
    stats)."""
    base = latest_version(table)
    live = snapshot_files(table, base)
    colmap = _colmap_at(table, base)

    def _size(f: str, st: dict) -> int:
        b = st.get("bytes")
        if b is None:
            try:
                b = os.path.getsize(os.path.join(table, f))
            except OSError:
                b = 0
        return int(b)

    small = {f: _size(f, st) for f, st in live.items()
             if _size(f, st) < target_file_bytes}
    if where is not None:
        col, op, value = where
        pcol = _phys(colmap, col)
        small = {f: b for f, b in small.items()
                 if not _part_prunes(live[f], pcol, op, value)
                 and _overlaps(live[f], pcol, op, value)}
    # a small file carrying deletion vectors is worth rewriting even
    # alone (the pack folds the DV read tax away)
    if len(small) < 2 and not any(
            live[f].get("_dvs") for f in small):
        return base
    n_out = max(1, -(-sum(small.values()) // target_file_bytes))
    df = _read_files(spark, table, sorted(small), base, live)
    df = (df.coalesce(n_out) if cluster_by is None
          else _cluster(df, cluster_by, n_out))
    actions = _write_files(_to_physical(df, colmap), table,
                           [_phys(colmap, c) for c in stats_cols or []],
                           _partition_by_at(table, base))
    actions += [{"op": "remove", "file": f} for f in sorted(small)]
    return _commit_rmw(table, base, actions, set(small))


def tx_merge(spark: SparkSession, table: str, source: DataFrame,
             key: str, stats_cols: list[str] | None = None,
             allow_schema_evolution: bool = False,
             matched_delete: tuple | None = None,
             matched_update_condition: tuple | None = None,
             deletion_vectors: bool = False) -> int:
    """Row-level MERGE: source rows REPLACE table rows with the same
    `key`; unmatched source rows are INSERTED — the maintenance.py
    docstring's "table format with row-level merge", delivered.

    Full Delta-style clause set, evaluated in order per matched row:
    - `matched_delete=(col, op, literal)` — WHEN MATCHED AND <cond>
      THEN DELETE: matched target rows whose SOURCE row satisfies the
      condition are dropped (neither kept nor replaced; the source row
      is not written).
    - `matched_update_condition=(col, op, literal)` — WHEN MATCHED AND
      <cond> THEN UPDATE: matched rows are replaced only when the
      source row satisfies the condition; otherwise the TARGET row is
      retained. Omitted = unconditional update (upsert).
    Both conditions reference the SOURCE row and are NULL-SAFE: a
    condition evaluating to NULL does NOT fire the clause (standard
    SQL WHEN MATCHED AND semantics — the tx_delete_where lesson,
    applied via IS TRUE, never a bare filter). Unmatched source rows
    insert unconditionally regardless of either clause.

    File-granular: only live files whose `key` stats overlap the
    source's key range are rewritten (coarse range prune driver-side;
    the key joins below are what guarantee correctness — production
    formats refine the prune with a bloom or an inner join on file
    ranges, same contract). A source with duplicate keys raises (the
    Delta MERGE multiple-match rule) — an upsert that applies "one of"
    two updates silently is a corruption, not a convenience.

    `deletion_vectors=True` (the Delta DV-MERGE / merge-on-read
    upsert, r13 verdict item 2): instead of REWRITING every
    stat-overlapping file, the matched target rows a clause fires on
    (delete OR update) are recorded as position deletes in a DV
    parquet, and only the REPLACEMENT rows (fired updates + inserts)
    are appended as new files — ZERO data files removed, so a 1-row
    upsert into a table of 1 GB files costs O(changed rows), not
    O(touched file bytes): the dominant write-amplification cliff at
    100 TB. Matched rows no clause fires on stay in place untouched.
    Repeated DV merges ACCUMULATE vectors on the same files;
    compaction and COW rewrites fold them away; CDF reports a DV'd
    file as modified in place — all inherited from the A19 read
    path."""
    # ONE aggregate job answers key range, emptiness, AND the
    # duplicate-key rule (count == distinct count ⟺ key-unique) —
    # folding what used to be two source scans
    klo, khi, n_rows, n_keys = source.agg(
        F.min(key), F.max(key), F.count(F.lit(1)),
        F.countDistinct(key)).first()
    if n_rows != n_keys:
        raise ValueError(
            f"tx_merge: source has duplicate {key} values — an upsert "
            "must be key-unique (dedupe upstream, deliberately)")
    # capture base BEFORE any further check (the tx_append TOCTOU
    # lesson, ADVICE r12): the schema check and the snapshot are both
    # pinned to this version, and the O_EXCL commit at base+1
    # linearizes — a rival schema-evolution commit landing during the
    # min/max agg or the file writes forces TxConflict instead of
    # being schema-checked against the pre-rival version and silently
    # dropped from _schema_fields(merged)
    base = latest_version(table)
    prior = _check_schema(source, table, allow_schema_evolution,
                          at_version=base) or {}
    lo, hi = klo, khi
    live = snapshot_files(table, base)
    colmap = _colmap_at(table, base)
    pkey = _phys(colmap, key)
    if lo is None:
        return base  # empty source: no-op, no empty commit
    touched = [
        f for f in sorted(live)
        if _overlaps(live[f], pkey, ">=", lo)
        and _overlaps(live[f], pkey, "<=", hi)
    ]

    def _cond_true(cond: tuple):
        c, op, v = cond
        # IS TRUE: NULL never fires a clause
        return _OPS[op](F.col(c), F.lit(v)).eqNullSafe(F.lit(True))

    tgt = None
    if touched:
        tgt = _read_files(spark, table, touched, base, live)
    repl = None  # keys whose matched TARGET row leaves the table
    if matched_delete is None and matched_update_condition is None:
        # plain upsert: survivors = unmatched targets, write-all source
        survivors = (None if tgt is None or deletion_vectors
                     else tgt.join(source.select(key), key, "left_anti"))
        to_write = source
        repl = source.select(key)
    else:
        del_f = (_cond_true(matched_delete) if matched_delete is not None
                 else F.lit(False))
        upd_f = (_cond_true(matched_update_condition)
                 if matched_update_condition is not None else F.lit(True))
        flags = source.select(
            F.col(key), del_f.alias("__tx_del"), upd_f.alias("__tx_upd"))
        if tgt is None:
            survivors = None
            to_write = source  # nothing can match: all-insert
        else:
            # a matched target row leaves when EITHER clause fires
            # (delete drops it, update replaces it)
            repl = (flags
                    .filter(F.col("__tx_del") | F.col("__tx_upd"))
                    .select(key))
            # target rows kept: unmatched, or matched with neither
            # clause firing (delete wins over update, Delta clause
            # order). DV mode never rewrites survivors — they stay in
            # their files and the fired rows are masked by position.
            survivors = None
            if not deletion_vectors:
                survivors = (
                    tgt.join(flags.withColumn("__tx_m", F.lit(True)),
                             key, "left")
                    .filter(F.col("__tx_m").isNull()
                            | (~F.col("__tx_del") & ~F.col("__tx_upd")))
                    .drop("__tx_del", "__tx_upd", "__tx_m"))
            # source rows written: unmatched inserts + matched updates
            # that fire and are not deletes. The anti and semi joins
            # each re-scan the touched files, but pruned to the single
            # key column (footer + one column chunk — a small fraction
            # of the survivors' full-width read); materializing the
            # key set instead would pin an unbounded frame, and a
            # distinct+join replacement costs a shuffle the pruned
            # scans avoid.
            tkeys = tgt.select(key)
            src_f = (source
                     .withColumn("__tx_del", del_f).withColumn("__tx_upd", upd_f))
            ins = src_f.join(tkeys, key, "left_anti")
            upd = (src_f.join(tkeys, key, "left_semi")
                   .filter(~F.col("__tx_del") & F.col("__tx_upd")))
            to_write = ins.unionByName(upd).drop("__tx_del", "__tx_upd")
    actions: list[dict] = []
    write_df: DataFrame | None = None
    if deletion_vectors and tgt is not None:
        # merge-on-read MERGE: position-delete the fired matched rows,
        # append only the replacement rows — zero data files removed
        import shutil

        sub = os.path.join("data", f"dv-{uuid.uuid4().hex[:12]}")
        dest = os.path.join(table, sub)
        # positions read WITH current DVs applied (already-masked rows
        # are never re-recorded — the tx_delete_where discipline)
        hits = (
            _read_files(spark, table, touched, base, live)
            .select(
                F.col(key),
                _rel_file_expr().alias("file"),
                F.col("_metadata.row_index").alias("pos"))
            .join(repl, key, "left_semi")
            .select("file", "pos")
        )
        # the DV-position write and the replacement-row probe+write
        # are independent (distinct dirs; both scan the key-pruned
        # touched files + source), so they run CONCURRENTLY from
        # driver threads (guide §2.6) — the two heaviest jobs of a DV
        # merge overlap instead of adding. Both outputs stay invisible
        # until the single _commit_rmw below, so atomicity/idempotency
        # are unchanged; action order in the log is composed
        # deterministically after both finish, exactly as before.
        from saurav_nayak_recipe_etl_project_spark.streaming import (
            parallel_actions,
        )

        res: dict = {"dv_files": [], "add_actions": None}

        def _write_dv() -> None:
            hits.write.parquet(dest)
            res["dv_files"] = _dv_file_list(dest)

        def _write_repl() -> None:
            # plain upsert writes the whole (non-empty) source — no
            # probe needed; the clause path may write nothing
            # (all-delete)
            if to_write is source or to_write.limit(1).count():
                res["add_actions"] = _write_files(
                    _to_physical(to_write, colmap), table,
                    [_phys(colmap, c) for c in stats_cols or []],
                    _partition_by_at(table, base))

        parallel_actions(_write_dv, _write_repl)
        if res["dv_files"]:
            actions += [{"op": "dv", "file": f, "dv": sub}
                        for f in res["dv_files"]]
        else:
            shutil.rmtree(dest, ignore_errors=True)
        if res["add_actions"] is not None:
            write_df = to_write
        if not actions and write_df is None:
            return base  # nothing fired, nothing to insert: no-op
        actions += res["add_actions"] or []
    else:
        # copy-on-write: rewrite the touched files whole.
        # allowMissingColumns: under additive evolution the survivors
        # lack the source's new columns — they fill as NULL, the
        # mergeSchema read contract
        write_df = (to_write if survivors is None
                    else survivors.unionByName(to_write,
                                               allowMissingColumns=True))
        actions += [{"op": "remove", "file": f} for f in touched]
        if write_df is not None:
            actions += _write_files(
                _to_physical(write_df, colmap), table,
                [_phys(colmap, c) for c in stats_cols or []],
                _partition_by_at(table, base))
    # CHECK constraints validated against the WRITTEN BYTES (ADVICE
    # r13, same as tx_append): every row this commit makes newly live
    # is in the new files; a violation discards them uncommitted.
    checks = _checks_at(table, base)
    new = [a for a in actions if a["op"] == "add"]
    if checks and new:
        try:
            _validate_checks(
                _read_written(spark, new, table, colmap, base),
                checks, table)
        except ValueError:
            _discard_written(table, new)
            raise
    return _commit_rmw(
        table, base, actions, set(touched),
        schema=_merged_schema(
            prior, _schema_fields(write_df if write_df is not None
                                  else source)))


def tx_changes(spark: SparkSession, table: str, from_version: int,
               to_version: int, key: str,
               cols: list[str]) -> DataFrame:
    """Change data feed: row-level changes between two versions,
    computed from ONLY the files the intervening commits touched —
    a row in a file neither removed nor added between the versions
    CANNOT have changed, so the diff reads O(churn) bytes at any
    table size (the Delta CDF idea, recovered from add/remove
    actions instead of stored change files). Rewrite-only churn
    (compaction) hashes out as unchanged. Returns delta.table_diff's
    vocabulary: (key, change_type ∈ added/removed/changed). Vacuumed
    `from_version`s raise loudly via the snapshot replay."""
    from saurav_nayak_recipe_etl_project_spark.operators.delta import (
        table_diff,
    )

    a, b = _cdf_sides(spark, table, from_version, to_version)
    return table_diff(a, b, key, cols)


def _cdf_sides(spark: SparkSession, table: str, from_version: int,
               to_version: int) -> tuple[DataFrame, DataFrame]:
    """(after-side rows, before-side rows) for a change feed between
    two versions, reading ONLY the files the intervening commits
    touched — shared by tx_changes (key+change_type) and
    tx_changes_rows (full pre/post images)."""
    if from_version >= to_version:
        raise ValueError("tx_changes needs from_version < to_version")
    before = snapshot_files(table, from_version)
    after = snapshot_files(table, to_version)
    removed = sorted(f for f in before if f not in after)
    added = sorted(f for f in after if f not in before)
    # a file whose DELETION VECTORS changed between the versions
    # mutated in place: its old content (before-DVs applied) joins the
    # removed side and its new content the added side — unchanged rows
    # hash out in table_diff, DV'd rows surface as 'removed'
    modified = sorted(
        f for f in before if f in after
        and before[f].get("_dvs", []) != after[f].get("_dvs", []))
    # schema donor for an empty side: the other side's churn, else any
    # live file of either snapshot (a delete-everything commit leaves
    # `after` empty — the feed must report the removals, not crash)
    donor = added or removed or modified or sorted(after or before)
    if not donor:
        raise ValueError(
            f"tx_changes: {table} has no files at either version")

    def _read(files, live):
        src = files or donor
        # BOTH sides read under the to_version schema: the diff is
        # reported in the current contract, and a widened generation
        # compares as the same logical values (int 7 == bigint 7).
        # Each side applies ITS OWN version's deletion vectors.
        df = _read_files(spark, table, src, to_version, live)
        return df if files else df.limit(0)

    return (_read(added + modified, after),
            _read(removed + modified, before))


def tx_changes_rows(spark: SparkSession, table: str, from_version: int,
                    to_version: int, key: str) -> DataFrame:
    """Change data feed WITH full row images (the Delta CDF
    `_change_type` vocabulary, r14): every changed row between the
    versions, carrying ALL columns plus `_change_type` ∈ insert /
    delete / update_preimage / update_postimage — an updated key
    emits BOTH its old and new row, so a downstream consumer can
    apply, audit, or revert the change without re-reading either
    snapshot. Same O(churn) read as tx_changes (only touched files);
    rewrite-only churn (compaction, survivor rewrites) compares
    struct-equal and is filtered out; each side applies its own
    version's deletion vectors."""
    a, b = _cdf_sides(spark, table, from_version, to_version)
    schema = _schema_at(table, to_version) or {}
    cols = [c for c in schema if c != key] or         [c for c in a.columns if c != key]
    av = a.select(F.col(key).alias("_k"), F.struct(*cols).alias("_a"))
    bv = b.select(F.col(key).alias("_k"), F.struct(*cols).alias("_b"))
    j = bv.join(av, "_k", "full_outer")
    ins = (j.filter(F.col("_b").isNull())
           .select("_k", "_a.*", F.lit("insert").alias("_change_type")))
    dele = (j.filter(F.col("_a").isNull())
            .select("_k", "_b.*", F.lit("delete").alias("_change_type")))
    chg = j.filter(F.col("_a").isNotNull() & F.col("_b").isNotNull()
                   & ~F.col("_a").eqNullSafe(F.col("_b")))
    pre = chg.select("_k", "_b.*",
                     F.lit("update_preimage").alias("_change_type"))
    post = chg.select("_k", "_a.*",
                      F.lit("update_postimage").alias("_change_type"))
    return (ins.unionByName(dele).unionByName(pre).unionByName(post)
            .withColumnRenamed("_k", key))


def tx_read_incremental(spark: SparkSession, table: str,
                        after_version: int):
    """Incremental consumption of an append-mostly table: the rows
    ADDED by commits in (after_version, latest], plus the new cursor —
    the poll loop of a streaming source over the tx log (Delta's
    streaming source reads exactly this; callers checkpoint the
    returned version and pass it back next poll). Raises if any
    intervening commit REMOVED files (a delete/merge/compact is not
    representable as an append feed — consume `tx_changes` instead;
    silently skipping removals would replay ghosts). Returns
    (DataFrame | None, latest_version) — None when nothing new."""
    latest = latest_version(table)
    if latest <= after_version:
        return None, latest
    added: list[str] = []
    vs = [v for v in _json_versions(table)
          if after_version < v <= latest]
    if vs != list(range(after_version + 1, latest + 1)):
        raise ValueError(
            f"tx_read_incremental: commits in ({after_version}, {latest}] "
            "are no longer individually replayable (log cleaned past a "
            "checkpoint) — re-bootstrap this consumer from a snapshot")
    for v in vs:
        for a in _read_json_commit(table, v)["actions"]:
            if a["op"] in ("remove", "dv"):
                raise ValueError(
                    f"tx_read_incremental: version {v} removed rows "
                    "(delete/merge/compact/deletion-vector) — an append "
                    "feed cannot represent it; switch this consumer to "
                    "tx_changes")
            added.append(a["file"])
    if not added:
        return None, latest
    df = _read_files(spark, table, added, latest)
    return df, latest


def last_txn_batch(table: str, app: str,
                   at_version: int | None = None) -> int | None:
    """Highest committed batch id for `app` as of `at_version`
    (latest when None) — None when the app never committed (Delta's
    SetTransaction replay). `at_version` lets tx_append pin the check
    to its captured base so check-then-commit is conflict-atomic."""
    limit = latest_version(table) if at_version is None else at_version
    if limit < 0:
        return None
    # scan NEWEST-first and stop at the app's first txn: per app,
    # batch ids commit in order (the Structured Streaming contract),
    # so the latest matching commit holds the max batch — O(gap)
    # per micro-batch instead of re-parsing the whole log (which
    # made a long-lived tx_sink_batch stream O(commits^2)). A
    # checkpoint at or below `limit` bounds the scan further: its
    # metadata folds every older commit's txn high-water marks.
    base = _best_checkpoint(table, limit)
    for v in reversed([v for v in _json_versions(table)
                       if base < v <= limit]):
        txn = _read_json_commit(table, v).get("txn")
        if txn and txn.get("app") == app:
            return txn["batch"]
    if base >= 0:
        return _load_checkpoint(table, base)[2].get(app)
    return None


def tx_sink_batch(batch_df: DataFrame, batch_id: int, table: str,
                  app: str, stats_cols: list[str] | None = None,
                  checkpoint_every: int | None = None) -> None:
    """foreachBatch sink with table-enforced exactly-once: the commit
    carries (app, batch_id); a replayed batch is detected from the log
    and skipped — idempotence lives in the TABLE, not in every
    writer's discipline. `checkpoint_every=K` folds the log into a
    parquet checkpoint whenever the committed version is a multiple
    of K (the Delta default-every-10-commits discipline) so a
    long-lived stream's readers stay O(tail) forever without a
    separate maintenance job; re-checkpointing after a replayed batch
    is idempotent."""
    v = tx_append(batch_df, table, stats_cols,
                  txn={"app": app, "batch": batch_id})
    if checkpoint_every and v % checkpoint_every == 0:
        tx_checkpoint(table)


def vacuum(table: str, keep_versions: int = 1) -> int:
    """Delete data files unreferenced by the last `keep_versions`
    snapshots and advance the vacuum horizon; reads at versions below
    the horizon fail loudly. Returns the number of files deleted.
    Run at a quiesced boundary (no in-flight read of an old version —
    the retention contract every table format carries)."""
    vs = _versions(table)
    if not vs:
        return 0
    keep = vs[-keep_versions:]
    referenced: set = set()
    ref_dirs: set = set()  # deletion-vector dirs still referenced
    for v in keep:
        for f, st in snapshot_files(table, v).items():
            referenced.add(f)
            ref_dirs.update(st.get("_dvs", []))
    # publish the horizon BEFORE deleting anything, via temp+rename
    # like _commit: if deletion is interrupted by a crash, time travel
    # past the horizon fails with the loud horizon error (conservative
    # — some vacuumed-version reads that would still work are refused),
    # never with a missing-parquet scan error mid-plan.
    hp = os.path.join(_log_path(table), _HORIZON)
    tmp = hp + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(str(keep[0]))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, hp)
    removed = 0
    data_root = os.path.join(table, "data")
    for sub in sorted(os.listdir(data_root)) if os.path.isdir(
            data_root) else []:
        subdir = os.path.join(data_root, sub)
        if os.path.join("data", sub) in ref_dirs:
            continue  # a kept snapshot still reads these DVs
        # walk the whole tx dir: partitioned writes nest hive
        # col=value directories below it
        for root, _dirs, fnames in os.walk(subdir):
            for f in sorted(fnames):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, table)
                if f.endswith(".parquet") and rel not in referenced:
                    os.remove(full)
                    removed += 1
    return removed


def tx_restore(table: str, to_version: int,
               spark: SparkSession | None = None) -> int:
    """RESTORE TABLE TO VERSION AS OF (the Delta RESTORE command):
    commit a new version whose live set EQUALS the target snapshot —
    remove files live now but absent then, re-add files live then but
    absent now. METADATA-ONLY: no data file is written or moved, so a
    botched deploy rolls back in O(changed-files) log actions at any
    table size. The restored files must still exist — a target below
    the vacuum horizon raises loudly via the snapshot replay. The
    commit records the TARGET version's schema (full state restore,
    Delta semantics: a post-restore append is checked against the
    restored schema, not the rolled-back one). Restoring to the
    current state is a no-op — no empty commit. Returns the committed
    (or current) version; history/CDF show the restore as remove+add
    actions, so `tx_changes` across it reports exactly the rows that
    came back or vanished.

    CHECK constraints: by default restore does NOT re-validate the
    restored rows against constraints added after the target version
    (the Delta RESTORE semantics — restore is a state rollback, not a
    write; ADVICE r13 asked for this to be explicit). Pass `spark=`
    to opt INTO validation: the restored live set is checked against
    the constraints currently in force and a violation raises without
    committing."""
    base = latest_version(table)
    target = snapshot_files(table, to_version)  # loud if vacuumed/cleaned
    current = snapshot_files(table, base)
    if spark is not None:
        checks = _checks_at(table, base)
        if checks and target:
            _validate_checks(
                _read_files(spark, table, sorted(target), to_version,
                            target),
                checks, table)
    # a file live in BOTH snapshots whose stats differ (a deletion
    # vector landed after the target version) must also roll back:
    # remove-then-add re-establishes it with the target's stats — the
    # add/remove replay order makes that exact
    changed = sorted(f for f in current
                     if f in target and current[f] != target[f])
    actions = [{"op": "remove", "file": f}
               for f in sorted(current) if f not in target]
    actions += [{"op": "remove", "file": f} for f in changed]
    actions += [{"op": "add", "file": f, "stats": target[f]}
                for f in sorted(target) if f not in current]
    actions += [{"op": "add", "file": f, "stats": target[f]}
                for f in changed]
    if not actions and (
            _schema_at(table, to_version) == _schema_at(table, base)
            and _colmap_at(table, to_version) == _colmap_at(table, base)):
        return base
    # full state restore: the TARGET version's schema AND column
    # mapping come back together (a restore across a rename or a
    # column drop rolls the logical contract back — possibly with
    # ZERO file actions, a pure metadata restore)
    _commit(table, base + 1, actions, schema=_schema_at(table, to_version),
            colmap=_colmap_at(table, to_version))
    return base + 1


def history(table: str) -> list[dict]:
    """One dict per version with a surviving JSON commit: counts of
    add/remove actions + txn + commit timestamp (commits folded away
    by tx_clean_log no longer have per-commit history — the
    log-retention contract)."""
    out = []
    for v in _json_versions(table):
        e = _read_json_commit(table, v)
        ops = [a["op"] for a in e["actions"]]
        out.append({"version": v, "adds": ops.count("add"),
                    "removes": ops.count("remove"),
                    "dvs": ops.count("dv"), "txn": e.get("txn"),
                    "ts": e.get("ts")})
    return out


def version_at_timestamp(table: str, ts: float) -> int:
    """TIMESTAMP AS OF resolution (the Delta rule): the LATEST version
    whose commit timestamp is <= `ts`. Raises loudly when `ts`
    predates the first surviving commit, and resolves only over
    commits whose JSON survives (commits folded below a checkpoint
    lose their timestamps with their history — time travel to them is
    already version-gated; pre-r14 commits without a ts are skipped)."""
    best = None
    for v in _json_versions(table):
        cts = _read_json_commit(table, v).get("ts")
        if cts is not None and cts <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"{table} has no surviving commit at or before timestamp "
            f"{ts} (first commits may have been cleaned, or ts "
            "predates the table)")
    return best


def tx_checkpoint(table: str) -> int:
    """Fold the transaction log into a parquet checkpoint at the
    current latest version and publish it via the `_last_checkpoint`
    pointer (temp+rename, like _commit) — the Delta checkpoint
    protocol. After this, ANY read at or past the checkpoint replays
    only the checkpoint plus the JSON tail — O(tail), not O(commits) —
    and `tx_clean_log` may delete the folded JSON commits entirely.
    The checkpoint carries the live file set with stats, the table
    schema, and every app's txn high-water mark (so streaming replay
    detection survives log cleaning). Returns the checkpointed
    version. Idempotent: re-checkpointing the same version rewrites
    an identical file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    v = latest_version(table)
    if v < 0:
        raise ValueError(f"{table} has no commits to checkpoint")
    live, _, base = _resolve_snapshot(table, v)
    schema = _schema_at(table, v)
    txns: dict = {}
    if base >= 0:
        txns = dict(_load_checkpoint(table, base)[2])
    for jv in [x for x in _json_versions(table) if base < x <= v]:
        txn = _read_json_commit(table, jv).get("txn")
        if txn and "app" in txn:
            prev = txns.get(txn["app"])
            if prev is None or txn["batch"] > prev:
                txns[txn["app"]] = txn["batch"]
    files = sorted(live)
    t = pa.table(
        {"file": pa.array(files, pa.string()),
         "stats_json": pa.array([json.dumps(live[f]) for f in files],
                                pa.string())},
    ).replace_schema_metadata({
        b"schema_json": json.dumps(schema).encode(),
        b"txns_json": json.dumps(txns).encode(),
        b"checks_json": json.dumps(_checks_at(table, v)).encode(),
        b"colmap_json": json.dumps(_colmap_at(table, v)).encode(),
        b"partition_by_json": json.dumps(
            _partition_by_at(table, v)).encode(),
        b"retired_json": json.dumps(_retired_at(table, v)).encode(),
        b"version": str(v).encode(),
    })
    path = os.path.join(_log_path(table), f"{v:011d}{_CKPT_SUFFIX}")
    tmp = path + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    # never REGRESS the pointer (ADVICE r12): two racing checkpoints
    # (A folds v12, slower B then writes ptr=10) would otherwise leave
    # reads resolving base=10 while tx_clean_log cleans to the max
    # LISTED checkpoint (12) — commits 11-12 gone, healthy table
    # unreadable. The pointer only moves forward; tx_clean_log
    # additionally trusts only the pointer (see there).
    existing = last_checkpoint_version(table)
    if existing is None or existing < v:
        ptr = os.path.join(_log_path(table), _CKPT_PTR)
        tmp = ptr + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(json.dumps({"version": v}))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, ptr)
    return v


def last_checkpoint_version(table: str) -> int | None:
    """The `_last_checkpoint` pointer — None when never checkpointed."""
    p = os.path.join(_log_path(table), _CKPT_PTR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.loads(f.read())["version"])


def tx_clean_log(table: str) -> int:
    """Log retention: delete JSON commit files at or below the latest
    checkpoint (their state lives in the checkpoint now). Time travel
    to cleaned versions and incremental reads across them raise
    loudly; the checkpoint version itself stays readable. Returns the
    number of commit files removed.

    The clean threshold is the `_last_checkpoint` POINTER, not the max
    listed checkpoint (ADVICE r12): reads resolve through the pointer
    first, so cleaning past it (possible when a checkpoint landed but
    its pointer write crashed or lost a race) would leave
    _resolve_snapshot replaying from the pointer into cleaned commits.
    Cleaning only what the pointer can resolve keeps every surviving
    read path replayable. Pointer missing entirely → fall back to the
    max listed checkpoint (the directory-listing path _best_checkpoint
    would also take)."""
    cvs = _checkpoint_versions(table)
    if not cvs:
        return 0
    c = last_checkpoint_version(table)
    if c is None:
        c = max(cvs)
    removed = 0
    for v in _json_versions(table):
        if v <= c:
            os.remove(os.path.join(_log_path(table), f"{v:011d}.json"))
            removed += 1
    return removed


# --- registered verification gate -------------------------------------

def acid_orders_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry, STRICT VALUE oracle: scripts a 4-commit life
    of an orders table — append lower half, append upper half,
    stats-pruned DELETE of filled orders, compact — then time-travels
    to EVERY version and emits (version, n_orders, total_cents). The
    oracle recomputes each snapshot straight from the orders table, so
    one hash proves log replay, O(delta) append, file-granular delete
    (including that stats pruning never drops a matching file),
    compaction invariance, and time travel."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2 if lo is not None else 0
    table = tempfile.mkdtemp(prefix="txlog_orders_")
    stats = ["o_orderkey", "o_orderstatus"]
    tx_append(orders.filter(F.col("o_orderkey") <= mid)
              .repartition(4), table, stats)
    tx_append(orders.filter(F.col("o_orderkey") > mid)
              .repartition(4), table, stats)
    tx_delete_where(spark, table, ("o_orderstatus", "=", "F"), stats)
    tx_compact(spark, table, 1, stats)
    out = None
    for v in range(latest_version(table) + 1):
        snap = read_table(spark, table, version=v).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"),
        ).select(F.lit(v).cast("long").alias("version"),
                 "n_orders", "total_cents")
        out = snap if out is None else out.unionByName(snap)
    return out


_ACID_ORACLE = """
WITH m AS (
  SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS mid FROM orders
),
c AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(0 AS BIGINT) AS version,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM c, m WHERE o_orderkey <= mid
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM c
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT)
FROM c WHERE o_orderstatus <> 'F'
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT)
FROM c WHERE o_orderstatus <> 'F'
"""

def acid_orders_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered MERGE entry, STRICT VALUE oracle: load orders into
    the tx table (range-clustered files, key stats), MERGE an upsert
    batch — every 7th key's totalprice doubled with status 'U', every
    13th key re-inserted beyond the key space with status 'N' — then
    report the merged snapshot per status. The oracle rebuilds the
    merged table as base-anti-source ∪ source in SQL, so one hash
    proves replace-not-duplicate semantics, insert placement, the
    file-granular rewrite's survivor arithmetic, and that the coarse
    stats prune never skipped a matched file."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    hi = orders.agg(F.max("o_orderkey")).first()[0] or 0
    table = tempfile.mkdtemp(prefix="txlog_merge_")
    tx_append(orders.repartitionByRange(8, "o_orderkey")
              .sortWithinPartitions("o_orderkey"), table, ["o_orderkey"])
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"))
    inserts = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + hi + 1).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"), "o_totalprice")
    tx_merge(spark, table, updates.unionByName(inserts), "o_orderkey",
             ["o_orderkey"])
    return read_table(spark, table).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("total_cents"),
    )


_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
mx AS (SELECT MAX(o_orderkey) AS hi FROM orders),
src AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         o_totalprice * 2 AS o_totalprice
  FROM base WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + hi + 1, 'N', o_totalprice
  FROM base, mx WHERE o_orderkey % 13 = 0
),
merged AS (
  SELECT * FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT * FROM src
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM merged GROUP BY o_orderstatus
"""

def acid_orders_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered CDF entry, STRICT VALUE oracle: append orders, MERGE
    the acid_orders_merge upsert batch, DELETE the remaining open
    ('O') orders, then ask `tx_changes` what happened between version
    0 and version 2. The oracle classifies every key analytically —
    %7 keys were updated (changed), non-%7 'O' rows were deleted
    (removed), %13 re-keyed rows were inserted (added), everything
    else must be ABSENT — so one hash proves the touched-file diff
    reads exactly the churn: any unchanged row leaking in (or a
    changed one hashing out) reds the driver."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    hi = orders.agg(F.max("o_orderkey")).first()[0] or 0
    table = tempfile.mkdtemp(prefix="txlog_cdf_")
    tx_append(orders.repartitionByRange(8, "o_orderkey")
              .sortWithinPartitions("o_orderkey"), table, ["o_orderkey"])
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"))
    inserts = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + hi + 1).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"), "o_totalprice")
    tx_merge(spark, table, updates.unionByName(inserts), "o_orderkey",
             ["o_orderkey"])
    tx_delete_where(spark, table, ("o_orderstatus", "=", "O"),
                    ["o_orderkey"])
    return tx_changes(spark, table, 0, 2, "o_orderkey",
                      ["o_orderstatus", "o_totalprice"])


_CDF_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus FROM orders
),
mx AS (SELECT MAX(o_orderkey) AS hi FROM orders)
SELECT o_orderkey, 'changed' AS change_type
FROM base WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey, 'removed'
FROM base WHERE o_orderkey % 7 <> 0 AND o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey + hi + 1, 'added'
FROM base, mx WHERE o_orderkey % 13 = 0
"""

def acid_orders_cdf_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered CDF-with-images entry, STRICT VALUE oracle (r14 —
    the Delta `_change_type` vocabulary): the acid_orders_cdf scenario
    (append → MERGE upserts+inserts → DELETE the open orders), read
    back through `tx_changes_rows(0, 2)` — every changed row with its
    FULL image: %7 keys emit BOTH update_preimage (original
    status/price) and update_postimage ('U' at double price), non-%7
    open orders emit delete rows with their original values, %13
    re-keyed rows emit insert images, and every untouched-or-rewritten
    row must be ABSENT (survivor rewrites compare struct-equal). The
    oracle states all four image classes analytically — a wrong value
    in ANY image, a missing pre/post pair, or churn leaking through
    hash-mismatches."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    hi = orders.agg(F.max("o_orderkey")).first()[0] or 0
    table = tempfile.mkdtemp(prefix="txlog_cdfrows_")
    tx_append(orders.repartitionByRange(8, "o_orderkey")
              .sortWithinPartitions("o_orderkey"), table, ["o_orderkey"])
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"))
    inserts = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + hi + 1).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"), "o_totalprice")
    tx_merge(spark, table, updates.unionByName(inserts), "o_orderkey",
             ["o_orderkey"])
    tx_delete_where(spark, table, ("o_orderstatus", "=", "O"),
                    ["o_orderkey"])
    return tx_changes_rows(spark, table, 0, 2, "o_orderkey").select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("_change_type").alias("change_type"))


_CDF_ROWS_ORACLE = """
WITH mx AS (SELECT MAX(o_orderkey) AS hi FROM orders),
base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
)
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       'update_preimage' AS change_type
FROM base WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey, 'U',
       CAST(round(o_totalprice * 2 * 100) AS BIGINT),
       'update_postimage'
FROM base WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT), 'delete'
FROM base WHERE o_orderkey % 7 <> 0 AND o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey + hi + 1, 'N',
       CAST(round(o_totalprice * 100) AS BIGINT), 'insert'
FROM base, mx WHERE o_orderkey % 13 = 0
"""


MERGE_DELETE_UPDATE_BELOW = 150000.0  # conditional-update price gate


def acid_orders_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered MERGE-with-clauses entry, STRICT VALUE oracle: load
    orders into the tx table through a CHECKPOINTED log (append,
    tx_checkpoint, tx_clean_log — so the read path under the merge is
    the checkpoint+tail form), then MERGE a source with the full Delta
    clause set: every 5th key arrives status 'D' (WHEN MATCHED AND
    status='D' THEN DELETE), every 7th key (not %5) arrives 'U' at
    double price (conditional UPDATE: only when the source price is
    below MERGE_DELETE_UPDATE_BELOW — the rest retain the TARGET row),
    every 11th key (not %5/%7) arrives with NULL status at triple
    price (the delete condition evaluates NULL → must NOT fire — the
    tx_delete_where NULL lesson, pinned at the driver), and every 13th
    key re-inserts beyond the key space as 'N'. The oracle rebuilds
    the merged table clause-by-clause in SQL; the NULL-status group in
    the output hashes the NULL-safety, and the kept-target rows hash
    the conditional-update fall-through."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    hi = orders.agg(F.max("o_orderkey")).first()[0] or 0
    table = tempfile.mkdtemp(prefix="txlog_mergedel_")
    tx_append(orders.repartitionByRange(8, "o_orderkey")
              .sortWithinPartitions("o_orderkey"), table, ["o_orderkey"])
    tx_checkpoint(table)
    tx_clean_log(table)  # merge must read through the checkpoint
    k = F.col("o_orderkey")
    src = orders.filter((k % 5 == 0) | (k % 7 == 0) | (k % 11 == 0)).select(
        "o_orderkey",
        F.when(k % 5 == 0, F.lit("D"))
        .when(k % 7 == 0, F.lit("U"))
        .otherwise(F.lit(None).cast("string")).alias("o_orderstatus"),
        F.when(k % 5 == 0, F.col("o_totalprice"))
        .when(k % 7 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice") * 3).alias("o_totalprice"),
    ).unionByName(
        orders.filter(k % 13 == 0).select(
            (k + hi + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"), "o_totalprice")
    )
    tx_merge(
        spark, table, src, "o_orderkey", ["o_orderkey"],
        matched_delete=("o_orderstatus", "=", "D"),
        matched_update_condition=(
            "o_totalprice", "<", MERGE_DELETE_UPDATE_BELOW),
    )
    return read_table(spark, table).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("total_cents"),
    )


_MERGE_DELETE_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
mx AS (SELECT MAX(o_orderkey) AS hi FROM orders),
src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'D'
              WHEN o_orderkey % 7 = 0 THEN 'U'
              ELSE NULL END AS s_status,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice
              WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice * 3 END AS s_price
  FROM base
  WHERE o_orderkey % 5 = 0 OR o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
  UNION ALL
  SELECT o_orderkey + hi + 1, 'N', o_totalprice
  FROM base, mx WHERE o_orderkey % 13 = 0
),
flags AS (
  SELECT s.o_orderkey, s.s_status, s.s_price,
         (b.o_orderkey IS NOT NULL) AS matched,
         COALESCE(s.s_status = 'D', FALSE) AS del_f,
         COALESCE(s.s_price < {MERGE_DELETE_UPDATE_BELOW}, FALSE) AS upd_f
  FROM src s LEFT JOIN base b ON b.o_orderkey = s.o_orderkey
),
merged AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
  FROM base b LEFT JOIN flags f ON f.o_orderkey = b.o_orderkey
  WHERE f.o_orderkey IS NULL OR (NOT f.del_f AND NOT f.upd_f)
  UNION ALL
  SELECT o_orderkey, s_status, s_price FROM flags
  WHERE (NOT matched) OR (NOT del_f AND upd_f)
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM merged GROUP BY o_orderstatus
"""

def acid_orders_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered RESTORE entry, STRICT VALUE oracle: append lower
    half, append upper half, DELETE the filled orders, then RESTORE
    to the pre-delete version — and time-travel to every version of
    the 4-commit life. The oracle states the restore's contract
    analytically (version 3 must equal version 1 exactly), so one
    hash proves the metadata-only rollback rebuilt the old live set,
    the restored schema read works, and nothing else moved."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2 if lo is not None else 0
    table = tempfile.mkdtemp(prefix="txlog_restore_")
    stats = ["o_orderkey", "o_orderstatus"]
    tx_append(orders.filter(F.col("o_orderkey") <= mid)
              .repartition(4), table, stats)
    tx_append(orders.filter(F.col("o_orderkey") > mid)
              .repartition(4), table, stats)
    tx_delete_where(spark, table, ("o_orderstatus", "=", "F"), stats)
    v = tx_restore(table, 1)
    assert v == 3
    out = None
    for ver in range(latest_version(table) + 1):
        snap = read_table(spark, table, version=ver).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"),
        ).select(F.lit(ver).cast("long").alias("version"),
                 "n_orders", "total_cents")
        out = snap if out is None else out.unionByName(snap)
    return out


_RESTORE_ORACLE = """
WITH m AS (
  SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS mid FROM orders
),
c AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(0 AS BIGINT) AS version,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM c, m WHERE o_orderkey <= mid
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM c
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT)
FROM c WHERE o_orderstatus <> 'F'
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM c
"""

def acid_orders_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry, STRICT VALUE oracle — deletion vectors
    end-to-end: append lower/upper halves, DV-delete filled orders
    (zero files rewritten), a SECOND DV-delete of a key range
    (vectors ACCUMULATE on the same files), then compact (folds the
    DVs away). Emits per version (version, n_orders, total_cents,
    metadata_only) where metadata_only is the driver-observed "this
    commit changed NO data file" witness — the oracle hard-codes the
    expected booleans, so a DV delete that ever rewrites a file (or a
    compact that doesn't) hash-mismatches, alongside any value error
    in the merge-on-read row masking, DV accumulation, time travel
    across DV versions, or the compaction fold."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2 if lo is not None else 0
    q = lo + (hi - lo) // 4 if lo is not None else 0
    table = tempfile.mkdtemp(prefix="txlog_dv_")
    stats = ["o_orderkey", "o_orderstatus"]
    tx_append(orders.filter(F.col("o_orderkey") <= mid)
              .repartition(4), table, stats)
    tx_append(orders.filter(F.col("o_orderkey") > mid)
              .repartition(4), table, stats)
    tx_delete_where(spark, table, ("o_orderstatus", "=", "F"), stats,
                    deletion_vectors=True)
    tx_delete_where(spark, table, ("o_orderkey", "<=", q), stats,
                    deletion_vectors=True)
    tx_compact(spark, table, 1, stats)
    files_at = [sorted(f for f in snapshot_files(table, v)
                       if not f.split("/")[1].startswith("dv-"))
                for v in range(latest_version(table) + 1)]
    out = None
    for v in range(latest_version(table) + 1):
        meta_only = v > 0 and files_at[v] == files_at[v - 1]
        snap = read_table(spark, table, version=v).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"),
        ).select(F.lit(v).cast("long").alias("version"),
                 "n_orders", "total_cents",
                 F.lit(meta_only).alias("metadata_only"))
        out = snap if out is None else out.unionByName(snap)
    return out


_DV_ORACLE = """
WITH m AS (
  SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS mid,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 4 AS q
  FROM orders
),
c AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       FALSE AS metadata_only
FROM c, m WHERE o_orderkey <= mid
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE FROM c
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c WHERE o_orderstatus <> 'F'
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c, m WHERE o_orderstatus <> 'F' AND o_orderkey > q
UNION ALL
SELECT 4, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE
FROM c, m WHERE o_orderstatus <> 'F' AND o_orderkey > q
"""


def acid_orders_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered DV-MERGE entry, STRICT VALUE oracle — merge-on-read
    upserts end-to-end (r13 verdict item 2): append orders
    (range-clustered files), then TWO deletion-vector MERGEs — first
    the full clause set (%5 keys arrive 'D' → WHEN MATCHED DELETE;
    %7 keys (not %5) arrive 'U' at double price → update; %11 keys
    (not %5/%7) arrive with NULL status at triple price — NULL must
    not fire the delete clause but the unconditional update does; %13
    keys re-insert beyond the key space as 'N'), then a plain DV
    upsert (%3 keys → 'X' at quadruple price) so vectors ACCUMULATE
    on the same files — and finally a compact that folds every DV
    away. Emits per (version, status): counts, integer cents, and
    `prev_files_preserved` — the driver-observed witness that the
    merge commits removed ZERO data files (every file of version v-1
    still live at v; hard-coded TRUE for both merges and FALSE for
    the compact in the oracle, so a DV merge that ever rewrites a
    file on the matched side hash-mismatches)."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    hi = orders.agg(F.max("o_orderkey")).first()[0] or 0
    table = tempfile.mkdtemp(prefix="txlog_mergedv_")
    tx_append(orders.repartitionByRange(8, "o_orderkey")
              .sortWithinPartitions("o_orderkey"), table, ["o_orderkey"])
    k = F.col("o_orderkey")
    src1 = orders.filter(
        (k % 5 == 0) | (k % 7 == 0) | (k % 11 == 0)).select(
        "o_orderkey",
        F.when(k % 5 == 0, F.lit("D"))
        .when(k % 7 == 0, F.lit("U"))
        .otherwise(F.lit(None).cast("string")).alias("o_orderstatus"),
        F.when(k % 5 == 0, F.col("o_totalprice"))
        .when(k % 7 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice") * 3).alias("o_totalprice"),
    ).unionByName(
        orders.filter(k % 13 == 0).select(
            (k + hi + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"), "o_totalprice")
    )
    tx_merge(spark, table, src1, "o_orderkey", ["o_orderkey"],
             matched_delete=("o_orderstatus", "=", "D"),
             deletion_vectors=True)
    src2 = orders.filter(k % 3 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 4).alias("o_totalprice"))
    tx_merge(spark, table, src2, "o_orderkey", ["o_orderkey"],
             deletion_vectors=True)
    tx_compact(spark, table, 1, ["o_orderkey"])
    files_at = [sorted(snapshot_files(table, v))
                for v in range(latest_version(table) + 1)]
    out = None
    for v in range(latest_version(table) + 1):
        preserved = v > 0 and set(files_at[v - 1]) <= set(files_at[v])
        snap = read_table(spark, table, version=v).groupBy(
            "o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"),
        ).select(F.lit(v).cast("long").alias("version"),
                 "o_orderstatus", "n_orders", "total_cents",
                 F.lit(preserved).alias("prev_files_preserved"))
        out = snap if out is None else out.unionByName(snap)
    return out


_MERGE_DV_ORACLE = """
WITH mx AS (SELECT MAX(o_orderkey) AS hi FROM orders),
base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
src1 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'D'
              WHEN o_orderkey % 7 = 0 THEN 'U'
              ELSE NULL END AS o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice
              WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice * 3 END AS o_totalprice
  FROM base
  WHERE o_orderkey % 5 = 0 OR o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
  UNION ALL
  SELECT o_orderkey + hi + 1, 'N', o_totalprice
  FROM base, mx WHERE o_orderkey % 13 = 0
),
m1 AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
  FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM src1)
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM src1
  WHERE o_orderstatus IS DISTINCT FROM 'D'
),
src2 AS (
  SELECT o_orderkey, 'X' AS o_orderstatus,
         o_totalprice * 4 AS o_totalprice
  FROM base WHERE o_orderkey % 3 = 0
),
m2 AS (
  SELECT * FROM m1
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src2)
  UNION ALL
  SELECT * FROM src2
),
v0 AS (SELECT * FROM base),
agg AS (
  SELECT CAST(0 AS BIGINT) AS version, o_orderstatus,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
         FALSE AS prev_files_preserved
  FROM v0 GROUP BY o_orderstatus
  UNION ALL
  SELECT 1, o_orderstatus, COUNT(*),
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
         TRUE
  FROM m1 GROUP BY o_orderstatus
  UNION ALL
  SELECT 2, o_orderstatus, COUNT(*),
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
         TRUE
  FROM m2 GROUP BY o_orderstatus
  UNION ALL
  SELECT 3, o_orderstatus, COUNT(*),
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
         FALSE
  FROM m2 GROUP BY o_orderstatus
)
SELECT * FROM agg
"""


def acid_orders_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered COLUMN-RENAME entry, STRICT VALUE oracle — column
    mapping end-to-end (r13 verdict item 3): append the lower half of
    orders, RENAME o_totalprice → price_usd (one metadata-only
    commit), append the upper half UNDER THE NEW NAME (files keep
    writing the physical name), then checkpoint + clean the log (the
    mapping must survive via the checkpoint footer) and read back
    every version plus a stats-pruned `where=` on the RENAMED column.
    Emits (version, n_orders, total_cents, metadata_only): the cents
    always come through the price column under whatever name the
    version's contract gives it — a broken mapping NULL-backfills the
    renamed column and the totals hash-mismatch; the rename version's
    hard-coded metadata_only=TRUE witnesses zero files touched; the
    version-99 row is the pruned post-clean read (colmap resolved
    from the checkpoint, stats keyed by the physical name)."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2 if lo is not None else 0
    table = tempfile.mkdtemp(prefix="txlog_rename_")
    stats = ["o_orderkey", "o_totalprice"]
    tx_append(orders.filter(F.col("o_orderkey") <= mid)
              .repartition(4), table, stats)
    tx_rename_column(table, "o_totalprice", "price_usd")
    tx_append(orders.filter(F.col("o_orderkey") > mid)
              .withColumnRenamed("o_totalprice", "price_usd")
              .repartition(4), table, ["o_orderkey", "price_usd"])
    files_at = [sorted(snapshot_files(table, v))
                for v in range(latest_version(table) + 1)]
    out = None
    for v in range(latest_version(table) + 1):
        meta_only = v > 0 and files_at[v] == files_at[v - 1]
        snap = read_table(spark, table, version=v)
        price = "price_usd" if "price_usd" in snap.columns \
            else "o_totalprice"
        row = snap.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col(price) * 100).cast("long"))
            .alias("total_cents"),
        ).select(F.lit(v).cast("long").alias("version"),
                 "n_orders", "total_cents",
                 F.lit(meta_only).alias("metadata_only"))
        out = row if out is None else out.unionByName(row)
    # the version reads above are planned (files resolved) pre-clean;
    # the pruned read below must resolve colmap + stats THROUGH the
    # checkpoint — the survival witness
    tx_checkpoint(table)
    tx_clean_log(table)
    pruned = read_table(spark, table,
                        where=("o_orderkey", ">", mid)).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("price_usd") * 100).cast("long"))
        .alias("total_cents"),
    ).select(F.lit(99).cast("long").alias("version"),
             "n_orders", "total_cents",
             F.lit(True).alias("metadata_only"))
    return out.unionByName(pruned)


_RENAME_ORACLE = """
WITH m AS (
  SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS mid FROM orders
),
c AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(0 AS BIGINT) AS version,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents,
       FALSE AS metadata_only
FROM c, m WHERE o_orderkey <= mid
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c, m WHERE o_orderkey <= mid
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE FROM c
UNION ALL
SELECT 99, COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c, m WHERE o_orderkey > mid
"""


def acid_orders_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered PARTITIONED-TABLE entry, STRICT VALUE oracle (r13
    verdict item 4): create an orders table hive-partitioned by
    o_orderstatus (partition values typed in the log), append both
    halves, then read it three ways — full (per-status rollup proves
    the partition column re-materializes from the directory names), a
    partition-pruned `where=` (the witness column pins, from the
    ACTUAL scanned file list, that a partition predicate never touches
    another partition's files AND scanned strictly fewer files than
    live), and a stats-range read WITHIN partitions. A DV delete in
    between proves merge-on-read works on the nested layout. The
    pruned read runs after checkpoint+clean (the spec survives via the
    checkpoint footer)."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2 if lo is not None else 0
    q = lo + (hi - lo) // 4 if lo is not None else 0
    table = tempfile.mkdtemp(prefix="txlog_part_")
    tx_append(orders.filter(F.col("o_orderkey") <= mid)
              .repartition(2), table, ["o_orderkey"],
              partition_by=["o_orderstatus"])
    tx_append(orders.filter(F.col("o_orderkey") > mid)
              .repartition(2), table, ["o_orderkey"])
    # merge-on-read on the nested layout: DV the low quarter
    tx_delete_where(spark, table, ("o_orderkey", "<=", q),
                    ["o_orderkey"], deletion_vectors=True)
    tx_checkpoint(table)
    tx_clean_log(table)

    def _cents(df):
        return df.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"))

    full = read_table(spark, table).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("total_cents"),
    ).select(F.concat(F.lit("full:"), F.col("o_orderstatus")).alias("grp"),
             "n_orders", "total_cents",
             F.lit(False).alias("scan_pruned"))
    def _data_files(df):  # inputFiles also lists the DV anti-join side
        return [f for f in df.inputFiles() if "/data/dv-" not in f]

    pr = read_table(spark, table, where=("o_orderstatus", "=", "F"))
    pfiles = _data_files(pr)
    pruned_ok = (len(pfiles) > 0
                 and all("o_orderstatus=F/" in f for f in pfiles)
                 and len(pfiles) < len(snapshot_files(table)))
    pruned = _cents(pr).select(
        F.lit("pruned:F").alias("grp"), "n_orders", "total_cents",
        F.lit(pruned_ok).alias("scan_pruned"))
    rg = read_table(spark, table, where=("o_orderkey", ">", mid))
    range_ok = 0 < len(_data_files(rg)) < len(snapshot_files(table))
    ranged = _cents(rg).select(
        F.lit("range").alias("grp"), "n_orders", "total_cents",
        F.lit(range_ok).alias("scan_pruned"))
    return full.unionByName(pruned).unionByName(ranged)


_PARTITIONED_ORACLE = """
WITH m AS (
  SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS mid,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 4 AS q
  FROM orders
),
c AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, m WHERE o_orderkey > q
)
SELECT 'full:' || o_orderstatus AS grp, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       FALSE AS scan_pruned
FROM c GROUP BY o_orderstatus
UNION ALL
SELECT 'pruned:F', COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c WHERE o_orderstatus = 'F'
UNION ALL
SELECT 'range', COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c, m WHERE o_orderkey > mid
"""


def acid_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered CHECK-AUDIT entry, STRICT VALUE oracle (r13 verdict
    item 7 — the A20 constraint surface made one-SQL-observable):
    append the lower half of orders, evolve with the upper half
    carrying a NEW `o_priority_flag` column (lower-half rows are NULL
    there — the three-valued-logic lane), record three constraints
    (all must validate the existing data to be recordable), then emit
    the `check_audit` readout. One hash pins the per-constraint
    pass/violate/unknown counts: n_unknown must equal exactly the
    pre-evolution row count for the flag constraint (NULL passes the
    write contract but is counted separately), and every committed
    table must audit n_violate = 0."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2 if lo is not None else 0
    table = tempfile.mkdtemp(prefix="txlog_checks_")
    tx_append(orders.filter(F.col("o_orderkey") <= mid)
              .repartition(4), table, ["o_orderkey"])
    tx_append(orders.filter(F.col("o_orderkey") > mid)
              .withColumn("o_priority_flag",
                          (F.col("o_orderkey") % 3).cast("int"))
              .repartition(4), table, ["o_orderkey"],
              allow_schema_evolution=True)
    tx_set_check(spark, table, "totalprice_pos",
                 ("o_totalprice", ">", 0.0))
    tx_set_check(spark, table, "flag_nonneg",
                 ("o_priority_flag", ">=", 0))
    tx_set_check(spark, table, "orderkey_min",
                 ("o_orderkey", ">=", int(lo or 0)))
    return check_audit(spark, table)


_CHECKS_ORACLE = """
WITH m AS (
  SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS mid,
         MIN(o_orderkey) AS lo
  FROM orders
),
t AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderkey > mid
              THEN CAST(o_orderkey % 3 AS INTEGER) END AS flag
  FROM orders, m
)
SELECT 'flag_nonneg' AS constraint_name, 'o_priority_flag' AS col,
       '>=' AS op, '0' AS value_str,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN flag >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass,
       CAST(0 AS BIGINT) AS n_violate,
       CAST(SUM(CASE WHEN flag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unknown
FROM t
UNION ALL
SELECT 'orderkey_min', 'o_orderkey', '>=',
       CAST((SELECT lo FROM m) AS VARCHAR),
       COUNT(*), COUNT(*), 0, 0
FROM t
UNION ALL
SELECT 'totalprice_pos', 'o_totalprice', '>', '0.0',
       COUNT(*), COUNT(*), 0, 0
FROM t
"""


def acid_orders_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered OPTIMIZE entry, STRICT VALUE oracle (r14 — the
    bin-packing small-file compaction): append 60% of orders as ONE
    big file, then three small incremental slices (the nightly-drop
    shape that accretes small files), DV-delete a key range (the
    vector rides on a small file), then `tx_optimize` with the big
    file's size as the target — ONLY the small files (and the DV) may
    be packed. Emits per version (version, n_orders, total_cents,
    big_untouched): the final row's hard-coded big_untouched=TRUE
    witnesses that the pack left the at-target file alone AND shrank
    the file count — an optimize that rewrites the big file (or packs
    nothing) hash-mismatches, alongside any value error in the pack's
    DV fold."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    lo, hi = lo or 0, hi or 0
    b0 = lo + (hi - lo) * 6 // 10
    c1 = b0 + (hi - b0) // 3
    c2 = b0 + 2 * (hi - b0) // 3
    e = c2 + (hi - c2) // 2
    table = tempfile.mkdtemp(prefix="txlog_opt_")
    k = F.col("o_orderkey")
    tx_append(orders.filter(k <= b0).repartition(1), table,
              ["o_orderkey"])
    tx_append(orders.filter((k > b0) & (k <= c1)).repartition(1),
              table, ["o_orderkey"])
    tx_append(orders.filter((k > c1) & (k <= c2)).repartition(1),
              table, ["o_orderkey"])
    tx_append(orders.filter(k > c2).repartition(1), table,
              ["o_orderkey"])
    tx_delete_where(spark, table, ("o_orderkey", ">", e),
                    ["o_orderkey"], deletion_vectors=True)
    live0 = snapshot_files(table, 0)
    big_file = next(iter(live0))
    big_bytes = live0[big_file]["bytes"]
    tx_optimize(spark, table, target_file_bytes=big_bytes,
                stats_cols=["o_orderkey"])
    files_at = [sorted(snapshot_files(table, v))
                for v in range(latest_version(table) + 1)]
    out = None
    for v in range(latest_version(table) + 1):
        final = v == latest_version(table)
        untouched = (final and big_file in files_at[v]
                     and len(files_at[v]) < len(files_at[v - 1]))
        snap = read_table(spark, table, version=v).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"),
        ).select(F.lit(v).cast("long").alias("version"),
                 "n_orders", "total_cents",
                 F.lit(untouched).alias("big_untouched"))
        out = snap if out is None else out.unionByName(snap)
    return out


_OPTIMIZE_ORACLE = """
WITH m AS (
  SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders
),
b AS (
  SELECT lo, hi,
         lo + (hi - lo) * 6 // 10 AS b0
  FROM m
),
b2 AS (
  SELECT *, b0 + (hi - b0) // 3 AS c1,
         b0 + 2 * (hi - b0) // 3 AS c2
  FROM b
),
b3 AS (
  SELECT *, c2 + (hi - c2) // 2 AS e FROM b2
),
c AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       FALSE AS big_untouched
FROM c, b3 WHERE k <= b0
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE
FROM c, b3 WHERE k <= c1
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE
FROM c, b3 WHERE k <= c2
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE FROM c
UNION ALL
SELECT 4, COUNT(*), CAST(SUM(cents) AS BIGINT), FALSE
FROM c, b3 WHERE k <= e
UNION ALL
SELECT 5, COUNT(*), CAST(SUM(cents) AS BIGINT), TRUE
FROM c, b3 WHERE k <= e
"""


TXLOG_QUERIES = {
    "acid_orders_ledger": acid_orders_ledger,
    "acid_orders_dv": acid_orders_dv,
    "acid_orders_merge": acid_orders_merge,
    "acid_orders_merge_dv": acid_orders_merge_dv,
    "acid_orders_rename": acid_orders_rename,
    "acid_orders_partitioned": acid_orders_partitioned,
    "acid_orders_checks": acid_orders_checks,
    "acid_orders_optimize": acid_orders_optimize,
    "acid_orders_cdf": acid_orders_cdf,
    "acid_orders_cdf_rows": acid_orders_cdf_rows,
    "acid_orders_merge_delete": acid_orders_merge_delete,
    "acid_orders_restore": acid_orders_restore,
}
TXLOG_ORACLES = {
    "acid_orders_ledger": _ACID_ORACLE,
    "acid_orders_dv": _DV_ORACLE,
    "acid_orders_merge": _MERGE_ORACLE,
    "acid_orders_merge_dv": _MERGE_DV_ORACLE,
    "acid_orders_rename": _RENAME_ORACLE,
    "acid_orders_partitioned": _PARTITIONED_ORACLE,
    "acid_orders_checks": _CHECKS_ORACLE,
    "acid_orders_optimize": _OPTIMIZE_ORACLE,
    "acid_orders_cdf": _CDF_ORACLE,
    "acid_orders_cdf_rows": _CDF_ROWS_ORACLE,
    "acid_orders_merge_delete": _MERGE_DELETE_ORACLE,
    "acid_orders_restore": _RESTORE_ORACLE,
}
