"""Iceberg-style versioned table seam over parquet.

The north-star input is "an Iceberg table of Common-Crawl-style web pages"
(BASELINE.json input_hint). This sandbox has no Iceberg runtime jar
(SURVEY.md §7), so this module provides the same *table contract* —
snapshot isolation, atomic commits, time travel, and manifest-driven file
pruning — over plain parquet, behind a seam a production deployment swaps
for real Iceberg (`spark.read.format("iceberg")`) without touching any
operator code: everything downstream consumes a plain DataFrame.

Layout (Iceberg-shaped, json manifests instead of avro):

    root/
      metadata/
        v<N>.metadata.json   one manifest per snapshot: operation,
                             parent, partition spec, data files with
                             per-file row counts + per-column min/max
                             (harvested from parquet footers, no data read)
        version-hint.text    current snapshot pointer; commits swap it by
                             atomic os.replace, readers never see a torn
                             table
      data/<commit-uuid>/    immutable data files (hive-partitioned when
                             partition_by is set); overwrites only ever
                             *stop referencing* files, never delete them,
                             so time travel stays valid

Scale notes (explicit):
- The manifest lists every live data file. At 100 TB / ~1e5 files the json
  is a few MB — fine for a driver; real Iceberg's avro manifest-list tree
  is the production answer and slots in behind the same seam.
- ``scan`` prunes at three levels before Spark ever plans: snapshot
  (time travel), partition values (parsed from hive paths), and per-file
  column min/max ranges — the same pruning order Iceberg applies. The
  surviving file list goes to ``spark.read.parquet(*files)`` WITH the
  predicate re-applied, so Catalyst still does row-group and row level
  filtering inside each file.
- Commits are optimistic: a commit built against snapshot N fails with
  ``CommitConflict`` if the table has moved past N, mirroring Iceberg's
  retry contract; the manifest publish itself is a create-exclusive
  link(2), so two racers from the same parent cannot both land.
- Schema evolution is metadata-only (``add_columns`` / ``drop_columns``):
  data files are immutable; every scan applies the manifest schema
  explicitly, so pre-evolution files yield null for added columns and
  dropped columns are projected away (older snapshots still see them).
- Deletes are merge-on-read equality deletes (Iceberg v2): ``delete``
  writes the key tuples as an immutable delete file; scans anti-join them
  out, applying each delete only to data files with a lower sequence
  number (a row re-appended after the delete survives). ``compact``
  materializes and purges outstanding deletes by rewriting.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_VERSION_HINT = "version-hint.text"


class CommitConflict(RuntimeError):
    """Another commit landed first; re-read and retry (Iceberg semantics)."""


@dataclass(frozen=True)
class FileEntry:
    path: str                      # relative to table root
    rows: int
    partition: dict[str, str]      # hive partition values (may be empty)
    stats: dict[str, dict]         # col -> {"min": .., "max": ..} (best effort)
    seq: int = 0                   # snapshot that added the file (Iceberg
    #                                sequence number; 0 = legacy pre-seq file)

    def to_json(self) -> dict:
        return {"path": self.path, "rows": self.rows,
                "partition": self.partition, "stats": self.stats,
                "seq": self.seq}

    @staticmethod
    def from_json(d: dict) -> "FileEntry":
        return FileEntry(d["path"], d["rows"], d["partition"], d["stats"],
                         d.get("seq", 0))


def _jsonable(v: Any) -> Any:
    """Parquet footer stats -> json-safe scalar (bytes decoded, else str)."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)


def _footer_stats(abs_path: str) -> tuple[int, dict[str, dict]]:
    """(rows, per-column {min, max}) from the parquet footer only."""
    f = pq.ParquetFile(abs_path)
    rows = f.metadata.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    ok: set[str] = set()
    for rg in range(f.metadata.num_row_groups):
        g = f.metadata.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if st is None or not st.has_min_max:
                ok.discard(name)
                continue
            if rg == 0:
                ok.add(name)
            if name in ok:
                mins[name] = st.min if name not in mins else min(
                    mins[name], st.min)
                maxs[name] = st.max if name not in maxs else max(
                    maxs[name], st.max)
    stats = {}
    for name in ok:
        lo, hi = _jsonable(mins.get(name)), _jsonable(maxs.get(name))
        if lo is not None and hi is not None:
            stats[name] = {"min": lo, "max": hi}
    return rows, stats


def _partition_values(rel_path: str) -> dict[str, str]:
    """Hive path segments ``k=v`` -> partition dict (values url-decoded the
    way Spark writes them is not needed for our deterministic columns)."""
    out = {}
    for seg in rel_path.split("/"):
        if "=" in seg and not seg.endswith(".parquet"):
            k, _, v = seg.partition("=")
            out[k] = v
    return out


class Table:
    """One versioned table rooted at ``root`` (local or any fuse-posix path).

    Thread-model: single writer per commit attempt, optimistic conflict
    detection across writers; readers are lock-free (they resolve the
    version pointer once and then touch only immutable files).
    """

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")

    # ------------------------------------------------------------ versions

    def current_version(self) -> int:
        """0 = empty table (no committed snapshot yet)."""
        try:
            with open(os.path.join(self.meta_dir, _VERSION_HINT)) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def snapshots(self) -> list[int]:
        return list(range(1, self.current_version() + 1))

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v < 1:
            raise ValueError("table has no committed snapshot")
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as fh:
            return json.load(fh)

    def files(self, version: int | None = None) -> list[FileEntry]:
        return [FileEntry.from_json(d) for d in self.manifest(version)["files"]]

    # ------------------------------------------------------------- commits

    def commit(self, df: DataFrame, mode: str = "append",
               partition_by: list[str] | None = None,
               operation: str | None = None,
               max_retries: int = 4) -> int:
        """Write ``df`` as a new snapshot; returns the snapshot id.

        ``append`` keeps the parent snapshot's files; ``overwrite`` starts
        the file list fresh (old files stay on disk for time travel).
        The data write happens BEFORE the metadata swap — a crash mid-commit
        leaves an orphan data dir and an unchanged table, never corruption.
        ``operation`` overrides the manifest's operation label (observability
        only — e.g. ``compact``).

        Contention: on ``CommitConflict`` the commit is REBASED onto the new
        parent and retried up to ``max_retries`` times (Iceberg-client
        behavior) — the expensive data write happens exactly once; only the
        manifest (parent's file list + our files with a fresh sequence
        number) is rebuilt per attempt. ``max_retries=0`` restores
        fail-fast semantics.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode {mode!r}")
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", commit_id)
        out_dir = os.path.join(self.root, rel_dir)
        writer = df.write.mode("error")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_dir)

        raw_files: list[tuple[str, int, dict, dict]] = []
        for dirpath, _dirs, names in sorted(os.walk(out_dir)):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                abs_path = os.path.join(dirpath, name)
                rel = os.path.relpath(abs_path, self.root)
                rows, stats = _footer_stats(abs_path)
                raw_files.append((rel, rows, _partition_values(rel), stats))

        def build(base: int) -> dict:
            new_files = [FileEntry(rel, rows, parts, stats, base + 1)
                         for rel, rows, parts, stats in raw_files]
            prev = self.files(base) if (mode == "append" and base >= 1) else []
            prev_deletes = (self.manifest(base).get("delete_files", [])
                            if (mode == "append" and base >= 1) else [])
            return {
                "format": "hpr-table/2",
                "snapshot_id": base + 1,
                "parent_id": base or None,
                "operation": operation or mode,
                "partition_by": partition_by or [],
                "schema": df.schema.json(),
                "files": [f.to_json() for f in prev + new_files],
                "delete_files": prev_deletes,
            }

        return self._publish_with_retries(build, commit_id, max_retries)

    def _publish_with_retries(self, build, commit_id: str,
                              max_retries: int) -> int:
        """Optimistic-retry wrapper: resolve the current parent, build the
        manifest against it via ``build(base)``, attempt the atomic publish;
        on ``CommitConflict`` re-resolve and rebuild (the new parent's file
        list / delete list / schema are re-read inside ``build``) up to
        ``max_retries`` extra attempts."""
        attempt = 0
        while True:
            base = self.current_version()
            try:
                return self._publish(build(base), base, commit_id)
            except CommitConflict:
                attempt += 1
                if attempt > max_retries:
                    raise

    def _publish(self, manifest: dict, base: int, commit_id: str) -> int:
        """Atomically publish ``manifest`` as snapshot base+1.

        Optimistic concurrency: publish with a create-exclusive hard link —
        two writers racing from the same parent both pass any check-then-act
        test, but only one link(2) can create v{N+1}; the loser gets EEXIST
        and a CommitConflict to retry on the new parent.
        """
        os.makedirs(self.meta_dir, exist_ok=True)
        meta_path = os.path.join(self.meta_dir, f"v{base + 1}.metadata.json")
        tmp = meta_path + f".tmp-{commit_id}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        if self.current_version() != base:
            os.unlink(tmp)
            raise CommitConflict(
                f"table moved past v{base} during commit; retry")
        try:
            os.link(tmp, meta_path)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflict(
                f"concurrent writer published v{base + 1}; retry") from None
        os.unlink(tmp)
        hint_tmp = os.path.join(self.meta_dir, f".hint-{commit_id}")
        with open(hint_tmp, "w") as fh:
            fh.write(str(base + 1))
        os.replace(hint_tmp, os.path.join(self.meta_dir, _VERSION_HINT))
        return base + 1

    # ------------------------------------------------- schema evolution

    def add_columns(self, fields: list[tuple[str, str]],
                    max_retries: int = 4) -> int:
        """Metadata-only schema evolution: append nullable columns
        (Iceberg add-column). Existing data files are untouched; reads fill
        the new columns with null for pre-evolution files because every
        scan applies the manifest schema explicitly. Retries on contention
        re-read the new parent's schema and re-validate."""
        from pyspark.sql.types import DataType, StructType

        def build(base: int) -> dict:
            man = self.manifest(base)
            schema = StructType.fromJson(json.loads(man["schema"]))
            for name, dtype in fields:
                if name in schema.fieldNames():
                    raise ValueError(f"column {name!r} already exists")
                # fromDDL accepts the full DDL type grammar ("int",
                # "string", "array<float>", ...); needs an active
                # SparkSession (commits are driver-side).
                schema = schema.add(name, DataType.fromDDL(dtype), True)
            return {
                **man,
                "snapshot_id": base + 1,
                "parent_id": base,
                "operation": "add-columns",
                "schema": schema.json(),
            }

        return self._publish_with_retries(build, uuid.uuid4().hex[:12],
                                          max_retries)

    def drop_columns(self, names: list[str], max_retries: int = 4) -> int:
        """Metadata-only column drop: data files keep the bytes (time
        travel to older snapshots still sees them); current reads project
        them away via the manifest schema. Retries on contention re-read
        the new parent's schema and re-validate."""
        from pyspark.sql.types import StructType

        def build(base: int) -> dict:
            man = self.manifest(base)
            schema = StructType.fromJson(json.loads(man["schema"]))
            have = set(schema.fieldNames())
            missing = [n for n in names if n not in have]
            if missing:
                raise ValueError(f"no such column(s): {missing}")
            part = [n for n in names if n in (man["partition_by"] or [])]
            if part:
                raise ValueError(f"cannot drop partition column(s): {part}")
            new_schema = StructType([f for f in schema.fields
                                     if f.name not in set(names)])
            return {
                **man,
                "snapshot_id": base + 1,
                "parent_id": base,
                "operation": "drop-columns",
                "schema": new_schema.json(),
            }

        return self._publish_with_retries(build, uuid.uuid4().hex[:12],
                                          max_retries)

    # ------------------------------------------------ merge-on-read deletes

    def delete(self, keys: DataFrame, key_cols: list[str],
               max_retries: int = 4) -> int:
        """Equality delete (Iceberg v2 merge-on-read): write the distinct
        ``key_cols`` tuples of ``keys`` as an immutable delete file and
        commit a metadata snapshot referencing it. No data file is
        rewritten — readers anti-join the keys out at scan time, and the
        delete applies only to data files with a LOWER sequence number
        (rows appended after the delete are not affected, matching
        Iceberg's sequence-number semantics). ``compact`` purges deletes by
        rewriting.

        Contention: the delete file is written once; a retry rebases onto
        the new parent with a fresh sequence number and re-validates the
        key columns against the (possibly evolved) schema. A rebased
        equality delete also covers rows a concurrent append landed first —
        the serialized-after-the-append semantics of "delete where key in
        keys"."""
        schema_probe = self.manifest()  # validates table non-empty early
        probe_cols = {f["name"]
                      for f in json.loads(schema_probe["schema"])["fields"]}
        bad = [c for c in key_cols if c not in probe_cols]
        if bad:
            raise ValueError(f"delete key column(s) not in schema: {bad}")
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", f"{commit_id}-delete")
        out_dir = os.path.join(self.root, rel_dir)
        keys.select(*key_cols).distinct().write.mode("error").parquet(out_dir)
        raw_del = []
        for dirpath, _dirs, names in sorted(os.walk(out_dir)):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                abs_path = os.path.join(dirpath, name)
                rows, _stats = _footer_stats(abs_path)
                raw_del.append((os.path.relpath(abs_path, self.root), rows))

        def build(base: int) -> dict:
            man = self.manifest(base)
            cols = {f["name"] for f in json.loads(man["schema"])["fields"]}
            gone = [c for c in key_cols if c not in cols]
            if gone:
                raise ValueError(
                    f"delete key column(s) dropped concurrently: {gone}")
            del_files = [{
                "path": rel, "rows": rows,
                "key_cols": list(key_cols), "seq": base + 1,
            } for rel, rows in raw_del]
            return {
                **man,
                "snapshot_id": base + 1,
                "parent_id": base,
                "operation": "delete",
                "delete_files": man.get("delete_files", []) + del_files,
            }

        return self._publish_with_retries(build, commit_id, max_retries)

    def compact(self, spark: SparkSession, target_files: int = 8,
                sort_by: list[str] | None = None) -> int:
        """Rewrite the current snapshot into ``target_files`` larger files
        and commit the result as a new snapshot with identical rows — the
        maintenance pass a continuously-ingesting table needs (each
        streaming micro-batch appends small files; scan cost and task
        scheduling degrade with file count, not byte count).

        ``sort_by`` range-partitions and sorts the rewrite (e.g.
        ``["src"]`` on an edge table clusters each vertex's out-edges into
        one file, tightening per-file min/max stats so ``scan`` pruning
        actually prunes). Old files stay immutable on disk, so time travel
        to pre-compaction snapshots is unaffected. Partition layout is
        preserved.
        """
        man = self.manifest()
        df = self.read(spark)
        if sort_by:
            df = (df.repartitionByRange(target_files, *sort_by)
                  .sortWithinPartitions(*sort_by))
        else:
            df = df.coalesce(target_files)
        return self.commit(
            df, mode="overwrite",
            partition_by=man["partition_by"] or None,
            operation="compact")

    # -------------------------------------------------------------- reads

    def read(self, spark: SparkSession,
             snapshot: int | None = None) -> DataFrame:
        """The snapshot's rows as a DataFrame (time travel via ``snapshot``).

        Reads exactly the manifest's file list — concurrent commits after
        the manifest is resolved cannot change what this scan sees.
        """
        man = self.manifest(snapshot)
        return self._read_entries(spark, self.files(snapshot), man, snapshot)

    def _read_entries(self, spark: SparkSession, entries: list[FileEntry],
                      man: dict, snapshot: int | None) -> DataFrame:
        """Assemble a DataFrame from manifest entries: raw file read with
        the manifest schema applied, then merge-on-read equality deletes.

        A delete file applies to a data file iff the data file's sequence
        number is lower (Iceberg v2: rows appended after a delete are not
        deleted by it). Data files are grouped by seq so each group gets
        exactly the anti-joins it needs — the number of groups is bounded
        by the number of snapshots that added files, not file count."""
        from pyspark.sql.types import StructType
        schema = StructType.fromJson(json.loads(man["schema"]))
        if not entries:
            return spark.createDataFrame([], schema=schema)
        deletes = man.get("delete_files", [])
        live = [d for d in deletes
                if any(e.seq < d["seq"] for e in entries)]
        if not live:
            return self._read_raw(spark, entries, man, schema)
        out = None
        for seq in sorted({e.seq for e in entries}):
            grp = [e for e in entries if e.seq == seq]
            df = self._read_raw(spark, grp, man, schema)
            applicable: dict[tuple, list[dict]] = {}
            for d in live:
                if d["seq"] > seq:
                    applicable.setdefault(tuple(d["key_cols"]), []).append(d)
            for key_cols, ds in sorted(applicable.items()):
                kdf = spark.read.parquet(
                    *[os.path.join(self.root, d["path"]) for d in ds])
                df = df.join(kdf.select(*key_cols).distinct(),
                             on=list(key_cols), how="left_anti")
            out = df if out is None else out.unionByName(df)
        return out

    def _read_raw(self, spark: SparkSession, entries: list[FileEntry],
                  man: dict, schema) -> DataFrame:
        """Plain file-list read (no delete application). Partitioned
        commits are read per commit directory (each with its own basePath
        so hive partition columns resolve) and unioned — different commits
        need not share directory structure. The manifest schema is applied
        explicitly, so files written before an add-column evolution yield
        null for the new columns and dropped columns are projected away."""
        if not man["partition_by"]:
            return spark.read.schema(schema).parquet(
                *[os.path.join(self.root, e.path) for e in entries])
        groups: dict[str, list[str]] = {}
        for e in entries:
            parts = e.path.split("/")
            commit_dir = "/".join(parts[:2])  # data/<commit-uuid>
            groups.setdefault(commit_dir, []).append(
                os.path.join(self.root, e.path))
        dfs = [
            spark.read.schema(schema)
            .option("basePath", os.path.join(self.root, cd))
            .parquet(*paths)
            for cd, paths in sorted(groups.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def schema(self, snapshot: int | None = None):
        from pyspark.sql.types import StructType
        return StructType.fromJson(json.loads(self.manifest(snapshot)["schema"]))

    def scan(self, spark: SparkSession, col: str, lo=None, hi=None,
             snapshot: int | None = None) -> tuple[DataFrame, dict]:
        """Range scan ``lo <= col <= hi`` with manifest-level file pruning.

        Prunes via partition values when ``col`` is a partition column,
        else via per-file min/max footer stats; returns (DataFrame with the
        predicate applied row-level too, pruning report). Either bound may
        be None (half-open range).
        """
        entries = self.files(snapshot)
        man = self.manifest(snapshot)
        keep: list[FileEntry] = []
        for e in entries:
            if col in e.partition:
                # hive paths store partition values as strings; compare in
                # the bound's type so numeric ranges don't go lexicographic
                v: object = e.partition[col]
                bound = lo if lo is not None else hi
                if isinstance(bound, (int, float)):
                    try:
                        v = type(bound)(v)
                    except ValueError:
                        # partition value not coercible to the bound's type
                        # (e.g. numeric range over a string partition):
                        # pruning would be unsound and the raw comparison
                        # below would TypeError — keep the file; the
                        # row-level predicate still applies.
                        keep.append(e)
                        continue
                if (lo is not None and v < lo) or (hi is not None and v > hi):
                    continue
            elif col in e.stats:
                s = e.stats[col]
                if lo is not None and s["max"] < lo:
                    continue
                if hi is not None and s["min"] > hi:
                    continue
            keep.append(e)
        report = {"files_total": len(entries), "files_scanned": len(keep),
                  "files_pruned": len(entries) - len(keep)}
        df = self._read_entries(spark, keep, man, snapshot)
        from pyspark.sql import functions as F
        if lo is not None:
            df = df.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(col) <= F.lit(hi))
        return df, report
