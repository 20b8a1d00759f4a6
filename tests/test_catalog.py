"""Iceberg-style table seam: snapshots, time travel, atomic commits,
manifest pruning (sources/catalog.py) — the parquet stand-in for the
north-star's Iceberg input (SURVEY.md §7 environment note)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from haskellpagerank_spark.sources.catalog import CommitConflict, Table


def _events(spark, sf_dir="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_append_snapshots_and_time_travel(spark, tmp_path):
    t = Table(str(tmp_path / "t1"))
    ev = _events(spark)
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    assert t.current_version() == 0
    assert t.commit(a) == 1
    assert t.commit(b) == 2
    assert t.snapshots() == [1, 2]
    # current view = union of both commits
    assert t.read(spark).count() == ev.count()
    # time travel back to snapshot 1
    assert t.read(spark, snapshot=1).count() == a.count()
    got = t.read(spark, snapshot=1).agg(
        F.sum("event_id").alias("s")).first()["s"]
    want = a.agg(F.sum("event_id").alias("s")).first()["s"]
    assert got == want


def test_overwrite_keeps_old_snapshot_readable(spark, tmp_path):
    t = Table(str(tmp_path / "t2"))
    ev = _events(spark)
    t.commit(ev.limit(100))
    t.commit(ev.limit(10), mode="overwrite")
    assert t.read(spark).count() == 10
    assert t.read(spark, snapshot=1).count() == 100  # files never deleted


def test_partition_pruning(spark, tmp_path):
    t = Table(str(tmp_path / "t3"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev, partition_by=["event_type"])
    types = [r["event_type"] for r in
             ev.select("event_type").distinct().collect()]
    pick = sorted(types)[0]
    df, report = t.scan(spark, "event_type", lo=pick, hi=pick)
    assert report["files_pruned"] > 0
    assert df.count() == ev.where(F.col("event_type") == pick).count()
    # partition column round-trips through the hive path
    assert set(r["event_type"] for r in
               df.select("event_type").distinct().collect()) == {pick}


def test_minmax_stats_pruning(spark, tmp_path):
    """Two commits with disjoint sorted id ranges: a range scan over one
    range must not open the other commit's files."""
    t = Table(str(tmp_path / "t4"))
    ev = _events(spark).select("event_id", "value")
    lo_half = ev.where(F.col("event_id") < 500).coalesce(1)
    hi_half = ev.where(F.col("event_id") >= 500).coalesce(1)
    assert lo_half.count() > 0 and hi_half.count() > 0
    t.commit(lo_half)
    t.commit(hi_half)
    df, report = t.scan(spark, "event_id", lo=0, hi=200)
    assert report["files_total"] == 2
    assert report["files_scanned"] == 1
    assert df.count() == ev.where(F.col("event_id") <= 200).count()


def test_commit_conflict_detected(spark, tmp_path):
    """A commit built against a stale base must fail, not clobber."""
    root = str(tmp_path / "t5")
    t1, t2 = Table(root), Table(root)
    ev = _events(spark).limit(10)
    t1.commit(ev)
    # t2 wins the race for v2; t1's attempt against the same base loses
    t2.commit(ev)
    base = 1

    class Stale(Table):
        def current_version(self):  # freeze the base the loser saw
            return base
    with pytest.raises(CommitConflict):
        Stale(root).commit(ev)
    assert t1.current_version() == 2  # table unharmed


def test_concurrent_writers_both_land_via_retry(spark, tmp_path):
    """Two writers racing from the same parent: the loser's optimistic
    retry rebases onto the winner's snapshot and lands; no rows are lost
    and the loser's files carry the higher sequence number."""
    root = str(tmp_path / "t5r")
    ev = _events(spark).limit(20)
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    Table(root).commit(ev.limit(0))  # v1: empty seed, shared parent

    class Interleaved(Table):
        """Simulates the race: the first current_version() call (the one
        the commit builds against) returns the stale parent; by publish
        time a concurrent writer has landed v2."""
        def __init__(self, root, rival_df):
            super().__init__(root)
            self._rival = rival_df
            self._raced = False

        def current_version(self):
            v = super().current_version()
            if not self._raced:
                self._raced = True
                # rival lands v2 AFTER we resolved our base (v1)
                Table(self.root).commit(self._rival)
                return v
            return super().current_version()

    t_loser = Interleaved(root, rival_df=a)
    v = t_loser.commit(b)  # internally: conflict at v2, rebase, land v3
    assert v == 3
    t = Table(root)
    assert t.current_version() == 3
    # no rows lost: current view = rival's rows + loser's rows
    assert t.read(spark).count() == a.count() + b.count()
    got = {r.event_id for r in t.read(spark).collect()}
    want = {r.event_id for r in a.collect()} | {r.event_id for r in b.collect()}
    assert got == want
    # v1's seed wrote only a zero-row file (seq 1); the rival's data files
    # carry seq 2 and the rebased loser's seq 3
    assert {f.seq for f in t.files() if f.rows > 0} == {2, 3}


def test_delete_retry_rebases_onto_concurrent_append(spark, tmp_path):
    """An equality delete that loses the race to a concurrent append
    rebases with a higher sequence number, so it also covers the appended
    rows — serialized-after-the-append semantics."""
    root = str(tmp_path / "t5d")
    ev = _events(spark).limit(20).select("event_id", "event_type", "value")
    Table(root).commit(ev.where(F.col("event_id") % 2 == 0))

    class Interleaved(Table):
        def __init__(self, root, rival_df):
            super().__init__(root)
            self._rival = rival_df
            self._raced = False

        def current_version(self):
            v = super().current_version()
            if not self._raced:
                self._raced = True
                Table(self.root).commit(self._rival)
                return v
            return super().current_version()

    # rival appends the odd rows while we delete event_id % 4 == 0
    loser = Interleaved(root, rival_df=ev.where(F.col("event_id") % 2 == 1))
    keys = ev.where(F.col("event_id") % 4 == 0).select("event_id")
    v = loser.delete(keys, ["event_id"])
    assert v == 3
    got = {r.event_id for r in Table(root).read(spark).collect()}
    want = {r.event_id for r in ev.where(F.col("event_id") % 4 != 0).collect()}
    assert got == want  # delete seq > append seq: applies to both commits


def test_schema_and_manifest_shape(spark, tmp_path):
    t = Table(str(tmp_path / "t6"))
    ev = _events(spark).select("event_id", "event_type")
    t.commit(ev)
    man = t.manifest()
    assert man["operation"] == "append"
    assert man["snapshot_id"] == 1 and man["parent_id"] is None
    assert all(f["rows"] > 0 for f in man["files"])
    assert t.schema().fieldNames() == ["event_id", "event_type"]
    # per-file footer stats were harvested for the scan pruner
    assert any("event_id" in f["stats"] for f in man["files"])


def test_pages_through_catalog_byte_identical(spark, tmp_path):
    """North-star shape: the pages table (url, warc_ts, html, text, lang)
    committed through the seam and read back must preserve the per-url
    byte-identical ``text`` invariant."""
    from haskellpagerank_spark.sources.pages import generate_pages
    pages = generate_pages(spark, num_pages=200, seed=7)
    t = Table(str(tmp_path / "pages"))
    t.commit(pages, partition_by=["lang"])
    back = t.read(spark)
    assert back.count() == 200
    joined = (back.select("url", F.col("text").alias("t2"))
              .join(pages.select("url", "text"), "url"))
    assert joined.where(F.col("t2") != F.col("text")).count() == 0
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_compact_preserves_rows_and_time_travel(spark, tmp_path):
    """Compaction rewrites many small append files into few sorted ones:
    identical rows, fewer files, tighter per-file stats for the scan
    pruner, and pre-compaction snapshots still readable."""
    t = Table(str(tmp_path / "t7"))
    ev = _events(spark)
    # five small appends (the streaming micro-batch pattern)
    for k in range(5):
        t.commit(ev.where(F.col("event_id") % 5 == k).repartition(4))
    n_files_before = len(t.files())
    n_rows = t.read(spark).count()
    assert n_files_before >= 20

    v = t.compact(spark, target_files=2, sort_by=["event_id"])
    assert t.manifest()["operation"] == "compact"
    assert len(t.files()) <= 2
    assert t.read(spark).count() == n_rows
    # content identical, not just the count
    assert t.read(spark).exceptAll(ev).count() == 0
    # time travel to the pre-compaction snapshot still sees the old layout
    assert len(t.files(v - 1)) == n_files_before
    assert t.read(spark, snapshot=v - 1).count() == n_rows
    # sorted rewrite -> disjoint per-file event_id ranges -> pruning works
    _, report = t.scan(spark, "event_id", lo=0, hi=10)
    assert report["files_pruned"] >= 1


def test_add_column_evolution_reads_v1_files(spark, tmp_path):
    """Add-column is metadata-only: pre-evolution files read back with null
    in the new column; post-evolution appends carry real values; time
    travel to the pre-evolution snapshot does not see the column."""
    t = Table(str(tmp_path / "t_evo"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev.where(F.col("event_id") % 2 == 0))
    v = t.add_columns([("score", "double")])
    assert v == 2
    t.commit(ev.where(F.col("event_id") % 2 == 1)
             .withColumn("score", F.col("value") * 2))
    cur = t.read(spark)
    assert "score" in cur.columns
    n_even = ev.where(F.col("event_id") % 2 == 0).count()
    n_odd = ev.where(F.col("event_id") % 2 == 1).count()
    assert cur.where(F.col("score").isNull()).count() == n_even
    assert cur.where(F.col("score").isNotNull()).count() == n_odd
    # time travel: snapshot 1 predates the evolution
    assert "score" not in t.read(spark, snapshot=1).columns
    # duplicate add rejected
    with pytest.raises(ValueError):
        t.add_columns([("score", "double")])


def test_add_column_evolution_partitioned(spark, tmp_path):
    t = Table(str(tmp_path / "t_evo_part"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev, partition_by=["event_type"])
    t.add_columns([("flag", "int")])
    t.commit(ev.withColumn("flag", F.lit(1)), partition_by=["event_type"])
    cur = t.read(spark)
    assert cur.count() == 2 * ev.count()
    assert cur.where(F.col("flag").isNull()).count() == ev.count()
    # pruning still works on the evolved, partitioned table
    types = sorted(r["event_type"] for r in
                   ev.select("event_type").distinct().collect())
    df, report = t.scan(spark, "event_type", lo=types[0], hi=types[0])
    assert report["files_pruned"] > 0
    assert df.count() == 2 * ev.where(F.col("event_type") == types[0]).count()


def test_drop_column_is_projection_only(spark, tmp_path):
    t = Table(str(tmp_path / "t_drop"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev)
    t.drop_columns(["value"])
    assert "value" not in t.read(spark).columns
    assert "value" in t.read(spark, snapshot=1).columns  # time travel sees it
    with pytest.raises(ValueError):
        t.drop_columns(["no_such_col"])
    t2 = Table(str(tmp_path / "t_drop_part"))
    t2.commit(ev, partition_by=["event_type"])
    with pytest.raises(ValueError):
        t2.drop_columns(["event_type"])  # partition column protected


def test_equality_delete_merge_on_read(spark, tmp_path):
    """Merge-on-read: delete writes a key file, no data file is rewritten;
    reads anti-join the keys out; time travel sees pre-delete rows."""
    t = Table(str(tmp_path / "t_del"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev)
    n = ev.count()
    victims = ev.where(F.col("event_id") % 10 == 0)
    n_victims = victims.count()
    v = t.delete(victims, ["event_id"])
    assert v == 2
    assert t.read(spark).count() == n - n_victims
    assert t.read(spark).where(F.col("event_id") % 10 == 0).count() == 0
    assert t.read(spark, snapshot=1).count() == n  # time travel pre-delete
    # data files untouched: same file list as snapshot 1
    assert [f.path for f in t.files(2)] == [f.path for f in t.files(1)]


def test_delete_sequence_numbers_spare_later_appends(spark, tmp_path):
    """A row re-appended AFTER the delete must survive (Iceberg v2
    sequence-number semantics), even though its key matches."""
    t = Table(str(tmp_path / "t_seq"))
    ev = _events(spark).select("event_id", "event_type", "value")
    first = ev.where(F.col("event_id") < 100)
    t.commit(first)
    t.delete(first.where(F.col("event_id") < 50), ["event_id"])
    resurrected = first.where(F.col("event_id") < 10)
    t.commit(resurrected)
    cur = t.read(spark)
    n_first = first.count()
    n_deleted = first.where(F.col("event_id") < 50).count()
    n_res = resurrected.count()
    assert cur.count() == n_first - n_deleted + n_res
    # the resurrected keys are back despite matching the delete file
    assert cur.where(F.col("event_id") < 10).count() == n_res
    # keys in [10, 50) stay deleted
    assert cur.where((F.col("event_id") >= 10)
                     & (F.col("event_id") < 50)).count() == 0


def test_compact_purges_deletes(spark, tmp_path):
    t = Table(str(tmp_path / "t_del_compact"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev)
    t.delete(ev.where(F.col("event_id") % 3 == 0), ["event_id"])
    want = t.read(spark).count()
    t.compact(spark, target_files=2)
    assert t.manifest().get("delete_files") == []  # purged by rewrite
    assert t.read(spark).count() == want
    with pytest.raises(ValueError):
        t.delete(ev, ["bogus_key"])


def test_delete_on_partitioned_evolved_table(spark, tmp_path):
    """The three v2 features compose: partitioned table, evolved schema,
    then a merge-on-read delete keyed on a multi-column key."""
    t = Table(str(tmp_path / "t_all"))
    ev = _events(spark).select("event_id", "event_type", "value")
    t.commit(ev, partition_by=["event_type"])
    t.add_columns([("note", "string")])
    t.commit(ev.withColumn("note", F.lit("v2")),
             partition_by=["event_type"])
    victims = ev.limit(25).select("event_id", "event_type")
    t.delete(victims, ["event_id", "event_type"])
    cur = t.read(spark)
    assert cur.count() == 2 * ev.count() - 2 * 25
    assert cur.join(victims, ["event_id", "event_type"],
                    "left_semi").count() == 0


@pytest.mark.parametrize("seed", [13, 37])
def test_randomized_op_sequence_model_check(spark, tmp_path, seed):
    """Model-based property test: a random sequence of append / overwrite /
    equality-delete / compact / add-column ops, with a Python-side model of
    the expected rows AT EVERY SNAPSHOT. At the end, every historical
    snapshot must read back exactly its model — i.e. snapshots are
    immutable under all later operations, deletes respect sequence
    numbers, compaction preserves contents, and evolution backfills
    nulls — under interleavings the hand-written tests don't enumerate."""
    import random
    rng = random.Random(seed)
    t = Table(str(tmp_path / f"rand_{seed}"))
    evolved = False
    next_k = 0
    current: list[tuple] = []      # model of the live table contents
    model: dict[int, list[tuple]] = {}   # snapshot -> expected rows

    def _mk_rows(n):
        nonlocal next_k
        rows = []
        for _ in range(n):
            if evolved:
                rows.append((next_k, rng.randrange(100), rng.randrange(9)))
            else:
                rows.append((next_k, rng.randrange(100)))
            next_k += 1
        return rows

    def _df(rows):
        schema = ("k long, v long, w long" if evolved
                  else "k long, v long")
        return spark.createDataFrame(rows, schema)

    for step in range(12):
        op = rng.choice(["append", "append", "append", "overwrite",
                         "delete", "compact", "evolve"])
        if op == "append":
            rows = _mk_rows(rng.randint(1, 4))
            snap = t.commit(_df(rows))
            current = current + rows
        elif op == "overwrite":
            rows = _mk_rows(rng.randint(1, 3))
            snap = t.commit(_df(rows), mode="overwrite")
            current = list(rows)
        elif op == "delete":
            if not current:
                continue
            ks = sorted({r[0] for r in rng.sample(
                current, k=min(len(current), rng.randint(1, 3)))})
            snap = t.delete(
                spark.createDataFrame([(k,) for k in ks], "k long"), ["k"])
            current = [r for r in current if r[0] not in ks]
        elif op == "compact":
            if t.current_version() < 1:
                continue       # compacting an empty table raises by design
            snap = t.compact(spark, target_files=2)
        else:  # evolve (once)
            if evolved:
                continue
            snap = t.add_columns([("w", "long")])
            evolved = True
            # pre-evolution rows read back with w = null
            current = [(r[0], r[1], None) for r in current]
        model[snap] = list(current)

    def _key(r):
        return tuple((x is None, x) for x in r)

    for snap, want in model.items():
        got = [tuple(r) for r in t.read(spark, snapshot=snap).collect()]
        assert sorted(got, key=_key) == sorted(want, key=_key), \
            f"seed {seed}: snapshot {snap} diverged from model"
