"""Corpus n-gram counts (functions/text.ngram_counts) vs the DuckDB
twin and hand-checked examples."""

SF = "/root/testdata/sf0.001"




def test_ngram_counts_basic(spark):
    from haskellpagerank_spark.functions.text import ngram_counts
    docs = spark.createDataFrame(
        [("a", "the cat sat on the cat sat"), ("b", "the cat sat"),
         ("c", "  "), ("d", "one")],
        "doc_id string, text string")
    got = {r["ngram"]: r["cnt"]
           for r in ngram_counts(docs, n=3, min_count=1).collect()}
    assert got == {"the cat sat": 3, "cat sat on": 1, "sat on the": 1,
                   "on the cat": 1}
    got2 = {r["ngram"]: r["cnt"]
            for r in ngram_counts(docs, n=3, min_count=2).collect()}
    assert got2 == {"the cat sat": 3}


def test_ngram_counts_matches_duckdb(spark):
    import duckdb
    from haskellpagerank_spark.functions.text import ngram_counts
    from haskellpagerank_spark.sql_twins import ngram_counts_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["ngram"]: r["cnt"]
           for r in ngram_counts(docs, n=3, min_count=2).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = {g: c for g, c in con.sql(ngram_counts_sql(3, 2)).fetchall()}
    assert got == want


def test_sessionize_hand_checked(spark):
    from haskellpagerank_spark.functions.events import (
        session_stats, sessionize)
    rows = [
        (1, "2024-01-01 00:00:00", 10, "c", 1.0, ""),
        (2, "2024-01-01 00:10:00", 10, "c", 2.0, ""),
        (3, "2024-01-01 01:10:00", 10, "c", 3.0, ""),   # 1h gap -> new
        (4, "2024-01-01 00:05:00", 20, "c", 4.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["f"])
        .to_timestamp("ts"))
    s = {r["event_id"]: r["session_seq"]
         for r in sessionize(ev, gap_s=1800).collect()}
    assert s == {1: 1, 2: 1, 3: 2, 4: 1}
    st = {(r["user_id"], r["session_seq"]): (r["n_events"], r["duration_s"],
                                             r["value_sum"])
          for r in session_stats(ev, gap_s=1800).collect()}
    assert st == {(10, 1): (2, 600, 3.0), (10, 2): (1, 0, 3.0),
                  (20, 1): (1, 0, 4.0)}


def test_sample_edges_deterministic(spark):
    from haskellpagerank_spark.operators.graph import from_pairs, sample_edges
    pairs = [(i, (i * 7 + 1) % 50) for i in range(50)]
    g = from_pairs(spark, pairs)
    a = {(r["src"], r["dst"]) for r in sample_edges(g, 5).collect()}
    b = {(r["src"], r["dst"]) for r in sample_edges(g, 5).collect()}
    assert a == b and 0 < len(a) < len(pairs)
    import hashlib
    want = {(s, d) for s, d in set(pairs) if s != d and int(hashlib.md5(
        f"42|{s}|{d}".encode()).hexdigest()[:15], 16) % 5 == 0}
    assert a == want


def test_contamination_overlap(spark):
    from haskellpagerank_spark.functions.text import contamination_overlap
    docs = spark.createDataFrame(
        [(0, "a b c d e f"),          # shares trigrams with probe
         (1, "x y z q r s"),          # no overlap
         (2, "a b c x y z q")],       # partial overlap
        "doc_id long, text string")
    probe = spark.createDataFrame(
        [("a b c",), ("b c d",), ("c d e",)], "ngram string")
    got = (contamination_overlap(docs, probe, n=3).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.doc_id.tolist() == [0, 2]
    # doc 0: 4 distinct trigrams, 3 in probe; doc 2: 5 distinct, 1 in probe
    assert got.n_overlap.tolist() == [3, 1]
    assert got.n_ngrams.tolist() == [4, 5]
    assert got.overlap_frac.tolist() == [0.75, 0.2]
