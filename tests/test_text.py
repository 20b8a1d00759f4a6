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
