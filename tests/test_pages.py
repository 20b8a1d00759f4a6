"""M0 pages-source pipeline: generation, extraction invariant, encoding.

Driver invariant (BASELINE.json input_hint): byte-identical extracted text
per url vs the generator. Plus the dense-id / self-loop / multiset contracts
inherited from the reference parser (EdgeArray.hs:69-89, 145-152).
"""

import pyspark.sql.functions as F
import pytest

from haskellpagerank_spark.sources import pages as P


@pytest.fixture(scope="module")
def small_pages(spark):
    df = P.generate_pages(spark, num_pages=300, seed=42, avg_links=5).persist()
    df.count()
    yield df
    df.unpersist()


def test_schema_and_determinism(spark, small_pages):
    assert [f.name for f in small_pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    assert small_pages.count() == 300
    assert small_pages.select("url").distinct().count() == 300
    # regeneration with a different partitioning is row-identical
    again = P.generate_pages(spark, num_pages=300, seed=42, avg_links=5,
                             num_partitions=3)
    diff = small_pages.select("url", "text").exceptAll(
        again.select("url", "text"))
    assert diff.count() == 0
    # different seed -> different content
    other = P.generate_pages(spark, num_pages=300, seed=7, avg_links=5)
    same = small_pages.select("url", "text").intersect(
        other.select("url", "text"))
    assert same.count() < 300


def test_extract_text_byte_identical(small_pages):
    got = P.extract_text(small_pages)
    joined = small_pages.select("url", F.col("text").alias("expected")).join(
        got, "url")
    assert joined.count() == 300
    mismatched = joined.where(
        F.col("expected").cast("binary") != F.col("text").cast("binary"))
    assert mismatched.count() == 0


def test_extract_links_multiset(spark, small_pages):
    raw = P.extract_links(small_pages).persist()
    n = raw.count()
    assert n > 300  # ~5 links/page
    # every dst is a well-formed url of the generator's shape
    bad = raw.where(~F.col("dst_url").rlike(
        r"^https://site\d{4}\.example/p\d{8}$"))
    assert bad.count() == 0
    # duplicates kept: multiset count >= distinct count (strict on any graph
    # with a repeated href; hub skew makes repeats near-certain at 300 pages)
    assert n >= raw.distinct().count()
    raw.unpersist()


def test_encode_dense_ids(spark, small_pages):
    g, vertices = P.build_graph(small_pages)
    n = vertices.count()
    assert g.num_vertices == n
    row = vertices.agg(F.min("id").alias("lo"), F.max("id").alias("hi"),
                       F.countDistinct("id").alias("d")).first()
    assert row["lo"] == 0 and row["hi"] == n - 1 and row["d"] == n
    # ids follow url sort order (deterministic dictionary encoding)
    pdf = vertices.orderBy("url").toPandas()
    assert pdf["id"].tolist() == sorted(pdf["id"].tolist())
    # no self-loops survive encoding
    assert g.edges.where(F.col("src") == F.col("dst")).count() == 0
    # edge multiset size == raw href occurrences minus self-links
    raw = P.extract_links(small_pages)
    n_self = raw.where(F.col("src_url") == F.col("dst_url")).count()
    assert g.edges.count() == raw.count() - n_self


def test_pagerank_on_generated_pages(spark, small_pages):
    """End-to-end M0->M1: pages -> graph -> redistribute PageRank sums to 1."""
    from haskellpagerank_spark.operators.pagerank import (
        PageRankConfig, run_pagerank)
    g, _ = P.build_graph(small_pages)
    res = run_pagerank(g, PageRankConfig(damping=0.85, tol=1e-8,
                                         tol_norm="l1", max_iters=100))
    total = res.ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6


def test_vectorized_generator_matches_rowwise_reference():
    """The Arrow-batch generator is byte-identical (html, text, url, ts,
    lang) to the row-wise reference implementation — exact uint64 modulo
    on both sides (numpy promotes uint64 % python-int through float64)."""
    import numpy as np
    from haskellpagerank_spark.sources.pages import (_gen_batch,
                                                     _gen_batch_rowwise)
    ids = np.array([0, 1, 7, 512, 31337, 54321, 99999], dtype=np.int64)
    a = _gen_batch(ids, 100_000, 42, 1000, 8, 100, 5)
    b = _gen_batch_rowwise(ids, 100_000, 42, 1000, 8, 100, 5)
    for c in ["url", "text", "lang"]:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    assert all(x == y for x, y in zip(a["html"], b["html"]))
    assert (a["warc_ts"].to_numpy() == b["warc_ts"].to_numpy()).all()


def test_extract_anchors_matches_links_and_text(spark):
    """Every anchor row aligns with extract_links (same multiset of
    (src, dst)) and the anchor text is the generator's vocab word for the
    target page."""
    from haskellpagerank_spark.sources.pages import (
        extract_anchors, extract_links, generate_pages)
    pages = generate_pages(spark, num_pages=200, seed=7, avg_links=5)
    anchors = extract_anchors(pages).collect()
    links = extract_links(pages).collect()
    assert sorted((r["src_url"], r["dst_url"]) for r in anchors) \
        == sorted((r["src_url"], r["dst_url"]) for r in links)
    assert all(r["anchor"] for r in anchors)


def test_anchor_text_index_counts(spark):
    from haskellpagerank_spark.sources.pages import (
        anchor_text_index, extract_anchors, generate_pages)
    pages = generate_pages(spark, num_pages=200, seed=7, avg_links=5)
    rows = extract_anchors(pages).collect()
    want = {}
    for r in rows:
        k = (r["dst_url"], r["anchor"])
        want[k] = want.get(k, 0) + 1
    got = {(r["dst_url"], r["anchor"]): r["cnt"]
           for r in anchor_text_index(pages).collect()}
    assert got == want
