"""URL canonicalization + PII hygiene (functions/urls.py): hand-checked
canonical forms, PII counting/redaction, and the one-shuffle crawl dedup."""

from pyspark.sql import functions as F

from haskellpagerank_spark.functions import urls as U


def _canon(spark, raw):
    rows = spark.createDataFrame([(u,) for u in raw], "url string") \
        .select(U.canonicalize_url("url").alias("c")).collect()
    return [r["c"] for r in rows]


def test_canonicalize_url_cases(spark):
    got = _canon(spark, [
        # scheme/host case + www + trailing slash + fragment
        "HTTPS://WWW.Example.COM/a/b/#frag",
        # tracking params stripped, survivors sorted
        "https://example.com/a?utm_source=x&b=2&a=1&ref=rss",
        # all-tracking query collapses to no query
        "https://example.com/a?utm_medium=y&fbclid=z&gclid=w",
        # empty-value and duplicate-free keep
        "http://example.com?x=&y=1",
        # not a URL
        "no scheme here",
    ])
    assert got == [
        "https://example.com/a/b",
        "https://example.com/a?a=1&b=2",
        "https://example.com/a",
        "http://example.com?x=&y=1",
        "",
    ]


def test_canonical_variants_collapse(spark):
    variants = [
        "https://www.site.example/p1",
        "HTTPS://Site.Example/p1/",
        "https://site.example/p1?utm_source=feed",
        "https://site.example/p1#sec",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_pii_count_and_redact(spark):
    df = spark.createDataFrame(
        [("mail a@b.example and c.d+e@f.example or +1-555-123-4567",),
         ("clean text",)], "text string")
    out = df.select(
        U.pii_email_count("text").alias("em"),
        U.pii_phone_count("text").alias("ph"),
        U.redact_pii("text").alias("red"),
    ).collect()
    assert (out[0]["em"], out[0]["ph"]) == (2, 1)
    assert out[0]["red"] == "mail <EMAIL> and <EMAIL> or <PHONE>"
    assert (out[1]["em"], out[1]["ph"]) == (0, 0)
    assert out[1]["red"] == "clean text"


def test_dedup_crawl_counts(spark):
    crawl = U.synthetic_crawl(spark, n_pages=60, snapshots=3)
    out = U.dedup_crawl(crawl)
    rows = {r["canonical_url"]: r for r in out.collect()}
    # every page keeps exactly one canonical group of 3 snapshots
    assert len(rows) == 60
    assert all(r["n_snapshots"] == 3 for r in rows.values())
    # latest capture wins: s=2 snapshot epoch
    pid0 = [k for k in rows if k.endswith("/p00000000?v=0")]
    assert len(pid0) == 1
    assert rows[pid0[0]]["last_epoch"] == 1700000000 + 0 * 17 + 2 * 3600
    # PII lands only on every-6th pages: one email + one phone per capture
    pii = [r for r in rows.values() if r["pii_emails"] > 0]
    assert len(pii) == 10
    assert all(r["pii_emails"] == 3 and r["pii_phones"] == 3 for r in pii)
    # raw variants: decorations differ across captures for most pages
    assert max(r["n_raw_variants"] for r in rows.values()) >= 2


def test_dedup_crawl_single_shuffle(spark):
    crawl = U.synthetic_crawl(spark, n_pages=30, snapshots=3)
    plan = U.dedup_crawl(crawl)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # one logical shuffle on the canonical key; countDistinct adds the
    # standard second partial-agg exchange (still keyed on canonical_url)
    assert plan.count("Exchange") <= 2


def test_canonicalize_idempotent_property(spark):
    # canonicalize(canonicalize(u)) == canonicalize(u): a canonical form is
    # a fixed point, so re-crawling already-canonical URLs never re-splits
    # a dedup group. Deterministic structured fuzz over the grammar axes
    # (case, www, tracking params, param order, fragment, trailing slash).
    import itertools

    schemes = ["http://", "HTTPS://"]
    hosts = ["www.Ex-A.com", "ex-a.com", "sub.ex-a.com."]
    paths = ["", "/", "/p/q/", "/p%20q"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?utm_source=x&k=v&k2="]
    frags = ["", "#top"]
    raw = ["".join(parts) for parts in
           itertools.product(schemes, hosts, paths, queries, frags)]
    once = _canon(spark, raw)
    twice = _canon(spark, once)
    assert twice == once
