"""URL canonicalization + PII scrubbing — web-corpus hygiene kernels.

The first operation a Common-Crawl-style pipeline runs is URL-keyed
dedup: the same page arrives under scheme/host-case variants, a
``www.`` prefix, tracking query params (``utm_*``, ``ref``), fragments,
and trailing slashes. ``canonicalize_url`` collapses those to one key so
a plain ``groupBy(canonical)`` dedups the crawl; ``keep latest warc_ts``
is then an ordinary max-aggregate. PII scrubbing (emails/phones) is the
other pre-training hygiene pass every text corpus gets.

All kernels are Catalyst-native (regexp + array functions, whole-stage
codegen — no Python in the hot path), so they run unchanged over 10^12
rows; the regexes are RE2-compatible so the DuckDB oracle twins evaluate
the byte-identical semantics. The reference engine has no URL surface
(its inputs are pre-extracted edge lists, SURVEY.md §2.1); this module
is north-rule scope: the step that turns raw crawl URLs into the dense
link-graph vertex space `sources/pages.py` encodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One pass over the URL: scheme / host / path / optional query, fragment
# dropped. RE2-safe (no lookaround/backrefs) so DuckDB evaluates the same
# pattern identically.
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"

# Tracking params stripped during canonicalization (C4/CC-pipelines strip
# the same families).
_TRACKING_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=")

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_url(c: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL, entirely in codegen.

    scheme+host lowercased, leading ``www.`` stripped, trailing path
    slashes stripped, fragment dropped, query params sorted with
    tracking params (utm_*/ref/fbclid/gclid) removed. Non-URL strings
    (no ``scheme://``) canonicalize to the empty string — callers filter
    them. DuckDB twin: same regex via ``regexp_extract(url, p, i)`` +
    ``list_sort``/``list_filter``/``array_to_string``.

    Negative result (measured, round 4): rewriting the four
    ``regexp_extract`` calls as ONE ``regexp_replace`` that emits
    \\x01-joined groups plus a ``split`` is ~1.8x SLOWER steady-state
    (400k urls x 3 snapshots, local[8], best-of-6: 1.31s vs 2.48s) —
    projection collapse duplicates the split-array expression once per
    part access (~6 copies) and codegen does not CSE it, so the "single
    pass" runs more regex work than four anchored extracts. Cold/JIT
    first-runs invert the comparison, which is how the rewrite first
    looked 3x faster. Keep the extracts.
    """
    u = _col(c)
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    host = F.lower(F.regexp_extract(u, URL_RE, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(F.regexp_extract(u, URL_RE, 3), r"/+$", "")
    rawq = F.regexp_extract(u, URL_RE, 4)  # includes the leading '?'
    def _keep(p: Column) -> Column:
        tracking = p.startswith(_TRACKING_PREFIXES[0])
        for pre in _TRACKING_PREFIXES[1:]:
            tracking = tracking | p.startswith(pre)
        return (p != "") & ~tracking

    kept = F.filter(F.split(F.regexp_replace(rawq, r"^\?", ""), "&"), _keep)
    query = F.array_join(F.array_sort(kept), "&")
    return F.when(
        scheme == "", F.lit("")
    ).otherwise(F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    ))


def pii_email_count(c: Column | str) -> Column:
    """Number of email addresses in the text (codegen regexp)."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(EMAIL_RE), 0))


def pii_phone_count(c: Column | str) -> Column:
    """Number of +N-NNN-NNN-NNNN phone numbers in the text."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(PHONE_RE), 0))


def redact_pii(c: Column | str) -> Column:
    """Text with emails/phones replaced by typed placeholder tokens."""
    t = F.regexp_replace(_col(c), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(t, PHONE_RE, "<PHONE>")


def dedup_crawl(crawl: DataFrame, url_col: str = "url",
                ts_col: str = "warc_epoch",
                text_col: str = "text") -> DataFrame:
    """URL-canonical crawl dedup + PII accounting, one shuffle.

    Groups the crawl by ``canonicalize_url(url)`` and keeps per-group:
    snapshot count, distinct raw-variant count, the latest capture
    timestamp, and summed PII hits (counted on the raw text; redaction
    itself is `redact_pii`, applied per-row before the write in a real
    run). Both shuffles key on the canonical URL (the exact distinct
    count adds the standard second partial-agg exchange) — a short
    string, skew-free by construction (one group per page), so the plan
    is the same at 10^12 rows.
    """
    rows = crawl.select(
        canonicalize_url(url_col).alias("canonical_url"),
        F.col(url_col).alias("_raw"),
        F.col(ts_col).alias("_ts"),
        pii_email_count(text_col).alias("_em"),
        pii_phone_count(text_col).alias("_ph"),
    ).where(F.col("canonical_url") != "")
    return rows.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        F.countDistinct("_raw").alias("n_raw_variants"),
        F.max("_ts").alias("last_epoch"),
        F.sum("_em").cast("long").alias("pii_emails"),
        F.sum("_ph").cast("long").alias("pii_phones"),
    )


def synthetic_crawl(spark, n_pages: int = 1000,
                    snapshots: int = 3) -> DataFrame:
    """Deterministic messy crawl: `snapshots` captures per page with
    scheme-case / www / tracking-param / trailing-slash / fragment
    decorations varying per capture, plus PII-laced text on every 6th
    page. Pure arithmetic+string codegen over ``spark.range`` — the
    DuckDB twin re-derives the identical rows from ``range()``, so the
    whole hygiene pipeline is hash-checkable with no parquet handoff.
    """
    r = spark.range(n_pages * snapshots).select(
        (F.col("id") / snapshots).cast("long").alias("pid"),
        (F.col("id") % snapshots).alias("s"),
    )
    pid, s = F.col("pid"), F.col("s")
    site = F.lpad((pid % 40).cast("string"), 4, "0")
    pnum = F.lpad(pid.cast("string"), 8, "0")
    mixed = (pid + s) % 11 == 0
    scheme = F.when(mixed, "HTTPS").otherwise("https")
    host = F.concat(
        F.when((pid + s) % 5 == 0, "www.").otherwise(""),
        F.when(mixed, F.concat(F.lit("Site"), site, F.lit(".Example")))
         .otherwise(F.concat(F.lit("site"), site, F.lit(".example"))))
    path = F.concat(F.lit("/p"), pnum,
                    F.when((pid + s) % 7 == 0, "/").otherwise(""))
    vparam = F.concat(F.lit("v="), (pid % 3).cast("string"))
    query = (
        F.when(((pid + s) % 3 == 0) & (pid % 4 == 0),
               F.concat(F.lit("?utm_source=feed&"), vparam, F.lit("&ref=rss")))
        .when((pid + s) % 3 == 0, "?utm_source=feed&ref=rss")
        .when(pid % 4 == 0, F.concat(F.lit("?"), vparam))
        .otherwise(""))
    frag = F.when((pid + s) % 13 == 0, "#sec2").otherwise("")
    url = F.concat(scheme, F.lit("://"), host, path, query, frag)
    text = F.when(
        pid % 6 == 0,
        F.concat(F.lit("contact u"), pid.cast("string"),
                 F.lit("@mail"), (pid % 10).cast("string"),
                 F.lit(".example or +1-555-"),
                 F.lpad((pid % 1000).cast("string"), 3, "0"), F.lit("-"),
                 F.lpad((pid % 10000).cast("string"), 4, "0"))
    ).otherwise(F.concat(F.lit("page body "), pid.cast("string")))
    ts = (F.lit(1700000000) + pid * 17 + s * 3600).cast("long")
    return r.select(url.alias("url"), ts.alias("warc_epoch"),
                    text.alias("text"))
