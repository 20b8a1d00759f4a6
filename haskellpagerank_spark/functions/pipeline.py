"""Composed training-corpus preparation over the ``documents`` shape.

The individual stages (exact dedup, quality scoring, language ID, token
stats, fingerprinting — functions/text.py, functions/dedup.py) are what a
100 TB pretraining pipeline runs *in sequence*; this module chains them
into one Catalyst plan so the optimizer sees the whole thing: one
documents scan, the dedup semi-join keyed on a 128-bit hash (never the
text), and all feature columns computed in a single codegen'd projection
before the filters.

No reference analogue (the reference is a graph engine); this is the
training-data-pipeline scope the build brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_duplicate_groups  # noqa: F401  (re-export neighbor)
from .text import fingerprint, lang_scores, quality_features


def dedup_exact(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical doc (smallest id) per byte-identical text.

    The shuffle key is md5(text) — 16 bytes per row regardless of document
    size; the winner join is a semi-join on (hash, id) so no text payload
    moves twice."""
    hashed = docs.withColumn("_text_hash", F.md5(F.col(text_col)))
    winners = (hashed.groupBy("_text_hash")
               .agg(F.min(id_col).alias(id_col)))
    return (hashed.join(winners, ["_text_hash", id_col], "left_semi")
            .drop("_text_hash"))


def prepare_corpus(docs: DataFrame, lang: str = "en",
                   min_quality: float = 0.5,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """documents -> deduped, quality- and language-gated, annotated corpus.

    Returns (doc_id, lang_pred, n_tokens, quality_score, fingerprint) for
    every surviving document: exact-dedup first (cheapest key, biggest
    volume cut), then the quality and language gates on columns computed in
    the same projection, then the near-dup fingerprint for the downstream
    MinHash pass. Deterministic end to end — the driver gate holds it to a
    hash-exact DuckDB twin.
    """
    kept = dedup_exact(docs, text_col, id_col)
    feat = lang_scores(quality_features(kept, text_col), text_col)
    gated = feat.where((F.col("quality_score") >= F.lit(min_quality))
                       & (F.col("lang_pred") == F.lit(lang)))
    fp = fingerprint(docs, text_col, id_col)
    return (gated.join(fp, id_col)
            .select(id_col, "lang_pred", "n_tokens", "quality_score",
                    "fingerprint"))
