"""haskellpagerank_spark — a PySpark-native link-graph analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference engine ``andsild/HaskellPageRank`` (a
single-node Haskell graph engine; see /root/reference), extended to the
web-scale scope defined by BASELINE.json:

- PageRank (power iteration; reference-exact Jacobi semantics behind flags,
  web-scale dangling-mass redistribution by default)
- Connected components (iterative min-label propagation)
- Label propagation
- Triangle counting
- Graph colorings (greedy / Jones-Plassmann / distance-2 / speculative)
- Incremental frontier PageRank ("prism" family)
- Page-table sources: deterministic page generation, vectorized href
  extraction, dictionary encoding to dense int64 vertex ids
- Training-data-pipeline operators over documents/embeddings: dedup
  (exact / MinHash-LSH / SimHash), ANN similarity search, text quality,
  language id, token counting, fingerprinting

Everything is DataFrame/SQL-first: Catalyst plans the physical execution;
Python appears only inside Arrow-vectorized UDFs (never per-row).
"""

__version__ = "0.1.0"
