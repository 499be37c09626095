"""sc_crawler_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SpareCores/sc-crawler, re-expressed
Spark-first (DataFrame/SQL + Catalyst), plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB lake needs.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC).
- ``tables``     — loaders for the synthetic lake tables.
- ``schemas``    — declared StructTypes for the 19 sc-crawler silver tables.
- ``functions``  — scalar/expression helpers (canonical JSON hash, sig-fig
  rounding, unit conversions, text metrics, vector math).
- ``operators``  — dataflow operators from SURVEY.md §2 (keep-last dedup,
  upsert/lifecycle, hash-diff sync, workload scores, windows) and the
  pipeline extensions (MinHash-LSH, SimHash, n-gram Jaccard, ANN).
- ``queries``    — the declared query inventory wired into
  ``__spark_entry__.py`` with DuckDB oracle SQL for each.
"""

__version__ = "0.1.0"
