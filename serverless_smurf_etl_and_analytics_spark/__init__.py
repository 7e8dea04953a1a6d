"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `RDarrylR/serverless-smurf-etl-and-analytics`
(a serverless retail-sales ETL + analytics platform; see SURVEY.md).

Everything here is idiomatic Spark DataFrame / Spark SQL: the reference's
hand-coded Lambda loops are re-expressed as declarative plans so Catalyst
gets predicate pushdown, column pruning, partition pruning, broadcast
joins, and AQE for free. Designed for a 1000-executor cluster reading
~100 TB, tested on local[32].

Layout
------
- ``session``   : tuned SparkSession builder
- ``tables``    : testdata loaders + reference-domain mapping
- ``corpus``    : ledger-maintained corpora (ingest-time artifact
                  maintenance + zero-scan ledger-fed queries)
- ``sources/``  : ingest (validated JSON -> partitioned Parquet), sinks
- ``operators/``: metrics, history/windows, serving, joins, dedup,
                  similarity, text analysis, multimodal plumbing
- ``functions/``: scalar helpers (exact money math, hashing, safe div)
- ``plans/``    : the query registry consumed by ``__spark_entry__.py``
- ``streaming/``: Structured Streaming variants (file source, tumbling
                  windows, completeness trigger)
"""

__version__ = "0.1.0"
