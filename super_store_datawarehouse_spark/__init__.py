"""superstore-spark: a PySpark-native dimensional analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference warehouse ``0xAbelheira/Super-Store-DataWarehouse`` (a Kimball
star schema + pandas ETL + 13-query MySQL corpus), re-expressed Spark-first:

- DataFrame / Spark SQL logical plans, Catalyst + AQE physical planning
- Parquet columnar storage, broadcast-joined dimensions, set-oriented writes
- window functions, ROLLUP/GROUPING, ordered string-agg compositions
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) and Structured Streaming.

Layout (SURVEY.md §7.0):

- ``session``    SparkSession factory (UTC, AQE, shuffle sizing)
- ``schemas``    explicit StructTypes for source + warehouse tables
- ``sources``    readers (CSV/parquet) and sinks (parquet, Excel, rejects)
- ``functions``  scalar/aggregate expression builders (lost_value, ...)
- ``operators``  reusable dataflow operators (dedup merge, surrogate keys,
                 text dedup/similarity/quality, multimodal plumbing)
- ``warehouse``  the star-schema ETL: 9 dimension + 6 fact builders
- ``plans``      query corpus: 13 reference queries (SQL + DataFrame twins)
                 and the driver-harness query set over the TPC-H-ish tables
- ``streaming``  Structured Streaming jobs over the events stream
"""

__version__ = "0.1.0"
