"""Query corpora.

- ``registry``: the harness registry mapping query name → (DataFrame
  builder, DuckDB oracle SQL) consumed by ``__spark_entry__.py``.
- ``harness``: parity queries — one per operator family in SURVEY.md §2,
  transposed onto the driver's TPC-H-ish testdata tables.
- ``extensions``: LLM-data-pipeline queries (dedup / similarity / text
  analysis / multimodal / events) over documents, embeddings, events.
- ``superstore_queries``: the 13 reference analytical queries over the
  warehouse star schema (SQL + DataFrame twins).
"""

from super_store_datawarehouse_spark.plans.registry import HARNESS, harness_query

__all__ = ["HARNESS", "harness_query"]
