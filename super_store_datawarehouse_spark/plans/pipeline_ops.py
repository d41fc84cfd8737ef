"""Round-2 training-pipeline harness queries (x109+): exact weighted
sampling, context-window packing, eval-set contamination, reproducible
epoch shuffling.

These extend the LLM-data-pipeline surface (dedup/quality/split/mix in
``operators/sampling.py`` + ``operators/dedup.py``) with the remaining
operations a 100 TB pre-training data build runs between "documents are
clean" and "tokens hit the trainer": draw an importance-weighted
subcorpus (PPS), audit train→eval n-gram leakage, lay documents into
fixed token budgets, and give every epoch a reproducible global order.
All four are exact integer/window plans — no RNG, no transcendental
scoring — so each carries a full DuckDB oracle twin.

Reference parity anchor: the reference's only sampling surface is
MySQL's LIMIT/ORDER BY (Data_Analysis.ipynb top-k cells); everything
here is new-capability surface per the build brief, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from super_store_datawarehouse_spark.functions.exact import cents
from super_store_datawarehouse_spark.operators.sampling import (
    bucket_sql,
    knuth_sql,
    priority_sql,
)
from super_store_datawarehouse_spark.plans.registry import harness_query
from super_store_datawarehouse_spark.sources.testdata import load_table

# Shared SQL fragments (DuckDB dialect), mirroring operators/text.words()
# and operators/sampling.split_column exactly.
_WS_SQL = (
    "list_filter(string_split_regex(lower(trim({t})), '\\s+'), x -> x <> '')"
)


def _split_case(key: str) -> str:
    b = bucket_sql(key)
    return (
        f"CASE WHEN {b} < 8000 THEN 'train' "
        f"WHEN {b} < 9000 THEN 'val' ELSE 'test' END"
    )


# --------------------------------------------------------------------------
# x109 — exact PPS systematic sample (operators/sampling.py
# pps_systematic_sample): 50 probes over orders weighted by total price.
# Integer line-layout + integer probes, so membership (and probe
# multiplicity for heavy items) is bit-reproducible cross-engine.
# --------------------------------------------------------------------------
@harness_query(
    "x109_pps_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_cents
      FROM orders
    ), lined AS (
      SELECT o_orderkey, w_cents,
             SUM(w_cents) OVER (ORDER BY o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS cum_hi
      FROM w
    ), tot AS (SELECT SUM(w_cents) AS W FROM w),
    probes AS (
      SELECT i AS probe_idx, ((2 * i + 1) * W) // 100 AS probe
      FROM range(0, 50) r(i), tot
    )
    SELECT probe_idx, o_orderkey, w_cents
    FROM lined, probes
    WHERE probe >= cum_hi - w_cents AND probe < cum_hi
    ORDER BY probe_idx
    """,
)
def x109_pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from super_store_datawarehouse_spark.operators.sampling import (
        pps_systematic_sample,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("w_cents")
    )
    picked = pps_systematic_sample(orders, "w_cents", k=50, order_col="o_orderkey")
    return picked.select("probe_idx", "o_orderkey", "w_cents").orderBy("probe_idx")


# --------------------------------------------------------------------------
# q24 (x110 until r3; promoted to a driver slot) — context-window packing (operators/sampling.py pack_sequences):
# documents in doc_id order fill 2048-token packs; per-pack doc/token
# counts. pack = cum_before div budget is closed-form, so the whole
# layout is one window + one aggregate.
# --------------------------------------------------------------------------
@harness_query(
    "q24_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len({_WS_SQL.format(t='text')}) AS n_tokens
      FROM documents
    ), lined AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM toks
    )
    SELECT CAST(cum_before // 2048 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(MAX(cum_before % 2048) AS BIGINT) AS last_start_offset
    FROM lined
    GROUP BY 1 ORDER BY pack_id
    """,
)
def q24_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from super_store_datawarehouse_spark.operators.sampling import pack_sequences
    from super_store_datawarehouse_spark.operators.text import token_count_ws

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, "n_tokens", budget=2048, order_col="doc_id")
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.max("offset_in_pack").alias("last_start_offset"),
        )
        .orderBy("pack_id")
    )


# --------------------------------------------------------------------------
# q25 (x111 until r3; promoted to a driver slot) — train→eval n-gram
# contamination audit (operators/dedup.py
# cross_split_contamination): the GPT-3/PaLM-style eval-overlap check,
# composed with the deterministic splitter so the whole audit is
# reproducible end to end.
# --------------------------------------------------------------------------
@harness_query(
    "q25_contamination_audit",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, text, {_split_case('doc_id')} AS split
      FROM documents
    ), w AS (
      SELECT doc_id, split, {_WS_SQL.format(t='text')} AS ws FROM tagged
    ), sh AS (
      SELECT DISTINCT doc_id, split,
             array_to_string(ws[i:i+2], ' ') AS shingle
      FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
    ), train AS (
      SELECT DISTINCT shingle FROM sh WHERE split = 'train'
    )
    SELECT e.doc_id, e.split,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS contamination
    FROM (SELECT * FROM sh WHERE split IN ('val', 'test')) e
    LEFT JOIN train tr ON tr.shingle = e.shingle
    GROUP BY e.doc_id, e.split
    ORDER BY e.doc_id
    """,
)
def q25_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from super_store_datawarehouse_spark.operators.dedup import (
        cross_split_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    return cross_split_contamination(docs, n=3).orderBy("doc_id")


# --------------------------------------------------------------------------
# x112 — reproducible epoch shuffle (operators/sampling.py
# deterministic_shuffle): every doc gets (shard, pos) as a pure function
# of (doc_id, salt); summarized per shard so the oracle result stays
# small while still pinning every pos via min/max/sum.
# --------------------------------------------------------------------------
@harness_query(
    "x112_deterministic_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {knuth_sql('doc_id', 1)} AS shuffle_hash
      FROM documents
    ), placed AS (
      SELECT doc_id, shuffle_hash, shuffle_hash % 16 AS shard,
             row_number() OVER (PARTITION BY shuffle_hash % 16
                                ORDER BY shuffle_hash, doc_id) - 1 AS pos
      FROM h
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(MAX(pos) AS BIGINT) AS max_pos,
           CAST(SUM(pos * doc_id) AS BIGINT) AS pos_id_checksum
    FROM placed
    GROUP BY shard ORDER BY shard
    """,
)
def x112_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from super_store_datawarehouse_spark.operators.sampling import (
        deterministic_shuffle,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    placed = deterministic_shuffle(docs, "doc_id", n_shards=16, salt=1)
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("pos").alias("max_pos"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("pos_id_checksum"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# x113 — recursive CTE (Spark 4 WITH RECURSIVE): traverse the implicit
# binary tree parent(k) = k div 2 over supplier keys from the root and
# report per-depth node counts. Iterative traversal expressed in pure
# declarative SQL on BOTH engines — the recursion text is identical
# modulo the integer-division spelling (Spark `div`, DuckDB `//`).
# --------------------------------------------------------------------------
@harness_query(
    "x113_recursive_supplier_tree",
    oracle="""
    WITH RECURSIVE tree(s_suppkey, depth) AS (
      SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 1
      UNION ALL
      SELECT s.s_suppkey, t.depth + 1
      FROM supplier s JOIN tree t ON s.s_suppkey // 2 = t.s_suppkey
      WHERE s.s_suppkey > 1
    )
    SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(s_suppkey) AS BIGINT) AS key_sum
    FROM tree GROUP BY depth ORDER BY depth
    """,
)
def x113_recursive_supplier_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "supplier_rec_x113"
    )
    return spark.sql(
        """
        WITH RECURSIVE tree(s_suppkey, depth) AS (
          SELECT s_suppkey, 0 AS depth FROM supplier_rec_x113 WHERE s_suppkey = 1
          UNION ALL
          SELECT s.s_suppkey, t.depth + 1
          FROM supplier_rec_x113 s JOIN tree t ON s.s_suppkey div 2 = t.s_suppkey
          WHERE s.s_suppkey > 1
        )
        SELECT depth, COUNT(*) AS n_nodes,
               CAST(SUM(s_suppkey) AS BIGINT) AS key_sum
        FROM tree GROUP BY depth ORDER BY depth
        """
    )


# --------------------------------------------------------------------------
# x115 — custom aggregate via GROUPED_AGG pandas UDF (SURVEY §2.9 UDAF
# surface): per-flag median absolute deviation of line prices, plus a
# companion pandas-UDAF count in the same agg() (Spark forbids mixing
# GROUPED_AGG UDFs with JVM aggregates). The UDF is selection-based
# (order-independent), so the DuckDB two-pass median formulation
# verifies it exactly.
# --------------------------------------------------------------------------
@harness_query(
    "x115_mad_udaf_by_flag",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ), m AS (
      SELECT l_returnflag, median(cents) AS med FROM c GROUP BY 1
    )
    SELECT c.l_returnflag,
           median(abs(c.cents - m.med)) AS mad_cents,
           COUNT(*) AS n_rows
    FROM c JOIN m USING (l_returnflag)
    GROUP BY 1 ORDER BY 1
    """,
)
def x115_mad_udaf_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from super_store_datawarehouse_spark.functions.udafs import (
        count_udaf,
        mad_cents_udaf,
    )

    mad = mad_cents_udaf()
    cnt = count_udaf()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", cents(F.col("l_extendedprice")).alias("cents")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            mad(F.col("cents")).alias("mad_cents"),
            cnt(F.col("cents")).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# x118 — grouped-map applyInPandas (SURVEY §2.9 surface): per-returnflag
# median-centering, returning each flag's 5 largest absolute deviations.
# The pandas body is pure selection + integer arithmetic (np.median on
# int cents, integer subtraction, deterministic sort), so a two-pass
# median SQL formulation replays it exactly — the grouped-map analogue
# of the x115 UDAF determinism rule.
# Scale: each group materializes on one executor (fine to ~10^7 rows per
# group); the grouping key here has cardinality 3, so at 100 TB this
# exact plan would need a salted two-level top-k instead — documented in
# SCALE.md; the API surface under test is the Arrow grouped-map path.
# --------------------------------------------------------------------------
@harness_query(
    "x118_grouped_map_median_center",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ), m AS (
      SELECT l_returnflag, median(cents) AS med FROM c GROUP BY 1
    ), d AS (
      SELECT c.l_returnflag, c.l_orderkey, c.l_linenumber,
             CAST(c.cents - CAST(trunc(m.med) AS BIGINT) AS BIGINT) AS dev_cents
      FROM c JOIN m USING (l_returnflag)
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY l_returnflag
        ORDER BY abs(dev_cents) DESC, l_orderkey, l_linenumber) AS rn
      FROM d
    )
    SELECT l_returnflag, l_orderkey, l_linenumber, dev_cents
    FROM r WHERE rn <= 5
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    """,
)
def x118_grouped_map_median_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def top_devs(pdf: pd.DataFrame) -> pd.DataFrame:
        cents_arr = pdf["cents"].to_numpy(dtype=np.int64)
        # group medians of ints are at worst int + 0.5 — exact in float64,
        # and the truncation to int64 below matches the oracle's CAST
        med = int(np.median(cents_arr))
        out = pdf.assign(dev_cents=cents_arr - med)
        out["absdev"] = out["dev_cents"].abs()
        out = out.sort_values(
            ["absdev", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(5)
        return out[["l_returnflag", "l_orderkey", "l_linenumber", "dev_cents"]]

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        cents(F.col("l_extendedprice")).alias("cents"),
    )
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(
            top_devs,
            "l_returnflag string, l_orderkey long, l_linenumber int, dev_cents long",
        )
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# x119 — cogrouped applyInPandas (SURVEY §2.9 surface): customer and
# supplier tables cogrouped per nation, merged in one pandas call into
# a per-nation account-balance reconciliation (counts + exact-cents
# medians per side). Cogroup delivers BOTH groups for a key in a single
# call — the Arrow path for custom two-table merge logic (interval
# matching, custom as-of variants) that a plain join can't express
# row-wise. Body is selection + integer arithmetic → fully oracled.
# Scale: shuffles both tables once on the cogroup key; each (key,
# left-group, right-group) pair must fit one executor's Arrow batch.
# --------------------------------------------------------------------------
@harness_query(
    "x119_cogroup_balance_reconciliation",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n,
             median(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS med
      FROM customer GROUP BY 1
    ), s AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n,
             median(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS med
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_suppliers,
           CAST(COALESCE(c.med, 0) AS DOUBLE) AS cust_median_cents,
           CAST(COALESCE(s.med, 0) AS DOUBLE) AS supp_median_cents
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
)
def x119_cogroup_balance_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np
    import pandas as pd

    def reconcile(key, cust: pd.DataFrame, supp: pd.DataFrame) -> pd.DataFrame:
        def med(df: pd.DataFrame) -> float:
            if len(df) == 0:
                return 0.0
            return float(np.median(df["bal_cents"].to_numpy(dtype=np.float64)))

        return pd.DataFrame(
            {
                "nationkey": [int(key[0])],
                "n_customers": [len(cust)],
                "n_suppliers": [len(supp)],
                "cust_median_cents": [med(cust)],
                "supp_median_cents": [med(supp)],
            }
        )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"), cents(F.col("c_acctbal")).alias("bal_cents")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"), cents(F.col("s_acctbal")).alias("bal_cents")
    )
    return (
        cust.groupBy("nk")
        .cogroup(supp.groupBy("nk"))
        .applyInPandas(
            reconcile,
            "nationkey int, n_customers long, n_suppliers long,"
            " cust_median_cents double, supp_median_cents double",
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# x120 — mapInArrow (SURVEY §2.9 surface): revenue-cents projection +
# quantity filter computed with pyarrow.compute kernels directly on
# Arrow RecordBatches — zero pandas materialization, the cheapest
# Python escape hatch for columnar row-wise logic. round half-away-
# from-zero matches Spark/DuckDB ROUND; all other ops integer.
# Scale: map-only (no shuffle); batch size bounded by
# spark.sql.execution.arrow.maxRecordsPerBatch.
# --------------------------------------------------------------------------
@harness_query(
    "x120_arrow_batch_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS INTEGER) AS l_linenumber,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    WHERE l_quantity >= 45
    ORDER BY l_orderkey, l_linenumber
    """,
)
def x120_arrow_batch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    def per_batch(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            qty = b.column(b.schema.get_field_index("l_quantity"))
            mask = pc.greater_equal(qty, pa.scalar(45.0))
            f = b.filter(mask)
            price = f.column(f.schema.get_field_index("l_extendedprice"))
            disc = f.column(f.schema.get_field_index("l_discount"))
            rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
            cents_col = pc.cast(
                pc.round(
                    pc.multiply(rev, pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    f.column(f.schema.get_field_index("l_orderkey")),
                    f.column(f.schema.get_field_index("l_linenumber")),
                    cents_col,
                ],
                names=["l_orderkey", "l_linenumber", "revenue_cents"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        per_batch,
        "l_orderkey long, l_linenumber int, revenue_cents long",
    ).orderBy("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# x121 — priority sampling (Duffield–Lund–Thorup): fixed-size weighted
# sample of orders with the unbiased max(w, τ) subset-sum estimator.
# Priorities are one exact IEEE division of hash-derived exact doubles,
# so the top-k cut, τ, and every estimator value replay bit-for-bit in
# DuckDB — a weighted sampler an external engine can audit.
# --------------------------------------------------------------------------
@harness_query(
    "x121_priority_sample",
    oracle=f"""
    WITH scored AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_cents,
             {{PRIORITY}} AS priority
      FROM (SELECT o_orderkey, o_totalprice FROM orders)
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY priority DESC, o_orderkey) AS rn
      FROM scored
    ), tau AS (
      SELECT MIN(priority) AS tau FROM ranked WHERE rn <= 41
    )
    SELECT o_orderkey, w_cents, priority,
           GREATEST(CAST(w_cents AS DOUBLE), tau) AS w_hat
    FROM ranked, tau
    WHERE rn <= 40
    ORDER BY o_orderkey
    """.replace(
        "{PRIORITY}", priority_sql("CAST(ROUND(o_totalprice * 100) AS BIGINT)", "o_orderkey", 7)
    ),
)
def x121_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from super_store_datawarehouse_spark.operators.sampling import priority_sample

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("w_cents")
    )
    picked = priority_sample(orders, "w_cents", "o_orderkey", k=40, salt=7)
    return picked.select("o_orderkey", "w_cents", "priority", "w_hat").orderBy(
        "o_orderkey"
    )
