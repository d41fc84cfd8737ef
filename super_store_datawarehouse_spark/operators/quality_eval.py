"""Inter-annotator / rater-model agreement metrics for label QA.

Training-data pipelines routinely compare two labelers — a rule gate
vs a model score, two model versions, or human vs heuristic — and gate
dataset releases on agreement. Cohen's kappa (Cohen 1960) corrects raw
agreement for chance; computed here from an INTEGER confusion matrix
with the final statistic as ONE IEEE division of two int64s, so the
metric value-oracles bit-exactly cross-engine:

    kappa = (N·Σ_c n_cc − Σ_c r_c·c_c) / (N² − Σ_c r_c·c_c)

(multiply the usual (p_o − p_e)/(1 − p_e) through by N²; n_cc are the
diagonal counts, r_c/c_c the marginals). Works for any number of label
classes. One shuffle (the confusion-matrix groupBy); the matrix and
marginals are |classes|²-sized — driver/broadcast-trivial.

No counterpart in the reference (reference core is the Superstore ETL
+ 13 MySQL queries); part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    df: DataFrame,
    label_a: str,
    label_b: str,
    group_keys: list[str] | None = None,
) -> DataFrame:
    """Cohen's kappa between two label columns, optionally per group.

    Returns one row per group: n, n_agree, agree_ppm (raw agreement in
    parts-per-million, integer), and kappa (double; NULL for the
    degenerate single-class case where chance agreement is 1).
    """
    keys = list(group_keys or [])
    conf = df.groupBy(
        *keys, F.col(label_a).alias("__a"), F.col(label_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__n"))
    # marginals via windowless re-aggregation: the confusion frame is
    # |classes|^2 rows per group — re-grouping it is free
    ra = conf.groupBy(
        *keys, F.col("__a").alias("__c")
    ).agg(F.sum("__n").alias("__ra"))
    cb = conf.groupBy(
        *keys, F.col("__b").alias("__c")
    ).agg(F.sum("__n").alias("__cb"))
    # chance term pairs the marginals of the SAME class: Σ_c r_c·c_c.
    # Inner join: a class absent from one side has marginal 0 there.
    margins = ra.join(cb, keys + ["__c"]).select(
        *keys, "__c", (F.col("__ra") * F.col("__cb")).alias("__rc")
    )
    per_group = conf.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0)).alias(
            "n_agree"
        ),
    )
    chance = margins.groupBy(*keys).agg(F.sum("__rc").alias("__rc_sum"))
    # LEFT join + coalesce-to-0: when the annotators share no label
    # value (disjoint vocabularies / total disagreement) the marginal
    # inner join is empty, chance has no row, and an inner join here
    # would silently DROP the group — the correct chance term is 0 and
    # kappa = n·n_agree/n² (0 for total disagreement).
    joined = (
        per_group.join(F.broadcast(chance), keys, "left")
        if keys
        else per_group.join(F.broadcast(chance), F.lit(True), "left")
    )
    sum_rc = F.coalesce(F.col("__rc_sum"), F.lit(0))
    kappa = F.try_divide(
        (F.col("n") * F.col("n_agree") - sum_rc).cast("double"),
        F.nullif(F.col("n") * F.col("n") - sum_rc, F.lit(0)).cast("double"),
    )
    return joined.select(
        *keys,
        "n",
        "n_agree",
        F.expr("n_agree * 1000000 div n").alias("agree_ppm"),
        kappa.alias("kappa"),
    )
