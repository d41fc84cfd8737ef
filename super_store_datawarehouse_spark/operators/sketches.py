"""Count-min sketch (Cormode & Muthukrishnan 2005) over token streams.

The canonical sublinear frequency estimator for heavy-hitter style
questions at corpus scale: d×W counters regardless of input size, so
the distributed build is one hash-agg shuffle whose key space is at
most d·W cells — at 100 TB the sketch stays a few KB while exact
per-token counts would shuffle the full vocabulary. Counter updates
are additions, which makes partial sketches *exactly* mergeable
(map-side combine does most of the work); the point estimate is the
minimum over the d matched counters and is one-sided: est ≥ true
always, est ≤ true + εN with probability 1−δ for ε=e/W, δ=e^(−d).

Portability: tokens hash through the same (h·31 + ascii) % 2³¹
polynomial fold used by ``minhash_portable`` (operators/dedup.py), and
rows use affine (aᵢ·h + bᵢ) % 2³¹ % W maps with coefficients from the
shared ``_minhash_coeffs`` generator — every step replays in any SQL
engine, so the sketch contents AND the estimates are value-oracled
(x141), not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from super_store_datawarehouse_spark.operators.dedup import _minhash_coeffs

CMS_MOD = 1 << 31


def poly_word_hash(col: Column | str) -> Column:
    """Portable polynomial hash of a token: fold (h·31 + ascii(ch)) % 2³¹
    seeded at 7 — identical to the shingle hash in minhash_portable."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes, F.lit(7).cast("long"), lambda h, x: (h * 31 + x) % F.lit(CMS_MOD)
    )


def cms_coeffs(depth: int, seed: int = 7) -> list[tuple[int, int]]:
    """Affine row-hash coefficients (aᵢ, bᵢ), both < 2³¹."""
    return _minhash_coeffs(depth, seed=seed)


def countmin_build(
    tokens: DataFrame,
    token_col: str = "word",
    depth: int = 4,
    width: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Build the sketch from a token *stream* (duplicates = counts).

    Returns (r, pos, cnt) — at most depth·width rows. Cells never
    touched are simply absent (an implicit zero).
    """
    coeffs = cms_coeffs(depth, seed)
    hs = poly_word_hash(token_col)
    cells = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        (((hs * a + b) % CMS_MOD) % width).alias("pos"),
                    )
                    for r, (a, b) in enumerate(coeffs)
                ]
            )
        ).alias("c")
    ).select("c.r", "c.pos")
    return cells.groupBy("r", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    token_col: str = "word",
    depth: int = 4,
    width: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the d counters.

    The sketch side is tiny (≤ depth·width rows) — broadcast it so the
    estimate never shuffles the item table.
    """
    coeffs = cms_coeffs(depth, seed)
    hs = poly_word_hash(token_col)
    probes = items.select(
        F.col(token_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        (((hs * a + b) % CMS_MOD) % width).alias("pos"),
                    )
                    for r, (a, b) in enumerate(coeffs)
                ]
            )
        ).alias("c"),
    ).select(token_col, "c.r", "c.pos")
    return (
        probes.join(F.broadcast(sketch), ["r", "pos"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def misra_gries_candidates(
    tokens: DataFrame, token_col: str = "word", k: int = 30
) -> DataFrame:
    """Per-partition Misra–Gries summaries (Misra & Gries 1982) — the
    deterministic heavy-hitter sketch: k counters per partition, so the
    full pass over an arbitrarily large token stream returns at most
    k·num_partitions candidate rows.

    Guarantee (mergeable-summaries, Agarwal et al. 2013): each
    partition's summary undercounts any item by at most N_p/(k+1), so
    every item with *global* count > N/(k+1) survives in at least one
    partition (pigeonhole over the partials) — the union is a superset
    of the true heavy hitters for ANY partitioning. Pair with an exact
    semi-join recount (:func:`heavy_hitters_exact`) to get the precise
    set + counts without ever shuffling the full vocabulary.

    Arrow-batched: each batch folds in via pandas ``value_counts``
    (weighted MG insert: add batch counts, then subtract the (k+1)-th
    largest running count from everything and drop the non-positives —
    the classic merge step, never a per-row Python loop).
    """
    import pandas as pd

    out_schema = f"{token_col} string, mg_cnt long"

    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[token_col].value_counts()
            for w, c in vc.items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {
                    w: c - kth for w, c in counters.items() if c - kth > 0
                }
        yield pd.DataFrame(
            {token_col: list(counters.keys()), "mg_cnt": list(counters.values())}
        )

    return tokens.select(token_col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters_exact(
    tokens: DataFrame, token_col: str = "word", k: int = 30
) -> DataFrame:
    """Exact heavy hitters (count·(k+1) > N) at sketch cost: MG
    candidates (tiny) → semi-join recount of candidates only → exact
    threshold filter. The only full-data shuffle keys on the candidate
    subset, never the whole vocabulary."""
    cand = misra_gries_candidates(tokens, token_col, k).select(token_col).distinct()
    total = tokens.count()
    return (
        tokens.join(F.broadcast(cand), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * (k + 1) > F.lit(total))
    )
