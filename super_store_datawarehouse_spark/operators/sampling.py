"""Deterministic sampling and dataset splitting for reproducible
training-data pipelines.

``rand()``-based sampling is not reproducible across runs, partitionings,
or engines, which makes lineage audits impossible. These operators hash a
stable integer key with a Knuth multiplicative scramble into 10,000
buckets and select by bucket range, so

- the same row lands in the same split/sample on every run, any cluster,
  any partitioning (the decision is a pure row-local expression —
  no shuffle, fully codegen'd, pushable below joins);
- membership is expressible in portable integer SQL, so an external
  engine can reproduce (and audit) the exact sample;
- disjointness of train/val/test is by construction (bucket ranges).

Keys may be negative (pmod normalizes); |key| must be < 2^31 so the
product stays inside int64. ``bucket_sql`` assumes non-negative keys —
wrap with the usual ((x % m) + m) % m when auditing signed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative-hash constant
N_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 10000) from an integer key column.

    pmod (not %) so negative keys still land in [0, 10000) — Spark's %
    keeps the dividend sign, and a negative bucket would silently pass
    every `bucket < threshold` sample/split filter.

    The key is reduced to [0, 2^31) BEFORE the Knuth multiply: the
    product then stays below 2^63, so the expression never wraps int64
    (non-ANSI) or throws (ANSI) — even for xxhash64-derived keys that
    span the full int64 range. ``bucket_sql`` mirrors the reduction so
    the audit twin stays bit-identical.
    """
    c = F.col(key) if isinstance(key, str) else key
    narrow = F.pmod(c, F.lit(1 << 31))
    return F.pmod(
        F.pmod((narrow + F.lit(salt)) * F.lit(KNUTH), F.lit(1 << 32)),
        F.lit(N_BUCKETS),
    )


def bucket_sql(key: str, salt: int = 0) -> str:
    """The identical bucket expression in portable SQL (audit twin).

    Uses a double-mod idiom for pmod (portable across engines whose %
    keeps the dividend sign), including the same pre-multiply key
    reduction to [0, 2^31) as :func:`hash_bucket`.
    """
    narrow = f"((({key}) % {1 << 31} + {1 << 31}) % {1 << 31})"
    return f"(({narrow} + {salt}) * {KNUTH}) % {1 << 32} % {N_BUCKETS}"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep rows whose bucket falls below fraction·10000 — a reproducible
    ~fraction sample, stable under reruns and repartitioning."""
    return df.filter(hash_bucket(key_col, salt) < int(round(fraction * N_BUCKETS)))


def split_column(
    key_col: str, weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"), salt: int = 0,
) -> Column:
    """Split label from contiguous bucket ranges: disjoint and exhaustive
    by construction."""
    bucket = hash_bucket(key_col, salt)
    bounds = []
    acc = 0.0
    for w in weights:
        acc += w
        bounds.append(int(round(acc * N_BUCKETS)))
    expr = F.when(bucket < bounds[0], F.lit(names[0]))
    for hi, name in zip(bounds[1:], names[1:]):
        expr = expr.when(bucket < hi, F.lit(name))
    return expr.otherwise(F.lit(names[-1]))


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]], key_col: str, salt: int = 0
) -> DataFrame:
    """Deterministic dataset mixture: union each source's hash-sample at
    its mixture fraction, tagging rows with the source name. The standard
    training-mix operator (e.g. 100% curated + 30% web crawl), fully
    reproducible and auditable via ``bucket_sql``.

    All sources must share a schema; fractions apply independently per
    source (same-key rows in different sources are sampled independently
    because the source name salts the bucket).
    """
    import zlib

    mixed = None
    for name, (df, fraction) in sorted(sources.items()):
        # crc32 of the name: distinct sources get decorrelated hash
        # streams (a character-sum salt would collide for anagrams,
        # silently correlating their samples)
        src_salt = salt + zlib.crc32(name.encode("utf-8")) % (1 << 20)
        part = hash_sample(df, key_col, fraction, salt=src_salt).withColumn(
            "mix_source", F.lit(name)
        )
        mixed = part if mixed is None else mixed.unionByName(part)
    return mixed


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep all `en`, half of `zh`). The threshold is a when-chain on the
    stratum column — row-local, no shuffle, prunable."""
    bucket = hash_bucket(key_col, salt)
    thr = F.lit(int(round(default_fraction * N_BUCKETS)))
    expr = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lim = F.lit(int(round(frac * N_BUCKETS)))
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    threshold = expr.otherwise(thr) if expr is not None else thr
    return df.filter(bucket < threshold)
