"""Bench regression guard — host-drift-immune since round 8.

Usage:
  python bench.py > /tmp/bench.out && python scripts/check_bench.py /tmp/bench.out
  python scripts/check_bench.py BENCH_r8.json

This host's speed drifts 1.2-2x between days with no code change
(BASELINE.md "Host-speed epochs"), so raw wall-clock cannot separate
code regressions from host epochs. bench.py therefore records, next to
each query's min-of-warm wall-clock:

  * ``canary_sec`` / ``host_factor`` — a fixed JVM-only canary job timed
    at bench start; host_factor rescales every wall number to the
    round-8 reference epoch;
  * ``queries_cpu_sec`` — per-query executor CPU time (mean-of-warm,
    from the Spark monitoring REST API), which is immune to scheduler
    wait and far less contention-sensitive than wall-clock.

Guard logic (VERDICT r7 #1 — fire on code regressions, not epochs):

  * A query REGRESSES (exit 1) when its canary-normalized wall trips
    the window AND its CPU time corroborates (cpu/base >= CPU_CORROB).
    A host epoch moves canary and queries together -> normalized wall
    stays flat; a contention spike that survives min-of-3 moves wall
    but not CPU -> warned, not failed.
  * A normalized-wall trip WITHOUT CPU corroboration, or a CPU-only
    trip, prints a WARNING (rerun standalone; suspected contention or
    driver-side work) but exits 0.
  * Totals: normalized headline total and headline CPU total each guard
    at TOTAL_FACTOR.

Legacy mode: a bench JSON without ``host_factor`` falls back to the
pre-round-8 dual-epoch wall guard (max of the two same-code baselines).
"""

from __future__ import annotations

import json
import sys

# --------------------------------------------------------------------------
# Round-8 reference recording (idle host, canary_sec == CANARY_REF_SEC
# by construction: the epoch that defines host_factor = 1.0).
# R8_WALL: min-of-warm wall seconds. R8_CPU: mean-of-warm executor CPU
# seconds. Filled from BENCH_r08's recording; scripts/gen_bench_baseline.py
# regenerates both dicts from a bench JSON.
# --------------------------------------------------------------------------
R8_WALL: dict[str, float] = {}
R8_CPU: dict[str, float] = {}
R8_TOTAL = None  # headline wall total at host_factor 1.0
R8_CPU_TOTAL = None  # headline CPU total

PER_QUERY_FACTOR = 1.8
PER_QUERY_ABS_FLOOR = 0.4  # sec — ignore noise blips on sub-second queries
CPU_FACTOR = 1.8
CPU_ABS_FLOOR = 0.5  # CPU-sec (summed across all cores — coarser floor)
CPU_CORROB = 1.3  # wall trip needs cpu/base >= this to count as code
TOTAL_FACTOR = 1.35

# --------------------------------------------------------------------------
# Legacy dual-epoch wall baselines (pre-round-8 fallback; kept verbatim
# so old BENCH_r*.json files stay checkable).
# --------------------------------------------------------------------------
BASELINE = {  # round-2, sf0.1, min-of-2 warm runs, Arrow drain (BASELINE.md)
    "q01_top_parts_by_quantity": 0.81,
    "q02_pricing_summary": 0.89,
    "q04_running_total_by_nation": 0.71,
    "q06_order_rollup": 0.61,
    "q08_dup_merge_weighted_discount": 0.85,
    "q11_brand_revenue_majority": 0.66,
    "q12_top_parts_concat_by_brand": 0.76,
    "q18_cumulative_monthly_revenue": 0.51,
    "q23_orders_above_average": 0.38,
    "q14_dedup_exact": 0.18,
    "x317_ngram_jaccard_exact": 1.30,  # ex-q17, renamed in the round-7 slot rotation
    "q19_minhash_lsh_pairs": 0.97,
    "q20_ann_bruteforce_topk": 0.46,
    "x290_events_hourly": 0.23,
    "q22_sessionize": 0.35,
    "q34_embedding_near_dup": 0.96,
    "x308_ann_lsh_topk": 0.79,
    "q37_asof_click_attribution": 0.31,
    "q38_range_join_next24h": 0.54,
    "x265_group_median_price": 0.94,  # ex-q40, renamed in the round-4 slot rotation
    "q44_tfidf_top_terms": 0.74,
    "q45_kmeans_clusters": 0.85,
    "x288_gapfill_locf": 0.28,
    "q49_training_pipeline": 0.61,
}
BASELINE_TOTAL = 15.654

EPOCH2 = {  # commit 004a0df, sf0.1, min-of-3 warm runs, 2026-08-15 host
    "q01_top_parts_by_quantity": 0.97,
    "q02_pricing_summary": 1.02,
    "q04_running_total_by_nation": 0.95,
    "q06_order_rollup": 0.88,
    "q08_dup_merge_weighted_discount": 0.99,
    "q11_brand_revenue_majority": 0.79,
    "q12_top_parts_concat_by_brand": 0.93,
    "q14_dedup_exact": 0.22,
    "x317_ngram_jaccard_exact": 1.73,  # ex-q17, renamed in the round-7 slot rotation
    "q18_cumulative_monthly_revenue": 0.58,
    # q19 re-baselined at the round-6 post-merge-hint measurement: the
    # non-broadcast hint that fixed the sf10 driver OOM costs ~0.3 s warm
    # at bench scale (1.02 s r5 -> 1.34 s r6). The baseline now reflects
    # the ACCEPTED post-hint cost — note this raise WIDENS the 1.8x
    # absolute absorption window (1.8x1.34 = 2.41 s vs 2.29 s from the
    # old 1.27 s base); the guard's job here is to anchor future drift
    # to the accepted cost, not to tighten the window (ADVICE r7 #1).
    "q19_minhash_lsh_pairs": 1.34,
    "q20_ann_bruteforce_topk": 0.74,
    "q22_sessionize": 0.41,
    "q23_orders_above_average": 0.44,
    "q28_hll_distinct_eval": 0.44,
    "q34_embedding_near_dup": 0.47,
    "x308_ann_lsh_topk": 0.99,
    "q37_asof_click_attribution": 0.36,
    "q38_range_join_next24h": 0.57,
    "q41_pca_power_iteration": 0.92,
    "q42_curation_pipeline_v2": 0.92,
    "q44_tfidf_top_terms": 0.97,
    "q45_kmeans_clusters": 1.14,
    "q49_training_pipeline": 0.80,
    "q50_bpe_merges": 1.34,
    "x172_boilerplate_chunk_scrub": 0.91,
    "x177_heavy_hitters_mg": 0.75,
    "x180_ring_negative_sampling": 0.81,
    "x181_incremental_join_delta": 0.96,
    "x204_bpe_encode_report": 1.18,
    "x207_source_datasheet": 0.64,
    "x265_group_median_price": 1.13,
    "x288_gapfill_locf": 0.38,
    "x290_events_hourly": 0.33,
    "q30_dq_expectations": 0.67,
    "q39_retrieval_eval": 2.68,
    "x294_int8_quant_recall": 4.64,
    "x296_bigram_lm_filter": 0.86,
    "q26_weighted_jaccard_pairs": 2.11,
    "q35_lsh_multiprobe_recall": 2.11,
    "x306_ivf_nprobe_frontier": 8.99,
    "q33_pq_ivf_ann_topk": 2.64,
    "q17_ngram_jaccard_dfcap": 1.17,
    "q46_markov_next_event_accuracy": 0.60,
    "q43_ppjoin_jaccard_pairs": 1.19,  # ex-x161, promoted in the round-8 rotation
}
EPOCH2_TOTAL = 19.073


def _legacy_check(bench: dict) -> list[str]:
    regressions = []
    for name in sorted(set(BASELINE) | set(EPOCH2)):
        got = bench["queries"].get(name)
        if got is None:
            regressions.append(f"{name}: missing from bench run")
            continue
        base = max(BASELINE.get(name, 0.0), EPOCH2.get(name, 0.0))
        if got > base * PER_QUERY_FACTOR and got - base > PER_QUERY_ABS_FLOOR:
            regressions.append(
                f"{name}: {got:.2f}s vs baseline {base:.2f}s ({got/base:.1f}x)"
            )
    total = bench.get("value")
    base_total = max(BASELINE_TOTAL, EPOCH2_TOTAL)
    if total is not None and total > base_total * TOTAL_FACTOR:
        regressions.append(
            f"TOTAL: {total:.2f}s vs baseline {base_total:.2f}s "
            f"({total/base_total:.1f}x)"
        )
    return regressions


def _normalized_check(bench: dict) -> tuple[list[str], list[str]]:
    """Round-8 guard: (regressions, warnings)."""
    hf = bench["host_factor"]
    cpu_meas = bench.get("queries_cpu_sec", {})
    regressions: list[str] = []
    warnings: list[str] = []
    for name in sorted(set(R8_WALL) | set(R8_CPU)):
        got = bench["queries"].get(name)
        if got is None:
            regressions.append(f"{name}: missing from bench run")
            continue
        wall_base = R8_WALL.get(name)
        cpu_base = R8_CPU.get(name)
        cpu_got = cpu_meas.get(name)
        eff = got / hf
        wall_trip = (
            wall_base is not None
            and eff > wall_base * PER_QUERY_FACTOR
            and eff - wall_base > PER_QUERY_ABS_FLOOR
        )
        cpu_trip = (
            cpu_base is not None
            and cpu_got is not None
            and cpu_got > cpu_base * CPU_FACTOR
            and cpu_got - cpu_base > CPU_ABS_FLOOR
        )
        cpu_ratio = (
            cpu_got / cpu_base
            if cpu_base not in (None, 0) and cpu_got is not None
            else None
        )
        if wall_trip and (cpu_trip or (cpu_ratio is not None and cpu_ratio >= CPU_CORROB)):
            regressions.append(
                f"{name}: norm-wall {eff:.2f}s vs {wall_base:.2f}s "
                f"({eff/wall_base:.1f}x), cpu {cpu_got:.2f}s vs "
                f"{cpu_base:.2f}s ({cpu_ratio:.1f}x) — CPU-corroborated"
            )
        elif wall_trip:
            warnings.append(
                f"{name}: norm-wall {eff:.2f}s vs {wall_base:.2f}s trips but "
                f"CPU flat ({'n/a' if cpu_ratio is None else f'{cpu_ratio:.2f}x'})"
                " — rerun standalone (contention or driver-side work)"
            )
        elif cpu_trip:
            warnings.append(
                f"{name}: cpu {cpu_got:.2f}s vs {cpu_base:.2f}s trips but "
                f"norm-wall fine ({eff:.2f}s vs {wall_base if wall_base else 0:.2f}s)"
            )
    total = bench.get("value")
    if total is not None and R8_TOTAL:
        eff_total = total / hf
        if eff_total > R8_TOTAL * TOTAL_FACTOR:
            cpu_total = sum(
                v for k, v in cpu_meas.items() if k in R8_CPU and k in bench["queries"]
            )
            msg = (
                f"TOTAL: norm-wall {eff_total:.2f}s vs {R8_TOTAL:.2f}s "
                f"({eff_total/R8_TOTAL:.1f}x)"
            )
            if R8_CPU_TOTAL and cpu_total > R8_CPU_TOTAL * CPU_CORROB:
                regressions.append(msg + " — CPU-corroborated")
            else:
                warnings.append(msg + " — CPU flat; suspected host/contention")
    return regressions, warnings


def main() -> int:
    raw = open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
    # take the last line that parses as the bench JSON object
    bench = None
    for line in raw.strip().splitlines():
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "queries" in obj:
            bench = obj
    if bench is None:
        print("no bench JSON line found in input")
        return 2

    if bench.get("host_factor") and R8_WALL:
        regressions, warnings = _normalized_check(bench)
        mode = (
            f"normalized (host_factor {bench['host_factor']:.2f}, "
            f"canary {bench.get('canary_sec', 0):.2f}s)"
        )
    else:
        regressions, warnings = _legacy_check(bench), []
        mode = "legacy dual-epoch wall"

    for w in warnings:
        print("  WARN " + w)
    if regressions:
        print("BENCH REGRESSIONS:")
        for r in regressions:
            print("  " + r)
        return 1
    n = len(set(R8_WALL) | set(R8_CPU)) if R8_WALL else len(set(BASELINE) | set(EPOCH2))
    print(
        f"bench ok [{mode}]: total {bench.get('value'):.2f}s "
        f"({n} queries within tolerance, {len(warnings)} warnings)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
