"""Bench regression guard: compare a BENCH json line against the
recorded round-1 baseline and flag per-query and total regressions.

Usage:
  python bench.py > /tmp/bench.out && python scripts/check_bench.py /tmp/bench.out
  python scripts/check_bench.py BENCH_r2.json

Tolerances are deliberately loose (sub-second queries carry ±10-15%
machine noise — see BASELINE.md closing note): a query regresses at
>1.8× its baseline AND >0.4 s absolute; the total regresses at >1.35×.
Exit 1 on any regression so this can gate CI / end-of-round checks.
"""

from __future__ import annotations

import json
import sys

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
    "q17_ngram_jaccard_pairs": 1.30,
    "q19_minhash_lsh_pairs": 0.97,
    "q20_ann_bruteforce_topk": 0.46,
    "x290_events_hourly": 0.23,
    "q22_sessionize": 0.35,
    "q34_embedding_near_dup": 0.96,
    "q35_ann_lsh_topk": 0.79,
    "q37_asof_click_attribution": 0.31,
    "q38_range_join_next24h": 0.54,
    "x265_group_median_price": 0.94,  # ex-q40, renamed in the round-4 slot rotation
    "q44_tfidf_top_terms": 0.74,
    "q45_kmeans_clusters": 0.85,
    "x288_gapfill_locf": 0.28,
    "q49_training_pipeline": 0.61,
}
BASELINE_TOTAL = 15.654

PER_QUERY_FACTOR = 1.8
PER_QUERY_ABS_FLOOR = 0.4  # sec — ignore noise blips on sub-second queries
TOTAL_FACTOR = 1.35


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

    regressions = []
    for name, base in BASELINE.items():
        got = bench["queries"].get(name)
        if got is None:
            regressions.append(f"{name}: missing from bench run")
            continue
        if got > base * PER_QUERY_FACTOR and got - base > PER_QUERY_ABS_FLOOR:
            regressions.append(f"{name}: {got:.2f}s vs baseline {base:.2f}s ({got/base:.1f}x)")
    total = bench.get("value")
    if total is not None and total > BASELINE_TOTAL * TOTAL_FACTOR:
        regressions.append(
            f"TOTAL: {total:.2f}s vs baseline {BASELINE_TOTAL:.2f}s ({total/BASELINE_TOTAL:.1f}x)"
        )

    if regressions:
        print("BENCH REGRESSIONS:")
        for r in regressions:
            print("  " + r)
        return 1
    print(
        f"bench ok: total {total:.2f}s vs baseline {BASELINE_TOTAL:.2f}s "
        f"({len(BASELINE)} queries within tolerance)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
