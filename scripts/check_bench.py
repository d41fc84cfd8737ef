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

# Host epoch 2 (2026-08-15): the sandbox host slowed ~1.2-2x mid-round-5
# with NO code change — the round-start commit (004a0df) re-benched at
# 19.07 s total on an idle machine (load <3/32, 97% idle) vs its own
# 15.3-15.6 s recordings the day before, and a back-to-back A/B against
# HEAD showed HEAD marginally FASTER (18.42 s vs 19.07 s). A guard that
# compares against the fast-epoch numbers alone cannot distinguish code
# regressions from host drift, so each query is judged against the MAX
# of the two same-code baselines (and the total against the epoch-2
# total when the fast-epoch bound trips). Evidence in BASELINE.md
# "Host-speed epochs".
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
    # round-6 additions to the EXTENDED trail (VERDICT r5 #5), recorded
    # under the same 2026-08-15 epoch-2 host at commit b01e120. x294 and
    # x306 are declared sweeps (exact double-GEMM recall baseline; the
    # nprobe recall/cost frontier runs the IVF search at several nprobe
    # settings), hence their size — they are extended-trail only and do
    # not enter the 24-query headline total.
    "q30_dq_expectations": 0.67,
    "q39_retrieval_eval": 2.68,
    "x294_int8_quant_recall": 4.64,
    "x296_bigram_lm_filter": 0.86,
    "q26_weighted_jaccard_pairs": 2.11,
    "q35_lsh_multiprobe_recall": 2.11,
    "x306_ivf_nprobe_frontier": 8.99,
    # fixed-budget IVFADC, promoted to the q33 slot in the round-7
    # rotation (caps are no-ops at sf0.1 — same plan as the x318 baseline
    # plus two TakeOrderedAndProject); baseline recorded as x316 round 6
    "q33_pq_ivf_ann_topk": 2.64,
    # round-7 rotation promotions + the re-registered PPJoin showcase,
    # recorded on the 2026-08-15 epoch-2 host at the round-7 final bench
    "q17_ngram_jaccard_dfcap": 1.17,
    "q46_markov_next_event_accuracy": 0.60,
    "x161_ppjoin_jaccard_pairs": 1.19,
}
EPOCH2_TOTAL = 19.073

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
    for name in sorted(set(BASELINE) | set(EPOCH2)):
        got = bench["queries"].get(name)
        if got is None:
            regressions.append(f"{name}: missing from bench run")
            continue
        base = max(BASELINE.get(name, 0.0), EPOCH2.get(name, 0.0))
        if got > base * PER_QUERY_FACTOR and got - base > PER_QUERY_ABS_FLOOR:
            regressions.append(f"{name}: {got:.2f}s vs baseline {base:.2f}s ({got/base:.1f}x)")
    total = bench.get("value")
    base_total = max(BASELINE_TOTAL, EPOCH2_TOTAL)
    if total is not None and total > base_total * TOTAL_FACTOR:
        regressions.append(
            f"TOTAL: {total:.2f}s vs baseline {base_total:.2f}s ({total/base_total:.1f}x)"
        )

    if regressions:
        print("BENCH REGRESSIONS:")
        for r in regressions:
            print("  " + r)
        return 1
    print(
        f"bench ok: total {total:.2f}s vs baseline {base_total:.2f}s "
        f"({len(set(BASELINE) | set(EPOCH2))} queries within tolerance)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
