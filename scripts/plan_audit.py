"""Automated physical-plan antipattern audit over the ENTIRE harness.

Builds every registered query's executed plan (no data is read — plans
only) and flags the structures that kill 100 TB runs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin Inner`` on non-tiny
  sides (all-pairs blowups),
- ``PythonUDF``-eval of row-at-a-time UDFs (``BatchEvalPython``) — the
  Arrow paths (``ArrowEvalPython``, ``MapInPandas``, ``FlatMapGroupsIn
  Pandas``) are allowed,
- single-partition global ``Exchange SinglePartition`` directly beneath
  another shuffle (accidental serialization point) — reported as info,
  since scalar aggregates legitimately use it.

An allowlist carries the queries where a flagged shape is the declared
design (documented exact baselines / k-row broadcast probes). Exit 1 on
any unallowed finding, so this gates end-of-round next to
``scripts/smoke_harness.py`` and ``scripts/check_bench.py``.

Usage: python scripts/plan_audit.py [sf_dir] [--report out.md]
"""

from __future__ import annotations

import os
import sys

try:  # engine import: resolves via `pip install -e .` / `setup.py develop`
    import super_store_datawarehouse_spark  # noqa: F401
except ImportError:  # raw checkout without an editable install
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from super_store_datawarehouse_spark.session import (
    get_spark,
    release_scoped_caches,
)

# Declared-by-design exceptions, each with the reason the shape is ok.
ALLOW: dict[str, str] = {
    # exact all-pairs baselines, documented as the oracle twins of the
    # banded/bucketed production paths
    "x317_ngram_jaccard_exact": "exact-baseline self-join (LSH twin: q19; ex-q17)",
    "q34_embedding_near_dup": "exact near-dup baseline (SemDeDup twin: x135)",
    "x329_ann_bruteforce_topk": "exact ANN baseline (LSH/IVF twins: q35/q42)",
    "x338_selection_median": "selection-vs-sort demo on a scalar",
    "x150_ann_recall_eval": "composes x329 exact baseline by design",
    "x213_ranking_metrics_eval": "composes x329 exact baseline by design",
    "q43_ppjoin_jaccard_pairs": "prefix-filter reference path (see SCALE.md)",
    "x138_ngram_containment_pairs": "bounded asymmetric-containment pair scan",
    "x148_cross_split_embedding_contamination": "split-vs-split bounded scan",
    "x131_fuzzy_linkage": "20-row dirty probe side broadcast NL by design",
    "x194_sorted_neighborhood_pairs": "bounded window-offset candidate scan",
    "x109_pps_weighted_sample": "k-row probe side broadcast NL by design",
    "x209_pps_ht_estimate_eval": "k-row probe side broadcast NL by design",
    "x121_priority_sample": "k-row threshold broadcast NL by design",
    "q35_semantic_dedup_pairs": "within-cluster exact verify by design",
    "x146_dedup_representatives": "within-cluster exact verify by design",
    # inner BroadcastNestedLoopJoins whose build side is k rows or a
    # scalar aggregate — the broadcast side is bounded by construction
    "x318_pq_ivf_hash_fraction": "probe x sqrt(n)-row centroid table (declared baseline, ex-q33)",
    "q33_pq_ivf_ann_topk": "probe x <=512-cell centroid table / <=256-codeword book (fixed budgets; ex-x316)",
    "x263_ivf_ann_topk": "probe x sqrt(n)-row centroid table",
    "x125_pq_ann_topk": "probe x m-row codebook",
    # persisted-index lifecycle queries (round 10): the only BNLJ is the
    # ADC distance-table build — probe x the STORED codebook, which is
    # capped at 256 codewords by the index budget (x125/q33's declared
    # shape; the corpus side never cross-joins anything)
    "q20_pq_index_lifecycle": "probe x <=256-codeword stored book (dtab build; x125's shape)",
    "x331_ivfadc_index_lifecycle": "probe x <=512-cell centroids / <=256-codeword stored book (q33's shape)",
    "x333_pq_index_update_roundtrip": "probe x <=256-codeword stored book (dtab build; x125's shape)",
    "x134_pq_refined_topk": "probe x m-row codebook",
    "x132_knn_label_vote": "query-side != filter on a k-row broadcast",
    "x169_mmr_rerank": "k x k shortlist pair sims (k=10)",
    "x180_ring_negative_sampling": "anchors x |sources|-row distinct side",
    "x189_hll_union_eval": "|types|x|types| pair frame + 10-row OR probe",
    "x33_fuzzy_supplier_pairs": "bounded supplier-name pair scan (declared)",
    "x47_funnel_stages": "scalar stage-threshold broadcast",
    "x77_rolling_7d_distinct_users": "scalar date-boundary broadcast",
    "x96_dormant_rich_customers": "scalar percentile-threshold broadcast",
    "x231_theta_sketch_set_ops": "pairs x (k·|types|)-row sketch broadcast",
    "x222_selectivity_estimate_eval": "4-row predicate frame x 64-bin histogram",
    "x237_kendall_tau": "|groups|x|groups| pair frame (25 rows a side)",
    "q27_rag_context_assembly": "5-row query-doc side broadcast x corpus",
    "q40_quantile_summary_eval": "3-row estimate frame broadcast x corpus (rank-counting pass)",
    "x335_summary_recompaction_eval": "2-row estimate/1-row size frames broadcast x corpus (rank-counting pass)",
    "q15_stream_quantile_state": "2-row estimate/1-row meta frames broadcast x corpus (rank-counting pass)",
    "x340_summary_shard_merge": "3-row estimate frame broadcast x corpus (rank-counting pass; q40's eval shape)",
}


def audit_plan(name: str, plan: str) -> list[str]:
    findings = []
    if "CartesianProduct" in plan:
        findings.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and "Inner" in plan.split(
        "BroadcastNestedLoopJoin", 1
    )[1].split("\n", 1)[0]:
        # inner BNLJ: fine for 1-row/k-row scalar sides, deadly otherwise
        findings.append("BroadcastNestedLoopJoin Inner")
    if "BatchEvalPython" in plan:
        findings.append("row-at-a-time PythonUDF (BatchEvalPython)")
    return findings


def main() -> int:
    report_path = None
    argv = sys.argv[1:]
    if "--report" in argv:
        i = argv.index("--report")
        report_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    from super_store_datawarehouse_spark.plans import HARNESS
    from super_store_datawarehouse_spark.plans import harness as _h  # noqa: F401
    from super_store_datawarehouse_spark.plans import extensions as _x  # noqa: F401

    try:
        from super_store_datawarehouse_spark.plans import (  # noqa: F401
            pipeline_ops as _p,
        )
    except ImportError:
        pass

    rows, bad = [], []
    for name in sorted(HARNESS):
        builder, _ = HARNESS[name]
        try:
            df = builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must see every query
            bad.append((name, [f"plan build failed: {exc}"]))
            continue
        release_scoped_caches()
        findings = audit_plan(name, plan)
        if findings and name in ALLOW:
            rows.append((name, findings, ALLOW[name]))
        elif findings:
            bad.append((name, findings))
        else:
            rows.append((name, [], ""))

    clean = sum(1 for _, f, _r in rows if not f)
    allowed = [(n, f, r) for n, f, r in rows if f]
    lines = [
        "# PLAN_AUDIT — automated antipattern scan of every harness query",
        "",
        f"{len(rows) + len(bad)} queries scanned at {sf_dir}: "
        f"**{clean} clean**, {len(allowed)} flagged-but-declared "
        f"(documented exact baselines / k-row probe sides), "
        f"{len(bad)} violations.",
        "",
    ]
    if allowed:
        lines += ["| query | shape | declared reason |", "|---|---|---|"]
        for n, f, r in allowed:
            lines.append(f"| {n} | {', '.join(f)} | {r} |")
        lines.append("")
    if bad:
        lines += ["## VIOLATIONS", ""]
        for n, f in bad:
            lines.append(f"- **{n}**: {', '.join(f)}")
    # Full scanned-name appendix: lets the registry≡PLAN_AUDIT pytest
    # invariant assert SET equality, so this report can never again
    # certify a smaller surface than what ships (VERDICT r7 #2).
    lines += ["", "## Scanned queries", ""]
    scanned = sorted([n for n, _f, _r in rows] + [n for n, _f in bad])
    lines += [f"- {n}" for n in scanned]
    body = "\n".join(lines)
    if report_path:
        with open(report_path, "w") as fh:
            fh.write(body + "\n")
        print(f"wrote {report_path}")
    print(
        f"plan audit: {clean} clean / {len(allowed)} declared / {len(bad)} violations"
    )
    for n, f in bad:
        print(f"  VIOLATION {n}: {', '.join(f)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
