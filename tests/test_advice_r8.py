"""Round-8 ADVICE regression tests.

1. ``brute_force_topk`` must not evict a CALLER-persisted queries frame:
   its internal pushdown cache-barrier persists/unpersists only when the
   caller had not already persisted (ADVICE r7 #3 — the finally-unpersist
   silently dropped the caller's cache entry).
2. ``_ProgressCounter`` (the ``recentProgress``-cap fix, ADVICE r7 #4)
   counts non-empty batches correctly past the 100-entry cap that
   ``query.recentProgress`` is subject to, and filters by query id.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from super_store_datawarehouse_spark.operators import similarity
from super_store_datawarehouse_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_brute_force_topk_preserves_caller_cache(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).persist()
    try:
        q.count()  # materialize the caller's cache
        assert q.is_cached
        out = similarity.brute_force_topk(emb, q, k=3)
        assert out.count() > 0
        # the operator's internal barrier must not have evicted it
        assert q.is_cached
    finally:
        q.unpersist()


def test_brute_force_topk_unpersists_own_barrier(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    assert not q.is_cached
    out = similarity.brute_force_topk(emb, q, k=3)
    assert out.count() > 0
    assert not q.is_cached  # its scoped barrier was released


def test_progress_counter_not_capped_at_100(spark):
    """The count derives from the listener stream, not recentProgress:
    feed >100 synthetic progress entries and expect them ALL counted
    (recentProgress would have retained only the last 100)."""
    from super_store_datawarehouse_spark.streaming.jobs import _ProgressCounter

    counter = _ProgressCounter(spark)
    try:
        qid = "11111111-2222-3333-4444-555555555555"
        other = "99999999-8888-7777-6666-555555555555"
        # 150 non-empty + 7 empty batches for our query, 5 for another
        counter._seen.extend((qid, i, 40000) for i in range(150))
        counter._seen.extend((qid, 150 + i, 0) for i in range(7))
        counter._seen.extend((other, i, 123) for i in range(5))

        class _FakeQuery:
            id = qid
            lastProgress = {"id": qid, "batchId": 156}

        assert counter.non_empty_batches(_FakeQuery()) == 150
    finally:
        counter.remove()


def test_sessionize_batch_count_matches_listener(tmp_path, spark):
    """End-to-end: the returned batch count equals the number of staged
    non-empty source files (maxFilesPerTrigger=1 => one batch each)."""
    from super_store_datawarehouse_spark.streaming.jobs import (
        stream_sessionize_to_parquet,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for i in range(3):
        stage = tmp_path / f"stage_{i}"
        ev.filter(F.col("event_id") % 3 == i).coalesce(
            1
        ).write.parquet(str(stage), mode="overwrite")
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(str(stage / part), str(src / f"events_b{i}.parquet"))
    n = stream_sessionize_to_parquet(
        spark,
        str(src),
        str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert n == 3


def _registry():
    import __spark_entry__ as entrymod

    return entrymod


def test_plan_audit_scanned_set_matches_registry():
    """PLAN_AUDIT.md certifies the anti-pattern scan; its scanned-query
    appendix must equal the live registry, so the audit doc can never
    certify a smaller surface than what ships (VERDICT r7 #2 — round 7
    shipped a 317-query registry with a '316 queries scanned' audit)."""
    import re

    entrymod = _registry()
    registered = set(entrymod.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLAN_AUDIT.md")) as fh:
        body = fh.read()
    m = re.search(r"^## Scanned queries$", body, re.M)
    assert m, "PLAN_AUDIT.md lacks the '## Scanned queries' appendix — regenerate with scripts/plan_audit.py --report"
    scanned = set(re.findall(r"^- ([qx]\d+\w+)$", body[m.end():], re.M))
    assert scanned == registered, (
        f"PLAN_AUDIT.md vs registry drift: only-scanned="
        f"{sorted(scanned - registered)} only-registered="
        f"{sorted(registered - scanned)} — regenerate with "
        "python scripts/plan_audit.py <sf_dir> --report PLAN_AUDIT.md"
    )
    # the headline count must agree with the appendix it summarizes
    mc = re.search(r"^(\d+) queries scanned", body, re.M)
    assert mc and int(mc.group(1)) == len(scanned)


def test_readme_surface_counts_match_registry():
    """README's 'N harness queries, M fully value-oracled' line must
    track the registry (VERDICT r7 #2: README certified 316/313 while
    the registry held 317/314)."""
    import re

    entrymod = _registry()
    n_total = len(entrymod.queries())
    n_oracled = len(entrymod.oracle_sql())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "README.md")) as fh:
        body = fh.read()
    pairs = re.findall(r"(\d+) harness queries, (\d+) fully value-oracled", body)
    assert pairs, "README.md lost its harness-count line"
    # earlier occurrences are historical per-round narration; the LAST
    # one states the current surface and must track the registry
    total, oracled = pairs[-1]
    assert (int(total), int(oracled)) == (n_total, n_oracled), (
        f"README says {total}/{oracled}, registry has "
        f"{n_total}/{n_oracled} — update README.md"
    )


def _run_check_bench(tmp_path, mutate):
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = json.load(open(os.path.join(root, "BENCH_r08_builder.json")))
    bench = src["parsed"] if "parsed" in src else src
    # the r8 artifact predates the round-9 slot rotation; bench keys
    # follow the computation, so replay it under the current names and
    # with the round-9 promotions' recorded baselines present
    renames = {
        "q26_weighted_jaccard_pairs": "x326_weighted_jaccard_pairs",
        "q35_lsh_multiprobe_recall": "x327_lsh_multiprobe_recall",
        "q17_ngram_jaccard_dfcap": "x328_ngram_jaccard_dfcap",
        "x172_boilerplate_chunk_scrub": "q17_boilerplate_chunk_scrub",
        # round-10 rotation
        "q20_ann_bruteforce_topk": "x329_ann_bruteforce_topk",
    }
    sys.path.insert(0, os.path.join(root, "scripts"))
    import check_bench

    for field in ("queries", "queries_cpu_sec", "queries_run_sec"):
        d = bench.get(field)
        if not d:
            continue
        for old, new in renames.items():
            if old in d:
                d[new] = d.pop(old)
    # promotions recorded after the r8 artifact: replay them at exactly
    # their stored baselines (any baseline key the artifact lacks)
    for name in set(check_bench.R8_WALL) | set(check_bench.R8_CPU):
        if name in check_bench.R8_WALL:
            bench["queries"].setdefault(name, check_bench.R8_WALL[name])
        if name in check_bench.R8_CPU:
            bench["queries_cpu_sec"].setdefault(name, check_bench.R8_CPU[name])
        if name in check_bench.R8_RUN:
            bench["queries_run_sec"].setdefault(name, check_bench.R8_RUN[name])
    mutate(bench)
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(bench))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "check_bench.py"), str(p)],
        capture_output=True,
        text=True,
    )
    return r.returncode, r.stdout


def test_check_bench_fires_on_corroborated_regression(tmp_path):
    """3x wall + 3x cpu on one query = a code regression: exit 1."""

    def mutate(b):
        q = "q19_minhash_lsh_pairs"
        b["queries"][q] *= 3
        b["queries_cpu_sec"][q] *= 3

    rc, out = _run_check_bench(tmp_path, mutate)
    assert rc == 1 and "q19_minhash_lsh_pairs" in out


def test_check_bench_warns_not_fails_on_wall_only_spike(tmp_path):
    """3x wall with flat executor metrics = contention, not code: warn,
    exit 0 (the fire-on-code-not-epochs contract, VERDICT r7 #1)."""

    def mutate(b):
        b["queries"]["q19_minhash_lsh_pairs"] *= 3

    rc, out = _run_check_bench(tmp_path, mutate)
    assert rc == 0 and "WARN" in out


def test_check_bench_ignores_uniform_host_epoch(tmp_path):
    """Everything (canary included) 1.7x slower = a host epoch: clean
    pass, no warnings."""

    def mutate(b):
        for k in b["queries"]:
            b["queries"][k] = round(b["queries"][k] * 1.7, 3)
        b["value"] = round(b["value"] * 1.7, 3)
        b["canary_sec"] = round(b["canary_sec"] * 1.7, 3)
        b["host_factor"] = round(b["canary_sec"] / b["canary_ref_sec"], 3)

    rc, out = _run_check_bench(tmp_path, mutate)
    assert rc == 0 and "WARN" not in out


def test_brute_force_topk_preserves_scoped_cache(spark):
    """VERDICT r8 open item: the ``is_cached`` guard must cover
    ``scoped_cache`` too. scoped_cache returns the SAME DataFrame object
    it cached, so the guard sees it directly; additionally pin the
    empirical Spark-4 behavior that an equal-plan REBUILT object neither
    reads as cached nor evicts the original's entry on unpersist — i.e.
    even a caller passing a rebuilt lineage cannot have its scoped cache
    silently dropped by the operator's barrier."""
    from super_store_datawarehouse_spark.session import (
        release_scoped_caches,
        scoped_cache,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    release_scoped_caches()
    q = scoped_cache(emb.filter(F.col("vec_id") < 5))
    try:
        q.count()
        assert q.is_cached
        out = similarity.brute_force_topk(emb, q, k=3)
        assert out.count() > 0
        assert q.is_cached  # the operator's barrier did not evict it

        # equal-plan rebuilt object: not seen as cached (object-keyed
        # probe) and its unpersist does not cascade to q's entry
        q2 = emb.filter(F.col("vec_id") < 5)
        assert not q2.is_cached
        q2.unpersist(False)
        assert q.is_cached
    finally:
        release_scoped_caches()


def test_check_bench_py_epoch_downgrades_bounded_corroborated_trip(tmp_path):
    """Round-9 second-epoch rule: a corroborated wall trip WITHIN the
    bounded absorption window is a warning (not a failure) when the
    Python-path canary shows an extreme epoch — the q08 ground truth
    (1.8x wall / 2.1x cpu under py-epoch 7.7, clean standalone)."""

    def mutate(b):
        q = "q08_dup_merge_weighted_discount"
        b["queries"][q] *= 1.9
        b["queries_cpu_sec"][q] *= 2.1
        b["host_factor_py"] = 7.7

    rc, out = _run_check_bench(tmp_path, mutate)
    assert rc == 0
    assert "python-path epoch" in out and "q08_dup_merge" in out


def test_check_bench_py_epoch_cannot_absolve_a_manyfold_regression(tmp_path):
    """The absolution is BOUNDED: a 6x corroborated regression fails
    even during the worst recorded Python epoch."""

    def mutate(b):
        q = "q08_dup_merge_weighted_discount"
        b["queries"][q] *= 6
        b["queries_cpu_sec"][q] *= 6
        b["host_factor_py"] = 7.7

    rc, out = _run_check_bench(tmp_path, mutate)
    assert rc == 1 and "q08_dup_merge" in out


def test_check_bench_normal_py_epoch_keeps_failing(tmp_path):
    """With the Python canary in its normal band, corroborated trips
    fail exactly as before."""

    def mutate(b):
        q = "q19_minhash_lsh_pairs"
        b["queries"][q] *= 3
        b["queries_cpu_sec"][q] *= 3
        b["host_factor_py"] = 1.1

    rc, out = _run_check_bench(tmp_path, mutate)
    assert rc == 1 and "q19_minhash_lsh_pairs" in out
