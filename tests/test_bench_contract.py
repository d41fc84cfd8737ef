"""Driver-contract guard for bench.py's stdout line (VERDICT r8 #1).

The driver that records BENCH_r{N}.json captures only a 2,000-char tail of
bench.py's stdout and json-parses the last line. Round 8's instrumentation
grew the line to 4,969 chars and the official perf gate recorded
``parsed: null``. These tests pin the compact-line contract so it cannot
silently regress again:

* the stdout payload serializes under bench.STDOUT_BUDGET (1,900 chars)
  even with worst-case (wide) float values for every query;
* the sidecar keeps the full instrumentation (extended per-query wall,
  executor cpu/run seconds, Python canary);
* scripts/check_bench.py merges the sidecar back via the `detail` pointer.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _worst_case_payloads():
    # 9999.999 is wider than any value a passing run can produce (the
    # total gate trips far below 10,000 s), so budget-fit here implies
    # budget-fit for every real run.
    timings = {name: 9999.999 for name in bench.HEADLINE}
    extended = {name: 9999.999 for name in bench.EXTENDED}
    cpu = {name: 9999.999 for name in bench.HEADLINE + bench.EXTENDED}
    return bench.build_payloads(
        10.0, timings, extended, cpu, dict(cpu), 9999.999, 9999.999
    )


def test_stdout_line_fits_driver_window():
    stdout_line, _ = _worst_case_payloads()
    encoded = json.dumps(stdout_line)
    assert len(encoded) < bench.STDOUT_BUDGET, (
        f"bench stdout line is {len(encoded)} chars; driver parses a "
        f"2,000-char tail — trim HEADLINE reporting or move fields to "
        f"the sidecar (budget {bench.STDOUT_BUDGET})"
    )
    # the driver re-parses the line: it must round-trip and carry the
    # fields check_bench.py and the judge key on
    parsed = json.loads(encoded)
    for field in ("metric", "value", "unit", "queries", "sf", "host_factor",
                  "canary_sec", "detail"):
        assert field in parsed, field
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_sidecar_keeps_full_instrumentation():
    stdout_line, detail = _worst_case_payloads()
    assert set(detail["queries"]) == set(bench.HEADLINE + bench.EXTENDED)
    for field in ("queries_cpu_sec", "queries_run_sec", "py_canary_sec",
                  "host_factor_py"):
        assert field in detail, field
    # the stdout line's scalars are attested verbatim in the sidecar
    for field in ("value", "host_factor", "canary_sec", "extended_total"):
        assert detail[field] == stdout_line[field]


def test_check_bench_merges_sidecar(tmp_path):
    """check_bench must see the extended queries through the `detail`
    pointer — a compact line alone would otherwise flag them missing."""
    stdout_line, detail = _worst_case_payloads()
    # use the real r8 baselines as the "measured" values so the guard
    # passes: copy them in from check_bench's own reference dicts
    sys.path.insert(0, str(REPO / "scripts"))
    import check_bench  # noqa: E402

    wall = dict(check_bench.R8_WALL)
    cpu = dict(check_bench.R8_CPU)
    run = dict(check_bench.R8_RUN)
    head = {k: wall[k] for k in bench.HEADLINE}
    # newly promoted queries may not have a recorded baseline yet — the
    # guard only iterates baseline keys, so any in-range value works
    ext = {k: wall.get(k, 0.5) for k in bench.EXTENDED}
    stdout_line, detail = bench.build_payloads(
        0.1, head, ext, cpu, run, bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC
    )
    out = tmp_path / "bench.out"
    out.write_text(json.dumps(stdout_line) + "\n")
    (tmp_path / bench.DETAIL_SIDECAR).write_text(json.dumps(detail) + "\n")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_bench.py"), str(out)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "missing from bench run" not in proc.stdout
    assert "bench ok" in proc.stdout


def test_check_bench_warns_not_fails_without_sidecar(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    import check_bench  # noqa: E402

    wall = dict(check_bench.R8_WALL)
    head = {k: wall[k] for k in bench.HEADLINE}
    ext = {k: wall.get(k, 0.5) for k in bench.EXTENDED}
    stdout_line, _ = bench.build_payloads(
        0.1, head, ext, {}, {}, bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC
    )
    out = tmp_path / "bench.out"
    out.write_text(json.dumps(stdout_line) + "\n")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_bench.py"), str(out)],
        capture_output=True,
        text=True,
        cwd=tmp_path,  # no sidecar anywhere in sight
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "WARN" in proc.stdout


def test_check_bench_rejects_stale_sidecar(tmp_path):
    """A sidecar whose scalars disagree with the stdout line is from a
    DIFFERENT run (e.g. a committed builder artifact next to a fresher
    driver line); merging would mix two runs' numbers — it must be
    skipped with a warning instead."""
    sys.path.insert(0, str(REPO / "scripts"))
    import check_bench  # noqa: E402

    wall = dict(check_bench.R8_WALL)
    head = {k: wall[k] for k in bench.HEADLINE}
    ext = {k: wall.get(k, 0.5) for k in bench.EXTENDED}
    stdout_line, detail = bench.build_payloads(
        0.1, head, ext, {}, {}, bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC
    )
    detail = {**detail, "value": detail["value"] + 1.0}  # different run
    out = tmp_path / "bench.out"
    out.write_text(json.dumps(stdout_line) + "\n")
    (tmp_path / bench.DETAIL_SIDECAR).write_text(json.dumps(detail) + "\n")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_bench.py"), str(out)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "different run" in proc.stdout


def test_end_canary_pair_fields_and_budget():
    """VERDICT r9 #4: with a start+end canary pair the stdout line must
    still fit the driver window, host_factor must be the geometric mean
    of the two epochs, and the sidecar must carry the per-query
    interpolated factors in execution order."""
    timings = {name: 9999.999 for name in bench.HEADLINE}
    extended = {name: 9999.999 for name in bench.EXTENDED}
    cpu = {name: 9999.999 for name in bench.HEADLINE + bench.EXTENDED}
    # start epoch 2x ref, end epoch 0.5x ref -> geometric mean 1.0
    stdout_line, detail = bench.build_payloads(
        0.1, timings, extended, cpu, dict(cpu),
        2 * bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC,
        canary_end_sec=0.5 * bench.CANARY_REF_SEC,
        py_canary_end_sec=bench.PY_CANARY_REF_SEC,
    )
    assert len(json.dumps(stdout_line)) < bench.STDOUT_BUDGET
    assert stdout_line["canary_end_sec"] == 0.5 * bench.CANARY_REF_SEC
    assert stdout_line["host_factor"] == 1.0
    qhf = detail["queries_host_factor"]
    order = bench.HEADLINE + bench.EXTENDED
    assert list(qhf) == order
    assert qhf[order[0]] == 2.0 and qhf[order[-1]] == 0.5
    # monotone interpolation between the endpoints
    vals = list(qhf.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert detail["host_factor_py_end"] == 1.0


def test_aged_end_canary_refused_by_build_payloads():
    """VERDICT r10 #1: an end pair whose Python factor diverges >3x from
    its JVM factor is the session-aging signature — build_payloads must
    fall back to a start-only host_factor, emit no per-query
    interpolation, and still record the raw end readings."""
    timings = {name: 1.0 for name in bench.HEADLINE}
    extended = {name: 1.0 for name in bench.EXTENDED}
    # the round-10 record's shape: jvm end 1.12x, py end 9.5x
    stdout_line, detail = bench.build_payloads(
        0.1, timings, extended, {}, {},
        bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC,
        canary_end_sec=1.12 * bench.CANARY_REF_SEC,
        py_canary_end_sec=9.5 * bench.PY_CANARY_REF_SEC,
    )
    assert stdout_line["host_factor"] == 1.0  # start-only
    assert stdout_line["canary_end_valid"] is False
    assert stdout_line["canary_end_sec"] == 1.12 * bench.CANARY_REF_SEC
    assert "queries_host_factor" not in detail
    # a load-plausible pair (both paths slowed together) is NOT refused
    stdout_line, detail = bench.build_payloads(
        0.1, timings, extended, {}, {},
        bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC,
        canary_end_sec=2.0 * bench.CANARY_REF_SEC,
        py_canary_end_sec=2.0 * bench.PY_CANARY_REF_SEC,
    )
    assert "canary_end_valid" not in stdout_line
    assert stdout_line["host_factor"] == round(2.0 ** 0.5, 3)
    assert "queries_host_factor" in detail


def test_check_bench_refuses_aged_end_canary_in_old_artifacts():
    """Artifacts from bench versions that took the end canary in-session
    (r9/r10) must have a divergent end pair dropped at check time: the
    guard renormalizes by the start canary alone."""
    sys.path.insert(0, str(REPO / "scripts"))
    import check_bench  # noqa: E402

    geo = round((1.0 * 1.12) ** 0.5, 3)
    artifact = {
        "queries": {},
        "canary_sec": check_bench.CANARY_REF_SEC_DEFAULT,
        "canary_ref_sec": check_bench.CANARY_REF_SEC_DEFAULT,
        "canary_end_sec": 1.12 * check_bench.CANARY_REF_SEC_DEFAULT,
        "py_canary_ref_sec": check_bench.PY_CANARY_REF_SEC_DEFAULT,
        "py_canary_end_sec": 9.5 * check_bench.PY_CANARY_REF_SEC_DEFAULT,
        "host_factor": geo,
        "queries_host_factor": {"q01_top_parts_by_quantity": geo},
    }
    msg = check_bench.refuse_aged_end_canary(artifact)
    assert msg is not None and "session-aging" in msg
    assert artifact["host_factor"] == 1.0
    assert "queries_host_factor" not in artifact
    # a refused pair must not feed the PY-epoch absorb path either
    # (round-11 review: a 9.5x aged reading left in host_factor_py_end
    # would downgrade corroborated regressions to warnings)
    assert "py_canary_end_sec" not in artifact
    assert "host_factor_py_end" not in artifact
    # a plausible pair passes through untouched
    ok = {
        "queries": {},
        "canary_sec": check_bench.CANARY_REF_SEC_DEFAULT,
        "canary_ref_sec": check_bench.CANARY_REF_SEC_DEFAULT,
        "canary_end_sec": 2.0 * check_bench.CANARY_REF_SEC_DEFAULT,
        "py_canary_ref_sec": check_bench.PY_CANARY_REF_SEC_DEFAULT,
        "py_canary_end_sec": 2.0 * check_bench.PY_CANARY_REF_SEC_DEFAULT,
        "host_factor": round(2.0 ** 0.5, 3),
    }
    assert check_bench.refuse_aged_end_canary(ok) is None
    assert ok["host_factor"] == round(2.0 ** 0.5, 3)


def test_check_bench_require_detail_fails_without_sidecar(tmp_path):
    """ADVICE r9: the official gate must not pass on the headline alone."""
    sys.path.insert(0, str(REPO / "scripts"))
    import check_bench  # noqa: E402

    wall = dict(check_bench.R8_WALL)
    head = {k: wall[k] for k in bench.HEADLINE}
    ext = {k: wall.get(k, 0.5) for k in bench.EXTENDED}
    stdout_line, _ = bench.build_payloads(
        0.1, head, ext, {}, {}, bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC
    )
    out = tmp_path / "bench.out"
    out.write_text(json.dumps(stdout_line) + "\n")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_bench.py"),
         str(out), "--require-detail"],
        capture_output=True,
        text=True,
        cwd=tmp_path,  # no sidecar anywhere in sight
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "require-detail" in proc.stdout


def test_check_bench_uses_per_query_factors(tmp_path):
    """A query measured under a 2x epoch at the start of the run must be
    normalized by ITS factor, not the run-mean: with per-query factors
    present, a wall number exactly 2x base under a 2x local epoch is not
    a trip."""
    sys.path.insert(0, str(REPO / "scripts"))
    import check_bench  # noqa: E402

    wall = dict(check_bench.R8_WALL)
    cpu = dict(check_bench.R8_CPU)
    run = dict(check_bench.R8_RUN)
    # every query's wall inflated by its own epoch factor (start 2x ->
    # end 0.5x), CPU flat: a pure epoch story, zero regressions
    head = {k: wall[k] for k in bench.HEADLINE}
    ext = {k: wall.get(k, 0.5) for k in bench.EXTENDED}
    stdout_line, detail = bench.build_payloads(
        0.1, head, ext, cpu, run,
        2 * bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC,
        canary_end_sec=0.5 * bench.CANARY_REF_SEC,
        py_canary_end_sec=0.5 * bench.PY_CANARY_REF_SEC,
    )
    qhf = detail["queries_host_factor"]
    scaled_head = {k: round(v * qhf[k], 3) for k, v in head.items()}
    scaled_ext = {k: round(v * qhf[k], 3) for k, v in ext.items()}
    stdout_line, detail = bench.build_payloads(
        0.1, scaled_head, scaled_ext, cpu, run,
        2 * bench.CANARY_REF_SEC, bench.PY_CANARY_REF_SEC,
        canary_end_sec=0.5 * bench.CANARY_REF_SEC,
        py_canary_end_sec=0.5 * bench.PY_CANARY_REF_SEC,
    )
    out = tmp_path / "bench.out"
    out.write_text(json.dumps(stdout_line) + "\n")
    (tmp_path / bench.DETAIL_SIDECAR).write_text(json.dumps(detail) + "\n")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_bench.py"),
         str(out), "--require-detail"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "bench ok" in proc.stdout
