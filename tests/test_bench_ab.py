"""Unit coverage for bench.py's drift-adjudication verdict.

The A/B experiment itself (worktree + subprocess benches) is exercised
end-to-end when a real drift fires; the VERDICT function is pure and
must encode the same-window comparison correctly — round 7 showed the
prior formulation (judging each run against its committed value)
mislabels intermittent host noise as code drift.
"""

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "masd_bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("masd_bench", bench)
_spec.loader.exec_module(bench)


def test_code_drift_when_head_slower_in_same_window():
    v, r = bench._ab_verdict(total=30.0, prev_sum=15.0, prior_now=15.0, head_now=29.0)
    assert v == "code-drift"
    assert r is not None and r > 1.15


def test_intermittent_host_noise_is_not_code_drift():
    """The exact round-7 shape: in-process 35.9s in a bad window, prior
    15.1s in a good one, head re-measuring ~15s next to it."""
    v, r = bench._ab_verdict(total=35.9, prev_sum=15.5, prior_now=15.1, head_now=15.4)
    assert v == "host-window-noise"
    assert r is not None and r < 1.15


def test_persistent_host_slowdown_is_host_drift():
    v, _ = bench._ab_verdict(total=31.0, prev_sum=15.0, prior_now=29.0, head_now=30.0)
    assert v == "host-drift"


def test_small_drift_in_both_windows_is_inconclusive():
    v, _ = bench._ab_verdict(total=17.0, prev_sum=15.0, prior_now=15.5, head_now=16.0)
    assert v == "inconclusive"


def test_missing_head_requote_falls_back_to_committed_compare():
    v, r = bench._ab_verdict(total=30.0, prev_sum=15.0, prior_now=28.0, head_now=0.0)
    assert v == "host-drift" and r is None
    v, r = bench._ab_verdict(total=30.0, prev_sum=15.0, prior_now=14.0, head_now=0.0)
    assert v == "code-drift" and r is None


def test_prev_committed_queries_skips_staged_artifact(tmp_path, monkeypatch):
    """`git ls-files` lists STAGED artifacts too; a fresh BENCH_r8 that
    is added but not yet committed must fall back to the newest artifact
    in HEAD instead of blanking every baseline (ADVICE-r7 follow-up)."""
    import json
    import subprocess

    repo = tmp_path / "r"
    repo.mkdir()

    def run(*a):
        subprocess.run(a, cwd=repo, check=True, capture_output=True)

    run("git", "init", "-q")
    run("git", "config", "user.email", "t@t")
    run("git", "config", "user.name", "t")
    (repo / "BENCH_r7.json").write_text(json.dumps({"queries": {"q1": 1.5}}))
    run("git", "add", "BENCH_r7.json")
    run("git", "commit", "-qm", "r7")
    (repo / "BENCH_r8.json").write_text(json.dumps({"queries": {"q1": 9.9}}))
    run("git", "add", "BENCH_r8.json")

    monkeypatch.setattr(bench, "__file__", str(repo / "bench.py"))
    assert bench._prev_committed_queries() == {"q1": 1.5}
