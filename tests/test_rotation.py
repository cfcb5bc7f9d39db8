"""Standing rotation policy for the driver's 50-query verification window.

VERDICT r4 item 1: the external CORRECTNESS harness executes only the first
DRIVER_WINDOW registered queries per round, so registration order must be a
deterministic round-robin that (a) fills the window with never-checked
queries first and (b) bounds how long any registered query can go without a
driver-confirmed row. These tests pin the policy itself — not just this
round's ordering — by simulating future rounds.
"""

from __future__ import annotations

import math

from masd_spark.queries import (
    DRIVER_WINDOW,
    FLAGSHIP,
    effective_checked_rounds,
    load_all,
    manifest,
    rotation_order,
)

REG = load_all()
NAMES = list(REG)
# effective staleness: fingerprint-aware (VERDICT r6 item 2) — a query
# edited since its last driver green counts as never-checked
CHECKED = effective_checked_rounds()


def test_flagship_pinned_first():
    assert NAMES[0] == FLAGSHIP


def test_window_is_the_stalest_set():
    """Every in-window query (bar the pinned flagship) is at least as stale
    as every out-of-window query — the defining invariant of the policy."""
    window, rest = NAMES[1:DRIVER_WINDOW], NAMES[DRIVER_WINDOW:]
    max_in = max(CHECKED.get(n, 0) for n in window)
    min_out = min(CHECKED.get(n, 0) for n in rest)
    assert max_in <= min_out


def test_round5_window_clears_backlog_first():
    """While stale queries (never-checked backlog + fingerprint-stale
    edits, effective round <= 0) remain, the window spends every
    non-flagship slot on them."""
    window = NAMES[:DRIVER_WINDOW]
    first_time = [n for n in window if CHECKED.get(n, 0) <= 0]
    never_total = sum(1 for n in NAMES if CHECKED.get(n, 0) <= 0)
    assert len(first_time) == min(DRIVER_WINDOW - 1, never_total)


def test_registry_growth_bounded_by_window_capacity():
    """VERDICT r4 item 2, amended r7: growth is allowed only while the
    ENTIRE stale set (never-checked backlog + fingerprint-stale edits +
    additions) fits in one driver window — so every new registration is
    driver-checked the round it lands and the backlog still drains."""
    never = sum(1 for n in NAMES if CHECKED.get(n, 0) <= 0)
    if len(NAMES) > 210:
        assert never <= DRIVER_WINDOW - 1, (
            f"{never} stale queries exceed the {DRIVER_WINDOW - 1} "
            "non-flagship window slots — registry growth must wait"
        )


def test_simulated_staleness_bound():
    """Simulate the policy forward 3 full cycles: no query ever exceeds the
    theoretical re-check period ceil((N-1)/(W-1)) rounds between
    driver-confirmed rows, and the backlog clears monotonically."""
    n, w = len(NAMES), DRIVER_WINDOW
    period = math.ceil((n - 1) / (w - 1))
    checked = dict(CHECKED)
    start = max(checked.values(), default=0) + 1
    max_gap = 0
    backlog_prev = sum(1 for q in NAMES if checked.get(q, 0) <= 0)
    for rnd in range(start, start + 3 * period + 2):
        order = rotation_order(NAMES, checked)
        assert order[0] == FLAGSHIP
        for q in order[:w]:
            prev = checked.get(q, 0)
            # gaps straddling the pre-policy history carry a one-round
            # transient while the 114-query backlog drains; measure the
            # steady-state bound from the first full policy cycle on
            if prev >= start:
                max_gap = max(max_gap, rnd - prev)
            checked[q] = rnd
        backlog = sum(1 for q in NAMES if checked.get(q, 0) <= 0)
        assert backlog <= max(0, backlog_prev - (w - 1)) or backlog == 0
        backlog_prev = backlog
    assert backlog_prev == 0, "never-checked backlog must clear"
    # every query was visited in the simulation, so each has a bounded gap
    assert max_gap <= period, f"staleness {max_gap} exceeds period {period}"


def test_failed_checks_do_not_count_as_green():
    """A red driver row must keep (or put back) its query at the front of
    the next window — only fully-green rows advance last_checked_round."""
    from masd_spark.queries import _row_is_green

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}
    hash_red = dict(green, hash_match=False)
    exec_err = {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": "AnalysisException(...)"}
    assert _row_is_green(green)
    assert _row_is_green(rows_only)
    assert not _row_is_green(hash_red)
    assert not _row_is_green(exec_err)
    assert not _row_is_green(None)

    # end-to-end: a red query sorts ahead of every green one
    names = ["flag", "was_green", "went_red", "never"]
    checked = {"was_green": 3, "went_red": 0}  # red => no green round
    from masd_spark.queries import rotation_order
    import masd_spark.queries as q

    old = q.FLAGSHIP
    q.FLAGSHIP = "flag"
    try:
        order = rotation_order(names, checked)
    finally:
        q.FLAGSHIP = old
    assert order.index("went_red") < order.index("was_green")
    assert order[0] == "flag"


def test_edited_query_reenters_next_window(monkeypatch):
    """VERDICT r6 item 2 done-criterion: a query whose content fingerprint
    changed since its last driver green must sort like a never-checked one
    and re-enter the very next window. Simulate the edit by corrupting one
    freshly-green query's certified fingerprint."""
    import masd_spark.queries as q

    certified = q.certified_fingerprints()
    # pick the query with the NEWEST green — the one stalest-first would
    # otherwise postpone the longest
    victim = max(certified, key=lambda n: certified[n]["round"])
    assert certified[victim]["round"] >= 1
    fake = {
        n: (dict(rec, fingerprint="deadbeef") if n == victim else rec)
        for n, rec in certified.items()
    }
    monkeypatch.setattr(q, "certified_fingerprints", lambda: fake)
    eff = q.effective_checked_rounds()
    # -1, not 0: an invalidated green outranks even first-time checks,
    # so the guarantee survives a window exactly filled by the backlog
    assert eff[victim] == -1
    order = rotation_order(NAMES, eff)
    assert victim in order[:DRIVER_WINDOW]


def test_manifest_carries_rotation_state():
    rows = manifest()
    assert [r["name"] for r in rows][: DRIVER_WINDOW] == NAMES[:DRIVER_WINDOW]
    for r in rows:
        assert "last_checked_round" in r
        assert r["last_checked_round"] == CHECKED.get(r["name"], 0)
