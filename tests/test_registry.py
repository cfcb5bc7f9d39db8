"""Registry manifest hygiene (VERDICT r3 item 8).

The driver's CORRECTNESS harness executes only the first DRIVER_WINDOW
registered queries per round, so registration order is load-bearing.
``registry_manifest.json`` makes the window visible as a committed
artifact; these tests keep it truthful.
"""

import json
from pathlib import Path

from masd_spark.queries import DRIVER_WINDOW, load_all, manifest

REPO = Path(__file__).resolve().parent.parent


def test_manifest_covers_every_registered_query():
    reg = load_all()
    rows = manifest()
    assert [r["name"] for r in rows] == list(reg)
    for r in rows:
        spec = reg[r["name"]]
        assert r["oracled"] == (spec.oracle is not None)
        assert r["family"] == spec.family
    assert sum(r["driver_checked_this_round"] for r in rows) == min(
        DRIVER_WINDOW, len(rows)
    )


def test_committed_manifest_is_current():
    """The committed artifact must match the live registry — regenerate
    with ``python -c 'from masd_spark.queries import write_manifest;
    write_manifest()'`` after any registration change or query edit."""
    committed = json.loads((REPO / "registry_manifest.json").read_text())
    assert committed == manifest()


def test_untracked_correctness_artifact_cannot_redden_manifest():
    """Root fix for the r5/r6 manifest race (VERDICT r6 item 1): the
    driver writes CORRECTNESS_r{N}.json AFTER the builder's final commit,
    so at judging time an UNTRACKED artifact sits at the repo root.
    Rotation state must ignore it — simulate exactly that race and assert
    the live manifest (and staleness map) don't move."""
    from masd_spark.queries import (
        effective_checked_rounds,
        last_checked_rounds,
    )

    before_checked = last_checked_rounds()
    before_eff = effective_checked_rounds()
    before_manifest = manifest()
    fake = REPO / "CORRECTNESS_r99.json"
    assert not fake.exists(), "r99 artifact unexpectedly present"
    some_query = next(iter(before_checked))
    fake.write_text(json.dumps({some_query: {
        "rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": 1, "oracle_rows": 1, "err": None,
    }}))
    try:
        assert last_checked_rounds() == before_checked
        assert effective_checked_rounds() == before_eff
        assert manifest() == before_manifest
    finally:
        fake.unlink()


def test_fingerprint_sync_is_idempotent_within_a_round(monkeypatch, tmp_path):
    """The certification protocol's safety property: once a query's green
    round is recorded, re-running sync in the SAME round (e.g. after
    editing that query) must NOT re-certify the new fingerprint — the
    tracked-artifact set hasn't advanced, so the edit keeps effective
    staleness 0 until a NEW driver green lands."""
    import json

    import masd_spark.queries as q

    fp_file = tmp_path / "query_fingerprints.json"
    monkeypatch.setattr(q, "_fingerprint_path", lambda: fp_file)
    monkeypatch.setattr(q, "last_checked_rounds", lambda: {"victim": 6})

    fps = {"victim": "aaaa"}
    monkeypatch.setattr(q, "_import_query_modules", lambda: None)
    monkeypatch.setattr(q, "current_plan_fingerprints", lambda: dict(fps))
    monkeypatch.setattr(q, "REGISTRY", {"victim": object()})
    q.sync_fingerprints()
    rec = json.loads(fp_file.read_text())["victim"]
    assert rec == {"fingerprint": "aaaa", "round": 6}
    # the query is edited mid-round; sync re-runs (write_manifest call)
    fps["victim"] = "bbbb"
    q.sync_fingerprints()
    rec = json.loads(fp_file.read_text())["victim"]
    assert rec == {"fingerprint": "aaaa", "round": 6}, (
        "mid-round re-sync must not launder an edited query's staleness"
    )
    # an edited query whose plan fingerprint is still UNKNOWN (stale
    # cache) must never be certified — even against a new green round
    fps["victim"] = None
    monkeypatch.setattr(q, "last_checked_rounds", lambda: {"victim": 7})
    q.sync_fingerprints()
    rec = json.loads(fp_file.read_text())["victim"]
    assert rec == {"fingerprint": "aaaa", "round": 6}, (
        "sync must not certify an unknown fingerprint"
    )
    # ...until the NEXT round's green artifact lands with a known fp
    fps["victim"] = "bbbb"
    q.sync_fingerprints()
    rec = json.loads(fp_file.read_text())["victim"]
    assert rec == {"fingerprint": "bbbb", "round": 7}


def test_committed_plan_cache_is_current():
    """Every registered query must have a FRESH entry in the committed
    plan-fingerprint cache (plan_fingerprints.json): a stale dep key
    means some closure file was edited without re-running
    ``write_manifest`` — the rotation would run on unknown fingerprints
    and mark certified queries -1 wholesale. Regenerate with the same
    write_manifest call that refreshes registry_manifest.json."""
    from masd_spark.queries import current_plan_fingerprints, load_all

    reg = load_all()
    fps = current_plan_fingerprints()
    stale = sorted(n for n in reg if fps.get(n) is None)
    assert not stale, (
        f"{len(stale)} queries have stale/missing plan fingerprints "
        f"(run write_manifest): {stale[:10]}"
    )


def test_certified_fingerprints_match_live_registry():
    """query_fingerprints.json (the certification state) must only carry
    registered queries, and every driver-green query must have an entry —
    the round-start ``write_manifest`` sync maintains both."""
    from masd_spark.queries import (
        certified_fingerprints,
        last_checked_rounds,
        load_all,
    )

    reg = load_all()
    certified = certified_fingerprints()
    assert set(certified) <= set(reg)
    for name in last_checked_rounds():
        if name in reg:
            assert name in certified, f"{name} green but uncertified"
    for name, rec in certified.items():
        assert set(rec) == {"fingerprint", "round"}
        assert rec["round"] >= 1


def test_ex_red_queries_have_driver_green_or_window_slot():
    """The round-2 RED queries had to stay in the window until a green
    driver row existed (VERDICT r3 item 1). All three went green in
    CORRECTNESS_r04.json, so under the standing rotation policy
    (tests/test_rotation.py) they now rotate like everyone else — this
    guard only re-arms if their green evidence ever disappears."""
    from masd_spark.queries import last_checked_rounds

    checked = last_checked_rounds()
    window = [r["name"] for r in manifest()[:DRIVER_WINDOW]]
    for name in ("ann_lsh_topk", "ann_ivf_topk", "cluster_kmeans_embeddings"):
        assert checked.get(name, 0) >= 4 or name in window
