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
    write_manifest()'`` after any registration change."""
    committed = json.loads((REPO / "registry_manifest.json").read_text())
    assert committed == manifest()


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
