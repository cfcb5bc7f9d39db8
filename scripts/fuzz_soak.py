"""Offline differential-fuzz soak: a much larger randomized sample than
the pinned suite settings.

tests/test_fuzz_differential.py runs derandomized (stable CI, fixed
neighborhood). This tool is the exploration half: it draws N fresh
random examples per shape (scan/agg, join, window) from the SAME
strategies and renderers, runs them through Spark and DuckDB, and
prints one summary JSON line — the same contract as the other offline
sweeps. Any failing example is printed with its SQL so it can be
minimized and pinned as a regression.

Usage: python scripts/fuzz_soak.py [n_per_shape] [--seed N] [--sf-dir DIR]

``--sf-dir`` points the shapes at a different fixture — notably the
null-sprinkled one (scripts/make_null_fixture.py), turning the soak
into a randomized NULL-semantics differential sweep.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> int:
    argv = sys.argv[1:]
    seed = 0
    sf_dir = None
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i : i + 2]
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    n_per_shape = int(argv[0]) if argv else 150

    from hypothesis import (
        HealthCheck,
        given,
        seed as hyp_seed,
        settings,
        strategies as st,
    )

    import test_fuzz_differential as fz
    from masd_spark.session import get_spark
    from tests.oracle import _normalize, duckdb_connection

    if sf_dir:
        fz.SF_FUZZ = sf_dir
    spark = get_spark(app_name="fuzz-soak")
    con = duckdb_connection(fz.SF_FUZZ)
    shapes = [
        ("scan_agg", fz._queries(), fz.to_df, fz.to_sql),
        ("join", fz._join_queries(), fz.join_to_df, fz.join_to_sql),
        ("window", fz._win_queries(), fz.win_to_df, fz.win_to_sql),
        ("string", fz._str_queries(), fz.str_to_df, fz.str_to_sql),
        ("setop", fz._set_queries(), fz.set_to_df, fz.set_to_sql),
        ("events", fz._event_queries(), fz.event_to_df, fz.event_to_sql),
        ("embeddings", fz._emb_queries(), fz.emb_to_df, fz.emb_to_sql),
        ("semi_anti", fz._semi_queries(), fz.semi_to_df, fz.semi_to_sql),
    ]
    failures: list[dict] = []
    seen_failures: set[tuple[str, str]] = set()
    counts: dict[str, int] = {}
    t0 = time.time()
    def make_prop(shape_name, strat, to_df, to_sql, counter):
        @settings(
            max_examples=n_per_shape,
            derandomize=False,
            deadline=None,
            suppress_health_check=list(HealthCheck),
            database=None,
        )
        @hyp_seed(seed)
        @given(q=strat)
        def prop(q):
            counter[0] += 1

            def record(kind: str, detail: str = "") -> None:
                # shrinking replays the failing example many times; record
                # each distinct (shape, sql) once so the summary stays a
                # one-bug-one-entry report
                key = (shape_name, to_sql(q))
                if key not in seen_failures:
                    seen_failures.add(key)
                    row = {"shape": shape_name, "sql": to_sql(q)}
                    if detail:
                        row[kind] = detail
                    failures.append(row)

            try:
                sdf = to_df(spark, q)
                s_names, s_norm = _normalize(
                    sdf.columns, [tuple(r) for r in sdf.collect()]
                )
                cur = con.execute(to_sql(q))
                o_names, o_norm = _normalize(
                    [d[0] for d in cur.description], cur.fetchall()
                )
            except Exception as exc:  # noqa: BLE001 — an engine ERROR on a
                # sampled example is itself a differential finding; report
                # it instead of letting it abort the sweep
                record("error", repr(exc)[:300])
                raise AssertionError(to_sql(q)) from exc
            if s_names != o_names or s_norm != o_norm:
                record("mismatch")
                raise AssertionError(to_sql(q))

        return prop

    for shape_name, strat, to_df, to_sql in shapes:
        counter = [0]
        try:
            make_prop(shape_name, strat, to_df, to_sql, counter)()
        except Exception:  # noqa: BLE001 — failure already recorded; a
            # crash in one shape must not cost the others their runs
            pass
        counts[shape_name] = counter[0]
        print(f"[soak] {shape_name}: {counter[0]} examples", file=sys.stderr)

    # -- streaming-recovery shape (VERDICT r7 item 6) -----------------------
    # No DuckDB half: the oracle is the batch twin inside the runner. Each
    # example spins up TWO real streaming queries (kill + resume), so it
    # gets a reduced example budget relative to the differential shapes.
    import test_fuzz_streaming as fzs

    recov_counter = [0]
    n_recovery = max(2, n_per_shape // 10)

    @settings(
        max_examples=n_recovery,
        derandomize=False,
        deadline=None,
        suppress_health_check=list(HealthCheck),
        database=None,
    )
    @hyp_seed(seed)
    @given(
        rseed=st.integers(min_value=0, max_value=10_000),
        duration_ms=st.sampled_from([60_000, 120_000, 180_000]),
        geometry=st.sampled_from(fzs._WINDOWS),
        n_files=st.integers(min_value=2, max_value=5),
        kill_at_frac=st.floats(min_value=0.0, max_value=1.0),
        kill_mode=st.sampled_from(["exception", "stop"]),
    )
    def recovery_prop(
        rseed, duration_ms, geometry, n_files, kill_at_frac, kill_mode
    ):
        recov_counter[0] += 1
        kill_after = min(int(kill_at_frac * n_files), n_files - 1)
        detail = (
            f"seed={rseed} span={duration_ms} window={geometry} "
            f"files={n_files} kill_after={kill_after} mode={kill_mode}"
        )
        try:
            fzs.run_recovery_example(
                spark, rseed, duration_ms, geometry, n_files,
                kill_after, kill_mode,
            )
        except Exception as exc:  # noqa: BLE001
            key = ("stream_recovery", detail)
            if key not in seen_failures:
                seen_failures.add(key)
                failures.append(
                    {"shape": "stream_recovery", "sql": detail,
                     "error": repr(exc)[:300]}
                )
            raise

    try:
        recovery_prop()
    except Exception:  # noqa: BLE001 — recorded above
        pass
    counts["stream_recovery"] = recov_counter[0]
    print(
        f"[soak] stream_recovery: {recov_counter[0]} examples",
        file=sys.stderr,
    )

    out = {
        "n_per_shape": n_per_shape,
        "seed": seed,
        "sf_dir": fz.SF_FUZZ,
        "executions": counts,  # includes hypothesis shrink replays on failure
        "elapsed_s": round(time.time() - t0, 1),
        "fail": failures,
    }
    print("FUZZSOAK " + json.dumps(out))
    spark.stop()
    con.close()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
