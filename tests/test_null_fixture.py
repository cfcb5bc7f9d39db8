"""Dirty-input (null-sprinkled) parity regression tests.

`scripts/make_null_fixture.py` + `scripts/parity_sweep.py` proved the
whole registry value-matches DuckDB on a fixture where ~10% of every
column is NULL (round-5 run: 192/192 after 28 fixes). This test pins
that property in the suite for the queries that actually FAILED that
sweep — the shapes where Spark's and SQL's null semantics genuinely
disagree (NULLS FIRST/LAST window defaults, struct-min vs ORDER BY,
concat vs ||, value_counts dropna, ignorenulls carry-forward, ASOF
null-time matching) — so a future edit that drops one of the
invalid-input contracts fails CI instead of silently diverging on
dirty production data.

The fixture builds once per session from sf0.001 (tiny), with the same
deterministic row+column stride as the offline tool.
"""

from __future__ import annotations

import pytest

from masd_spark.queries import load_all

from oracle import compare_query

# Every query the round-5 null sweep flagged, by failure family.
NULL_SENSITIVE_QUERIES = [
    # asof family (null key/time exclusion + latest-ROW struct carry)
    "asof_join_purchases",
    "attribution_last_touch",
    "pit_scd2_priority_at_ship",
    # timeline ordering (null ts exclusion, NULLS LAST alignment)
    "sessionize_events",
    "session_window_native",
    "clean_event_debounce",
    "ts_cusum_changepoints",
    "seq_event_transitions",
    "seq_top_session_paths",
    "seq_sessions_matching_pattern",
    # ranking / versioning (null tiebreaker exclusion)
    "window_customer_order_stats",
    "window_ntile_percentiles",
    "histogram_equidepth_deciles",
    "bi_rfm_segments",
    "scd2_customer_priority",
    "merge_upsert_latest_order",
    "ivm_monthly_revenue_merge",
    # identity-keyed dedup / frequency (null id exclusion)
    "sketch_mg_heavy_users",
    "chunk_dedup_stats",
    "dedup_span_duplication",
    "dedup_span_extract",
    "dedup_span_strip",
    "corpus_ngram_topk",
    "pipeline_length_bucketing",
    "filter_quality_quantile",
    "fuzzy_join_nations",
    # scalar / aggregate null-semantics mirrors
    "scalar_string_math",
    "agg_collect_sorted_orders",
    "multimodal_frame_sample",
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "make_null_fixture",
        Path(__file__).resolve().parent.parent / "scripts" / "make_null_fixture.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import pyarrow.parquet as pq
    import os

    dst = str(tmp_path_factory.mktemp("sf_nulls"))
    src = "/root/testdata/sf0.001"
    for t in mod.TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(mod.null_sprinkle(tab), os.path.join(dst, f"{t}.parquet"))
    return dst


@pytest.mark.parametrize("name", NULL_SENSITIVE_QUERIES)
def test_null_fixture_parity(spark, null_sf_dir, name):
    compare_query(spark, load_all()[name], null_sf_dir)
