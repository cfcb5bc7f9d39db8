"""Non-finite-float (NaN/Inf) parity regression tests.

Third leg of the robustness trilogy (empty fixture -> null fixture ->
this): `scripts/make_nonfinite_fixture.py` poisons the MEASUREMENT
columns — events.value and embedding elements — with deterministic
NaN/+Inf/-Inf strides, and the full parity sweep must stay green
(round-5 run: 192/192 after the finite-value contracts landed). This
test pins the queries that FAILED the first non-finite sweep: one
poisoned value used to abort both engines' DECIMAL casts (the exact-sum
parity recipe) or silently rank NaN into top-k results.

Contracts under test:
- operators/similarity.py:valid_vectors excludes vectors with any
  non-finite element from every index/scan/join path (SQL twin:
  queries/__init__.py valid_embeddings);
- queries/__init__.py:finite_values / finite_events exclude rows whose
  measurement value is NaN/±Inf from value-aggregating queries, keeping
  NULL semantics unchanged.
"""

from __future__ import annotations

import pytest

from masd_spark.queries import load_all

from oracle import compare_query

NONFINITE_SENSITIVE_QUERIES = [
    # embedding family (valid_vectors finite contract)
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_mmr_rerank",
    "ann_ivf_exact_refined_topk",
    "cluster_kmeans_embeddings_exact",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_bucketed",
    "dedup_semantic_clusters_exact",
    "emb_gram_upper",
    "emb_pca_power_iteration",
    # float kernels promoted from the no-crash list when the r8
    # error-bound contracts gave them oracles: their n_valid/n_assigned
    # rows state exactly the valid-vector contract this fixture poisons
    "cluster_kmeans_embeddings",
    "emb_pca_top_component",
    "ann_ivf_refined_topk",
    "dedup_semantic_clusters",
    # events.value family (finite_values contract)
    "histogram_event_values",
    "agg_mad_robust",
    "clean_winsorize_values",
    "range_join_clicks_purchases",
    "stat_daily_value_correlation",
    "stat_welch_ttest",
    "stat_theil_sen_trend",
    "ts_rolling_zscore",
    "ts_ohlc_hourly_bars",
    "ts_cusum_changepoints",
    "ts_seasonal_residuals",
    "ts_autocorrelation",
]

# Rows-only queries that read the poisoned columns: no oracle to
# compare, but they must not ABORT on one bad vector/value.
NONFINITE_NO_CRASH_QUERIES = [
    "approx_aggregates",
]


@pytest.fixture(scope="module")
def nonfinite_sf_dir(tmp_path_factory):
    import importlib.util
    import os
    from pathlib import Path

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "make_nonfinite_fixture",
        Path(__file__).resolve().parent.parent
        / "scripts"
        / "make_nonfinite_fixture.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    dst = str(tmp_path_factory.mktemp("sf_nonfinite"))
    src = "/root/testdata/sf0.001"
    for t in mod.TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if t == "events":
            tab = mod.poison_events(tab)
        elif t == "embeddings":
            tab = mod.poison_embeddings(tab)
        pq.write_table(tab, os.path.join(dst, f"{t}.parquet"))
    return dst


@pytest.mark.parametrize("name", NONFINITE_SENSITIVE_QUERIES)
def test_nonfinite_fixture_parity(spark, nonfinite_sf_dir, name):
    compare_query(spark, load_all()[name], nonfinite_sf_dir)


@pytest.mark.parametrize("name", NONFINITE_NO_CRASH_QUERIES)
def test_nonfinite_fixture_no_abort(spark, nonfinite_sf_dir, name):
    # rows-only kernels: the contract is graceful degradation, not parity
    assert load_all()[name].fn(spark, nonfinite_sf_dir).count() >= 0
