"""Zero-row robustness: every operator must survive an EMPTY input —
an empty partition, day, or backfill slice is routine lakehouse data at
100 TB, and a driver-side index build (centroid sample, codebook pick,
node count) that crashes on zero rows turns a data gap into a job abort.

Found by the round-5 empty-fixture parity sweep
(``python scripts/parity_sweep.py <empty-dir>``): ANN index builds
raised on empty literal samples, exact PageRank divided by the zero
node count, the bitmap-distinct 'ALL' row returned NULL where
count(DISTINCT) semantics say 0, and write_zordered refused an empty
maintenance job. All fixed to degrade gracefully (empty in -> empty or
zero out); the one NON-fixable row is the documented Spark-vs-standard
grand-total divergence pinned at the bottom.
"""

from __future__ import annotations

import os

import duckdb
import pytest
import pyarrow.parquet as pq

from masd_spark.queries import load_all
from masd_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

# Oracled queries that crashed (or value-diverged) on empty input before
# the round-5 fixes; each must now be a full DuckDB parity PASS on the
# empty fixture.
FIXED_QUERIES = [
    "ann_ivf_topk",
    # designed empty-safe from birth (round 6): an empty corpus persists
    # an empty-but-schema-correct index, and the probe degrades to the
    # schema-correct empty top-k
    "ann_ivf_persisted_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_recall_report",
    "graph_pagerank_trade_exact",
    "agg_bitmap_exact_distinct",
    "layout_zorder_pruned_scan",
    # the round-8 error-bound contract queries: on a zero-row corpus the
    # portable values are 0 and every contract boolean holds vacuously
    "graph_pagerank_trade",
    "cluster_kmeans_embeddings",
    "emb_pca_top_component",
    "ann_ivf_refined_topk",
    "dedup_semantic_clusters",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    """Fixture dir with every table present at zero rows, schemas
    identical to the real testdata (taken from its parquet footers)."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        schema = pq.read_schema(os.path.join(SF_ORACLE, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FIXED_QUERIES)
def test_empty_input_parity(spark, empty_sf_dir, name):
    compare_query(spark, REGISTRY[name], empty_sf_dir)


def test_kmeans_on_empty_corpus_degrades(spark, empty_sf_dir):
    """Centroid fit over zero rows returns no centroids; assignment is a
    schema-correct empty frame — neither is an abort."""
    from masd_spark.operators.clustering import kmeans_assign, kmeans_centroids
    from masd_spark.sources.tables import load_table

    emb = load_table(spark, empty_sf_dir, "embeddings")
    assert kmeans_centroids(emb, dim=64, k=4) == []
    assigned = kmeans_assign(emb, dim=64, k=4)
    assert assigned.columns == ["vec_id", "cluster", "dist2"]
    assert assigned.count() == 0


def test_pagerank_float_on_empty_graph(spark):
    from masd_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_write_zordered_empty_writes_empty_table(spark, tmp_path):
    """A maintenance rewrite of an empty partition writes an empty
    schema-preserving table instead of crashing the pipeline."""
    from masd_spark.sources.layout import write_zordered

    src = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").limit(0)
    path = str(tmp_path / "z_empty")
    write_zordered(src, path, "o_custkey", "o_totalprice", n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 0
    assert set(back.columns) == set(src.columns)


# ---------------------------------------------------------------------------
# Degenerate-but-NON-empty corpora (r8 review findings): a tiny slice
# (fewer valid vectors than the IVF contract floor / a full top-k) and a
# zero-variance slice (all embeddings identical -> both k-means kernels
# at exactly-0 inertia, PCA covariance identically zero) are legitimate
# backfill shapes the zero-row guard does not cover. Each contract must
# go vacuous-True against its unconditional-TRUE oracle, not fail.

DEGENERATE_CONTRACT_QUERIES = [
    "ann_ivf_refined_topk",
    "cluster_kmeans_embeddings",
    "emb_pca_top_component",
    "dedup_semantic_clusters",
]


def _embeddings_variant_dir(tmp_path_factory, name: str, table) -> str:
    """Fixture dir: every table empty-at-schema except embeddings."""
    import pyarrow.parquet as _pq

    d = tmp_path_factory.mktemp(name)
    for t in TABLE_NAMES:
        schema = _pq.read_schema(os.path.join(SF_ORACLE, f"{t}.parquet"))
        _pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    _pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def tiny_sf_dir(tmp_path_factory) -> str:
    """5 valid embeddings — below the IVF contract floor, below k=10."""
    tab = pq.read_table(os.path.join(SF_ORACLE, "embeddings.parquet"))
    # row 0 has vec_id 0 -> one probe (vec_id % 100 == 0) over 4 others
    return _embeddings_variant_dir(tmp_path_factory, "sf_tiny", tab.slice(0, 5))


@pytest.fixture(scope="module")
def zero_var_sf_dir(tmp_path_factory) -> str:
    """6 identical embeddings (distinct ids) — inertia exactly 0."""
    import pyarrow as pa

    tab = pq.read_table(os.path.join(SF_ORACLE, "embeddings.parquet"))
    one = tab.slice(0, 1)
    rep = pa.concat_tables([one] * 6)
    rep = rep.set_column(
        rep.schema.get_field_index("vec_id"),
        rep.schema.field("vec_id"),
        pa.array(list(range(6)), type=pa.int64()),
    )
    return _embeddings_variant_dir(tmp_path_factory, "sf_zerovar", rep)


@pytest.mark.parametrize("name", DEGENERATE_CONTRACT_QUERIES)
def test_tiny_corpus_contract_parity(spark, tiny_sf_dir, name):
    compare_query(spark, REGISTRY[name], tiny_sf_dir)


@pytest.mark.parametrize("name", DEGENERATE_CONTRACT_QUERIES)
def test_zero_variance_corpus_contract_parity(spark, zero_var_sf_dir, name):
    compare_query(spark, REGISTRY[name], zero_var_sf_dir)


def test_semantic_clusters_refuses_scale(spark, monkeypatch):
    """The docstring's 'all-pairs verification is harness-only' claim is
    mechanically enforced: above the cap the contract query raises
    instead of launching a corpus^2 join."""
    import masd_spark.queries.dedup as dq

    monkeypatch.setattr(dq, "_SEMDEDUP_VERIFY_CAP", 3)
    with pytest.raises(ValueError, match="all-pairs"):
        REGISTRY["dedup_semantic_clusters"].fn(spark, SF_ORACLE)


def test_rollup_empty_input_divergence_pinned(spark, empty_sf_dir):
    """DOCUMENTED cross-engine divergence, empty input ONLY: the SQL
    standard's () grouping set aggregates zero rows into one grand-total
    row (DuckDB emits it); Spark's rollup/cube/grouping-sets emit zero
    rows. This test pins the divergence so a Spark behavior change (or an
    accidental 'fix' that breaks non-empty parity) surfaces loudly; with
    >=1 input row the families are full-parity (driver-checked)."""
    spec = REGISTRY["rollup_lineitem_flags"]
    assert spec.fn(spark, empty_sf_dir).count() == 0
    con = duckdb.connect()
    try:
        con.execute("SET enable_progress_bar=false")
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{empty_sf_dir}/{t}.parquet')"
            )
        assert len(con.execute(spec.oracle).fetchall()) == 1
    finally:
        con.close()
