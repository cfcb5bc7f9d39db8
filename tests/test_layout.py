"""Layout invariants for range-sorted parquet writes: disjoint per-file
key ranges, monotone row-group stats, and actual row-group skippability
under a band predicate — all read from the real parquet footers."""

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from masd_spark.sources.layout import row_group_stats, write_range_sorted
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


def test_layout_query_parity(spark):
    compare_query(spark, REGISTRY["layout_range_pruned_scan"], SF_ORACLE)


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "orders_sorted")
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    write_range_sorted(orders, path, "o_totalprice", n_files=8)
    return path


def test_files_own_disjoint_ranges(sorted_path):
    """repartitionByRange must give each file a disjoint slice of the
    key domain (file name order == partition order == range order)."""
    stats = row_group_stats(sorted_path, "o_totalprice")
    per_file: dict[str, list] = {}
    for fname, rg, mn, mx in stats:
        per_file.setdefault(fname, []).append((rg, mn, mx))
    files = sorted(per_file)
    assert len(files) >= 2, "fixture too small to range-partition"
    prev_max = None
    for fname in files:
        groups = sorted(per_file[fname])
        fmin, fmax = groups[0][1], groups[-1][2]
        assert fmin <= fmax
        if prev_max is not None:
            assert prev_max <= fmin, (fname, prev_max, fmin)
        prev_max = fmax
        # within-file: sortWithinPartitions => row-group stats monotone
        for (_, amn, amx), (_, bmn, bmx) in zip(groups, groups[1:]):
            assert amx <= bmn, (fname, amx, bmn)


def test_band_predicate_skips_row_groups(sorted_path):
    """A selective band over the sort key must miss most row groups'
    [min,max] windows — the stats-level fact behind scan pruning."""
    stats = row_group_stats(sorted_path, "o_totalprice")
    lo, hi = 50000.0, 60000.0
    overlapping = [s for s in stats if not (s[3] < lo or s[2] > hi)]
    assert len(stats) >= 8
    assert len(overlapping) < len(stats) / 2, (
        f"{len(overlapping)}/{len(stats)} row groups overlap the band"
    )


def test_scan_filter_pushdown_on_clustered_copy(spark, sorted_path):
    """The band filter must reach the parquet scan of the clustered copy
    (PushedFilters), which is what turns footer stats into skipped IO."""
    from masd_spark.plans.explain import has_pushed_filter

    df = spark.read.parquet(sorted_path).filter(
        F.col("o_totalprice").between(50000, 60000)
    )
    assert has_pushed_filter(df, "o_totalprice")


@pytest.fixture(scope="module")
def zordered_path(spark, tmp_path_factory):
    from masd_spark.sources.layout import write_zordered

    path = str(tmp_path_factory.mktemp("layout") / "orders_z")
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    write_zordered(orders, path, "o_custkey", "o_totalprice", n_files=8)
    return path


def _mean_window(path, col):
    stats = row_group_stats(path, col)
    lo = min(s[2] for s in stats)
    hi = max(s[3] for s in stats)
    span = float(hi) - float(lo)
    return sum((float(s[3]) - float(s[2])) / span for s in stats) / len(stats)


def test_zorder_query_parity(spark):
    compare_query(spark, REGISTRY["layout_zorder_pruned_scan"], SF_ORACLE)


def test_zorder_narrows_both_columns(zordered_path, sorted_path):
    """Z-layout: BOTH columns' mean row-group stat windows are fractions
    of the domain. Price-sorted layout: price windows are tight but
    custkey windows span nearly everything — the measured fact that
    makes z-order worth a shuffle when two filter columns matter."""
    z_cust = _mean_window(zordered_path, "o_custkey")
    z_price = _mean_window(zordered_path, "o_totalprice")
    s_cust = _mean_window(sorted_path, "o_custkey")
    s_price = _mean_window(sorted_path, "o_totalprice")
    assert z_cust <= 0.65, z_cust
    assert z_price <= 0.40, z_price
    assert s_price <= 0.25, s_price   # leading sort column: tight
    assert s_cust >= 0.80, s_cust     # non-sort column: unclustered
def test_zvalue_bit_interleave_exact(spark):
    """Morton math: zvalue(a, b) interleaves bits exactly."""
    from masd_spark.sources.layout import zvalue

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    ).select("a", "b", zvalue("a", "b", 16).alias("z"))

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in df.collect():
        assert r.z == ref(r.a, r.b), (r.a, r.b, r.z)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    """2000 rows scattered over ~64 tiny files compact to the computed
    target count with the exact same row multiset."""
    from masd_spark.sources.layout import compact_files

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 2000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)
    import pathlib

    n_small = len(list(pathlib.Path(src).glob("*.parquet")))
    assert n_small >= 32
    total = sum(f.stat().st_size for f in pathlib.Path(src).glob("*.parquet"))
    n_out = compact_files(spark, src, dst, target_bytes=max(1, total // 4))
    files = list(pathlib.Path(dst).glob("*.parquet"))
    assert len(files) == n_out <= 5
    back = spark.read.parquet(dst)
    assert back.count() == 2000
    assert sorted(r.id for r in back.collect()) == list(range(2000))


def test_compact_files_sizes_partitioned_tables_recursively(spark, tmp_path):
    """Regression (round-5 review): a hive-partitioned source has no
    top-level .parquet files; the old non-recursive glob computed
    total=0 and silently compacted everything into ONE file. The size
    scan must be recursive, and an empty directory must raise."""
    import pathlib

    from masd_spark.sources.layout import compact_files

    src = str(tmp_path / "part_src")
    dst = str(tmp_path / "part_dst")
    df = spark.range(0, 2000).withColumn("p", F.col("id") % 2)
    df.repartition(16).write.partitionBy("p").parquet(src)
    assert not list(pathlib.Path(src).glob("*.parquet"))  # top level empty
    total = sum(f.stat().st_size for f in pathlib.Path(src).rglob("*.parquet"))
    n_out = compact_files(spark, src, dst, target_bytes=max(1, total // 4))
    assert n_out >= 3  # sized from the real bytes, not 0

    import pytest

    empty = str(tmp_path / "empty_src")
    pathlib.Path(empty).mkdir()
    with pytest.raises(ValueError, match="no .parquet"):
        compact_files(spark, empty, dst)


def test_write_zordered_empty_ok_nan_and_allnull_rejected(spark, tmp_path):
    """Round-5 contract: EMPTY input writes an empty schema-preserving
    table (test_empty_inputs pins the read-back); NaN bounds, or an
    all-null column while rows exist, still raise — z-values would be
    meaningless and a NaN bound used to interpolate the literal token
    'nan' into SQL."""
    import pytest

    from masd_spark.sources.layout import write_zordered

    empty = spark.range(0).selectExpr("id a", "id b")
    write_zordered(empty, str(tmp_path / "z1"), "a", "b", n_files=2)
    assert spark.read.parquet(str(tmp_path / "z1")).count() == 0

    nan_df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, float("nan"))], ["a", "b"]
    )
    with pytest.raises(ValueError, match="NaN"):
        write_zordered(nan_df, str(tmp_path / "z2"), "a", "b", n_files=2)

    allnull = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "a double, b double"
    )
    with pytest.raises(ValueError, match="NaN-free"):
        write_zordered(allnull, str(tmp_path / "z3"), "a", "b", n_files=2)


def test_zvalue_no_sign_flip_on_int_columns(spark):
    """Regression (round-5 review): on IntegerType operands bit 15 of b
    shifted to position 31 and wrapped negative, mis-clustering the top
    half of the domain."""
    from masd_spark.sources.layout import zvalue

    df = spark.createDataFrame(
        [(0, 32768), (65535, 65535)], ["a", "b"]
    ).select("a", "b", zvalue("a", "b").alias("z"))
    rows = {(r.a, r.b): r.z for r in df.collect()}
    assert all(z >= 0 for z in rows.values()), rows
    # exact Morton values: interleave(a@even, b@odd)
    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in rows.items():
        assert z == ref(a, b), (a, b, z)
