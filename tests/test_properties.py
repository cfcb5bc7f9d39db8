"""Property-based tests (hypothesis) for the pure algorithmic kernels —
no SparkSession, so these run in milliseconds and explore input shapes
the fixtures never produce. Derandomized for a stable suite."""

from collections import Counter
from decimal import Decimal
from fractions import Fraction

from hypothesis import given, settings, strategies as st

from masd_spark.operators.dedup import _as_fraction
from masd_spark.operators.sketches import mg_merge


@settings(max_examples=300, derandomize=True)
@given(
    items=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    k=st.integers(min_value=1, max_value=10),
    n_chunks=st.integers(min_value=1, max_value=7),
)
def test_mg_guarantee_on_any_partitioning(items, k, n_chunks):
    """The MG invariant the heavy_keys operator builds on: for ANY split
    of the input into chunks (micro-batches) and any merge order, every
    key with frequency > n/k survives the final <= k-counter summary."""
    chunk_size = max(1, len(items) // n_chunks)
    counters: dict = {}
    for i in range(0, len(items), chunk_size):
        counters = mg_merge(counters, Counter(items[i : i + chunk_size]).items(), k)
    assert len(counters) <= k
    n = len(items)
    freq = Counter(items)
    heavy = {key for key, c in freq.items() if c * k > n}
    assert heavy <= set(counters), (heavy, counters, k, n)


@settings(max_examples=300, derandomize=True)
@given(
    num=st.integers(min_value=1, max_value=10**6),
    den=st.sampled_from([10, 100, 1000, 10**4, 10**6]),
)
def test_as_fraction_recovers_decimal_thresholds(num, den):
    """Any threshold written as a decimal literal round-trips to the
    exact rational — the guarantee behind integer-exact prefix-filter
    bounds (no epsilon-above-integer float ceilings)."""
    t = num / den  # the float a caller would write
    f = Fraction(str(t))
    n, d = _as_fraction(t)
    assert Fraction(n, d) == f
    # and the rational equals the shortest decimal the caller wrote
    assert Decimal(str(t)) == Decimal(n) / Decimal(d)


@settings(max_examples=200, derandomize=True)
@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=1, max_value=1000),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=12),
)
def test_mg_single_merge_bounds_undercount(counts, k):
    """One merge: surviving counters never overcount, and undercount by
    at most the subtracted cut (<= n/(k+1))."""
    summary = mg_merge({}, counts.items(), k)
    n = sum(counts.values())
    for key, c in summary.items():
        assert c <= counts[key]
        assert counts[key] - c <= n // (k + 1)
