"""The scale-proof hash comparator (tests/oracle.py:hash_compare_query)
must agree with the collect-based comparator wherever both can run, and
must actually DETECT divergence — these pins license its use for
SF100-class outputs whose rows can't be collected.
"""

import pytest

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query, hash_compare_query

REGISTRY = load_all()

# Mixed-type coverage: strings+decimals (q1), raw doubles per-row
# (winsorize, 10k rows at gate scale), booleans (hll bound), bigints +
# doubles (ohlc), epoch-ms + floats (sensor rollup).
AGREEMENT = [
    "q1_pricing_summary",
    "clean_winsorize_values",
    "sketch_hll_error_bound",
    "ts_ohlc_hourly_bars",
    "masd_sensor_rollup",
]


@pytest.mark.parametrize("name", AGREEMENT)
def test_hash_comparator_agrees_with_collect(spark, name):
    spec = REGISTRY[name]
    compare_query(spark, spec, SF_ORACLE)  # bit-exact baseline
    out = hash_compare_query(spark, spec, SF_ORACLE)
    assert out["rows"] > 0


def test_hash_comparator_detects_value_divergence(spark):
    """A one-value perturbation in the oracle must flip the hash."""
    import dataclasses

    spec = REGISTRY["q1_pricing_summary"]
    broken = dataclasses.replace(
        spec,
        oracle=f"SELECT * REPLACE (sum_qty + 1 AS sum_qty) FROM ({spec.oracle})",
    )
    with pytest.raises(AssertionError, match="hash parity mismatch"):
        hash_compare_query(spark, broken, SF_ORACLE)


def test_hash_comparator_detects_row_count_divergence(spark):
    import dataclasses

    spec = REGISTRY["q1_pricing_summary"]
    broken = dataclasses.replace(
        spec, oracle=f"SELECT * FROM ({spec.oracle}) LIMIT 3"
    )
    with pytest.raises(AssertionError, match="hash parity mismatch"):
        hash_compare_query(spark, broken, SF_ORACLE)
