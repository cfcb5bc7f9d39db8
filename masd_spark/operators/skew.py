"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join handles skewed SHUFFLE partitions automatically (enabled
in session.py), but it cannot split a single pathological key on the
build side of a broadcast, nor help aggregations keyed by a hot value.
Salting is the manual tool: the skewed (large) side gets a
content-independent salt in [0, n_salts); the small side is replicated
n_salts times; the join key becomes (key, salt), spreading one hot key
over n_salts tasks.

Cost model: replicates the small side n_salts times — use only when a
key's row count exceeds what one task should own (monitor via AQE skew
metrics or a pre-aggregated key histogram).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Join types where replicating the small side n_salts times cannot change
# the result. right/full outer would emit each unmatched small-side copy
# once per salt (wrong row counts), so they are rejected.
# 'cross' is deliberately NOT accepted: salted_join always joins on
# using-columns [*on, '_salt'], which would silently turn a requested cross
# join into an inner equi-join.
_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
             "leftsemi", "semi", "left_anti", "leftanti", "anti"}


def drop_overfull_buckets(
    df: DataFrame, key_cols: Sequence[str], max_bucket: int | None
) -> DataFrame:
    """Drop every row of any key group larger than ``max_bucket``.

    The shared skew cap of the LSH/banding candidate generators
    (minhash bands, embedding LSH tables, the incremental-minhash
    history index): a bucket with more than ``max_bucket`` members is a
    degenerate near-constant feature (boilerplate shingle, hot band) —
    its O(bucket^2) candidate pairs would dominate reducer work while
    contributing near-zero precision. One unordered COUNT window = one
    shuffle on the key columns, and the bucket self-join right after
    keys on the same columns, so the exchange is reusable.
    ``max_bucket=None`` disables the cap (exact/uncapped oracle twins).
    """
    if max_bucket is None:
        return df
    from pyspark.sql import Window

    occ = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    return (
        df.withColumn("_occupancy", occ)
        .filter(F.col("_occupancy") <= max_bucket)
        .drop("_occupancy")
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side replicated.

    The salt must be content-INDEPENDENT: hashing row contents fails in
    the degenerate-but-common case where a hot key's rows are
    byte-identical (every duplicate gets the same salt and the key never
    spreads). Instead the salt derives from physical position —
    ``monotonically_increasing_id()`` encodes (partition_id << 33 | row
    offset), so ``pmod(id, n_salts)`` cycles through all salts within
    every partition. It is deterministic under task retries (Spark replays
    a partition from the same input split, reproducing the same ids) yet
    independent of row bytes, so even identical duplicates fan out.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins only, got {how!r}: "
            "replicating the small side breaks right/full outer semantics"
        )
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    skewed_s = skewed.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = skewed_s.join(small_s, [*on, "_salt"], how)
    return joined.drop("_salt")
