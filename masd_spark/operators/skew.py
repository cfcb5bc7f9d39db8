"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join handles skewed SHUFFLE partitions automatically (enabled
in session.py), but it cannot split a single pathological key on the
build side of a broadcast, nor help aggregations keyed by a hot value.
Salting is the manual tool: the skewed (large) side gets a deterministic
salt in [0, n_salts); the small side is replicated n_salts times; the
join key becomes (key, salt), spreading one hot key over n_salts tasks.

Cost model: replicates the small side n_salts times — use only when a
key's row count exceeds what one task should own (monitor via AQE skew
metrics or a pre-aggregated key histogram).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side replicated.

    The salt is derived from xxhash64 of the skewed side's full row — any
    distribution works for correctness; hashing the row spreads a hot key
    evenly without RNG (deterministic across task retries, unlike rand()).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    skewed_s = skewed.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = skewed_s.join(small_s, [*on, "_salt"], how)
    return joined.drop("_salt")
