"""Deterministic sampling & data-mixture operators.

The reference has no sampling surface (its producer emits everything,
consumer.py keeps everything); a training-data pipeline lives on it:
hold-out carving, per-stratum rates, per-domain caps, and mixture
upsampling. Everything here is RNG-free — selection derives from
md5(key), so results are reproducible across runs, engines (the DuckDB
oracle recomputes the same buckets), executors, and cluster sizes.
`df.sample()` deliberately does NOT appear: its Bernoulli draw depends on
partitioning and seed plumbing, which is exactly the irreproducibility a
curated corpus cannot afford.

Scale shapes:
- hash_sample / stratified_sample: pure column math + filter — no
  shuffle, pushdown-friendly, linear at any corpus size;
- cap_per_group: one shuffle keyed by the group column (same cost class
  as any per-group top-k); rank order is md5-derived, so the kept subset
  is a uniform random-looking slice yet stable;
- upsample_mixture: broadcast of the tiny weights table + a row-local
  explode — output-proportional cost, no shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Selection granularity: 16^4 = 65536 md5 buckets folded mod 10_000 would
# bias low buckets; instead thresholds are expressed directly in the
# 0..9999 range of (first-4-hex-digits mod 10000), matching the SQL twin.
BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "", modulus: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, modulus) from md5(salt || key).

    First 4 hex digits -> int via conv(); content-independent of row
    order/partitioning. ``salt`` decorrelates independent decisions made
    from the same key (e.g. sampling vs mixture upsampling). ``modulus``
    must divide the raw 16-bit value ONCE — (x % a) % b != x % b in
    general, so callers needing a different width pass it here instead
    of re-modding the default bucket id.
    """
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % modulus


def md5_bucket_sql(expr: str, salt: str = "", modulus: int = BUCKETS) -> str:
    """DuckDB twin of :func:`hash_bucket` (DuckDB has no conv(): positional
    strpos expansion over the first 4 hex digits), mod ``modulus``."""
    arg = f"'{salt}' || {expr}" if salt else expr
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) % {modulus})"


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    Bernoulli sampling. Monotone in fraction: sample(0.1) is a subset of
    sample(0.2) over the same keys (thresholding one bucket value).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    keep = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), salt) < keep)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. keep 50% of 'en', 10% of 'de').

    The fractions map joins in as a BROADCAST dimension rather than a
    when-chain so the pattern survives thousands of strata (real corpora
    key mixtures by domain); unknown strata fall back to
    ``default_fraction``.
    """
    spark = df.sparkSession
    thresholds = spark.createDataFrame(
        [(k, int(round(v * BUCKETS))) for k, v in sorted(fractions.items())],
        f"{strata_col} string, _keep_below int",
    )
    return (
        df.join(F.broadcast(thresholds), strata_col, "left")
        .filter(
            hash_bucket(F.col(key_col), salt)
            < F.coalesce(F.col("_keep_below"), F.lit(int(round(default_fraction * BUCKETS))))
        )
        .drop("_keep_below")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    rank_col: str = "sample_rank",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by hash rank — the
    per-domain cap that stops one crawl host from dominating a corpus.

    Rank = row_number ordered by (md5(key), key) within the group: a
    uniform shuffle-once selection that is stable across runs. The full
    md5 hex (not the 4-digit bucket) orders, so ties are broken by key
    only between genuinely equal-hash rows.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= cap)
    )


def upsample_mixture(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    copy_col: str = "copy_id",
    salt: str = "mix",
) -> DataFrame:
    """Mixture weighting by integer replication: each row of stratum ``s``
    appears floor(w_s) times plus one more for a hash-selected frac(w_s)
    share of keys — in expectation exactly w_s copies, deterministically.
    Weight 0 (or an unlisted stratum) drops the row; weights must be >= 0.

    This is the standard data-mixing move (e.g. upsample Wikipedia 3x,
    downsample CommonCrawl to 0.7x) expressed as broadcast-join + explode:
    no corpus shuffle, output size = sum of weights * strata sizes.
    ``copy_col`` numbers the copies 1..n so downstream shuffles can keep
    copies distinct.
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be >= 0: {weights}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [
            (k, int(w), int(round((w - int(w)) * BUCKETS)))
            for k, w in sorted(weights.items())
        ],
        f"{strata_col} string, _base int, _extra_below int",
    )
    n_copies = F.col("_base") + F.when(
        hash_bucket(F.col(key_col), salt) < F.col("_extra_below"), 1
    ).otherwise(0)
    return (
        df.join(F.broadcast(wdf), strata_col)  # inner: unlisted strata drop
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .withColumn(copy_col, F.col(copy_col).cast("bigint"))
        .drop("_base", "_extra_below", "_n")
    )


def weighted_topk_sample(
    df: DataFrame, key_col: str, weight_col: Column, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row gets score ln(u)/w with u hash-derived from
    its key (never an RNG — same [[hash_bucket]] discipline as the other
    samplers), and the k largest scores win; inclusion probability is
    proportional to weight. Rank ties are broken by key, and u comes
    from the bucket midpoint so it is strictly inside (0,1). One
    TakeOrdered-style top-k — no shuffle beyond it, reproducible across
    runs, partitionings, and engines.
    """
    u = (hash_bucket(F.col(key_col), salt).cast("double") + F.lit(0.5)) / BUCKETS
    score = F.round(F.log(u) / weight_col.cast("double"), 9)
    # orderBy().limit() plans as TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows) — a global row_number window would
    # instead sort everything in ONE partition.
    return (
        df.withColumn("_es_score", score)
        .orderBy(F.col("_es_score").desc(), F.col(key_col))
        .limit(k)
    )


def negative_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    n_buckets: int = 16,
    salt: str = "neg",
) -> DataFrame:
    """``k`` deterministic negative partners per anchor row — the
    contrastive-training primitive (anchor, negative) without a cross
    join and without RNG.

    Every row gets an md5 bucket and an md5-order rank WITHIN its bucket;
    anchor r takes buckets-mates at ranks (r+1 .. r+k) mod bucket_size
    (capped at bucket_size-1, so partners are distinct and never self).
    Because md5 order is content-independent pseudo-random, partners are
    uniform-random-looking yet identical across runs, engines, and
    cluster sizes — the same reproducibility contract as hash_sample.

    Scale shape: ONE shuffle on the bucket id (window rank + count share
    it), a row-local offset explode (k rows per anchor), and ONE equi
    join on (bucket, rank) — reducer work per bucket is bucket_size * k,
    so n_buckets tunes parallelism exactly like any hash partitioning.
    No global sort, no driver state, no doc x doc blowup.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("_b").orderBy("_h", id_col)
    ranked = (
        df.select(F.col(id_col))
        .withColumn("_b", hash_bucket(F.col(id_col), salt, n_buckets))
        .withColumn("_h", h)
        .withColumn("_r", F.row_number().over(w) - 1)
        .withColumn("_cnt", F.count("*").over(Window.partitionBy("_b")))
    )
    offsets = F.when(
        F.col("_cnt") > 1,
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("_cnt") - 1)),
    ).otherwise(F.array())
    exploded = (
        ranked.withColumn("_s", F.explode(offsets))
        .withColumn("_pr", (F.col("_r") + F.col("_s")) % F.col("_cnt"))
        .select(
            F.col(id_col).alias("anchor_id"),
            "_b",
            "_pr",
            F.col("_s").cast("bigint").alias("slot"),
        )
    )
    partners = ranked.select(
        F.col(id_col).alias("negative_id"), "_b", F.col("_r").alias("_pr")
    )
    return exploded.join(partners, ["_b", "_pr"]).select(
        "anchor_id", "negative_id", "slot"
    )
