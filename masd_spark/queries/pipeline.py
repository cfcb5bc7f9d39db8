"""End-to-end LLM data-prep pipeline: the composition proof.

One registered query chains the engine's text operators the way a real
training-data pipeline does — quality filter -> language filter -> exact
dedup -> near-dup removal -> token budget — and the DuckDB oracle
recomputes the ENTIRE chain, so the composition (not just each operator)
is value-checked. Every stage is a shuffle-bounded DataFrame transform;
nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.functions.quantize import qround6, qround6_sql
from masd_spark.operators.dedup import dedup_exact, jaccard_pairs
from masd_spark.operators.sampling import md5_bucket_sql
from masd_spark.operators.text import (
    BPE_SPLIT_PATTERN,
    bpe_token_count,
    language_id,
    quality_features,
    tokens,
)
from masd_spark.queries import register
from masd_spark.queries.text import _lex_values_sql
from masd_spark.sources.tables import load_table

MIN_TOKENS = 5
MIN_ALPHA = 0.5

_PIPELINE_SQL = f"""
    WITH q AS (
        SELECT doc_id, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
               CASE WHEN length(text) > 0 THEN
                   ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                              AS DOUBLE) / length(text), 6) END AS alpha
        FROM documents
    ),
    qual AS (
        SELECT doc_id, text FROM q
        WHERE n_tok >= {MIN_TOKENS} AND alpha >= {MIN_ALPHA}
    ),
    lex(lang_cand, tok) AS (VALUES {{lex_values}}),
    toked AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM qual
    ),
    votes AS (
        SELECT doc_id, lang_cand, count(*) AS votes
        FROM toked JOIN lex USING (tok) GROUP BY doc_id, lang_cand
    ),
    best AS (
        SELECT doc_id, lang_cand,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY votes DESC, lang_cand) AS rn
        FROM votes
    ),
    en AS (
        SELECT q.doc_id, q.text
        FROM qual q JOIN best b ON q.doc_id = b.doc_id
        WHERE b.rn = 1 AND b.lang_cand = 'en'
    ),
    fp AS (
        SELECT doc_id, text,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
        FROM en
    ),
    keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
    kept AS (
        SELECT d.doc_id, d.text
        FROM fp d JOIN keep k ON d.doc_id = k.doc_id AND d.f = k.f
    ),
    ktoks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
        FROM kept
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                     for i in range(1, len(ts) - 1)])) AS shingle
        FROM ktoks WHERE len(ts) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE ROUND(CAST(n_inter AS DOUBLE)
                    / (sa.set_size + sb.set_size - n_inter), 6) >= 0.5
    )
    SELECT k.doc_id,
           CAST(len(regexp_extract_all(k.text, '{BPE_SPLIT_PATTERN}')) AS BIGINT)
               AS n_bpe_tokens
    FROM kept k
    WHERE k.doc_id NOT IN (SELECT doc_b FROM pairs)
"""


@register(
    "pipeline_llm_dataprep",
    oracle=_PIPELINE_SQL.format(lex_values=_lex_values_sql()),
)
def pipeline_llm_dataprep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> quality filter (>=5 tokens, alpha >= 0.5) -> English
    only (stopword-vote language ID) -> exact dedup (keep smallest id per
    fingerprint) -> near-dup removal (drop the larger id of every 3-gram
    Jaccard >= 0.5 pair) -> per-survivor BPE-ish token count. Five stages,
    five bounded shuffles, zero driver round-trips.
    """
    docs = load_table(spark, sf_dir, "documents")
    qual = (
        quality_features(docs)
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA)
        )
        .select("doc_id", "text")
    )
    en = (
        language_id(qual)
        .filter(F.col("lang_pred") == "en")
        .select("doc_id")
        .join(qual, "doc_id")
    )
    deduped = dedup_exact(en)
    near_dup_victims = jaccard_pairs(deduped, k=3, threshold=0.5).select("doc_b")
    survivors = deduped.join(
        near_dup_victims, deduped.doc_id == near_dup_victims.doc_b, "left_anti"
    )
    return survivors.select(
        "doc_id", bpe_token_count("text").alias("n_bpe_tokens")
    )


def _md5_bucket_sql(expr: str, n_digits: int = 4) -> str:
    """Portable hex-digits -> integer (DuckDB has no conv()): positional
    strpos expansion over the first n_digits of md5(expr)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (n_digits - 1 - i)}"
        for i in range(n_digits)
    )
    return f"({terms})"


@register(
    "pipeline_train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_md5_bucket_sql("CAST(doc_id AS VARCHAR)")} % 100 < 80
                     THEN 'train'
                WHEN {_md5_bucket_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                     THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by content-independent hash of the id
    — reproducible across runs, engines, and cluster sizes (no RNG, no
    sample()); the property a training pipeline actually needs from its
    split. Bucket = first 4 hex digits of md5(id) mod 100.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 100
    )
    return docs.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


PACK_BUDGET_TOKENS = 2048


@register(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}')) AS n_tok
        FROM documents
    )
    SELECT doc_id, source,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id
    FROM t
    """,
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents fill fixed token-budget packs in
    deterministic (source, doc_id) order — pack_id = cumulative tokens
    BEFORE this doc, integer-divided by the budget. One window shuffle
    keyed by source; the downstream concat job groups by (source,
    pack_id) with no further ordering dependency.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", bpe_token_count("text").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        cum_before.alias("_cum"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"_cum div {PACK_BUDGET_TOKENS}").cast("bigint").alias("pack_id"),
    )


@register(
    "pipeline_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                     for i in range(1, len(ts) - 1)])) AS shingle
        FROM toks WHERE len(ts) >= 3
    ),
    bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    )
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_benchmark_hits
    FROM sh s JOIN bench USING (shingle)
    WHERE s.doc_id % 97 != 0
    GROUP BY s.doc_id
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile n-gram-overlap check):
    flag training documents sharing any 3-gram shingle with the held-out
    benchmark set (stand-in: every 97th doc). The benchmark shingle set is
    small by construction -> BROADCAST to the shingle-keyed doc side; one
    scan, no shingle-keyed shuffle of the corpus. Returns contaminated doc
    ids with their hit counts — the removal itself is a left_anti join on
    this result.
    """
    from masd_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs, "doc_id", "text", 3, materialize=False)
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    train = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_benchmark_hits"))
    )


N_FOLDS = 5


@register(
    "pipeline_kfold_assignment",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang,
               {_md5_bucket_sql("'fold:' || CAST(doc_id AS VARCHAR)")}
                   % {N_FOLDS} AS fold
        FROM documents
    )
    SELECT CAST(fold AS BIGINT) AS fold, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM assigned GROUP BY 1, 2
    """,
)
def pipeline_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) by salted content hash:
    fold membership is a pure function of the id — reproducible across
    engines and cluster sizes, disjoint and exhaustive by construction,
    and independent of the train/test split's buckets (different salt).
    Per-(fold, lang) counts surface stratification balance; the
    assignment itself is shuffle-free column math.
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % N_FOLDS
    )
    return (
        docs.select(fold.alias("fold"), "lang", "doc_id")
        .groupBy("fold", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# Feature engineering: categorical dictionary encoding (StringIndexer)
# --------------------------------------------------------------------------

@register(
    "ml_string_index_encode",
    oracle="""
    WITH lang_v AS (
        SELECT lang, CAST(row_number() OVER (ORDER BY count(*) DESC, lang) - 1
                          AS BIGINT) AS lang_idx
        FROM documents GROUP BY lang
    ),
    src_v AS (
        SELECT source, CAST(row_number() OVER (ORDER BY count(*) DESC, source) - 1
                            AS BIGINT) AS source_idx
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.lang, lv.lang_idx, d.source, sv.source_idx
    FROM documents d
    JOIN lang_v lv USING (lang)
    JOIN src_v sv USING (source)
    """,
)
def ml_string_index_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dictionary encoding (the StringIndexer primitive):
    each categorical column gets dense integer ids ordered by frequency
    (most frequent = 0; ties alphabetical, so the vocabulary is
    deterministic and engine-portable). The vocabularies are tiny
    aggregates — the global row_number runs over |distinct values| rows,
    never the fact table — and attach back via broadcast joins, keeping
    the encode itself map-side. At 100 TB: two small-key aggs + two
    broadcasts; no fact shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")

    def vocab(col: str, idx_name: str) -> DataFrame:
        counts = docs.groupBy(col).agg(F.count("*").alias("_n"))
        w = Window.orderBy(F.col("_n").desc(), F.col(col))
        return counts.select(
            col, (F.row_number().over(w) - 1).cast("long").alias(idx_name)
        )

    return (
        docs.select("doc_id", "lang", "source")
        .join(F.broadcast(vocab("lang", "lang_idx")), "lang")
        .join(F.broadcast(vocab("source", "source_idx")), "source")
        .select("doc_id", "lang", "lang_idx", "source", "source_idx")
    )


# --------------------------------------------------------------------------
# Feature engineering: the hashing trick (fixed-width sparse features)
# --------------------------------------------------------------------------

_HASH_DIM = 256


@register(
    "ml_feature_hash_docs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    )
    SELECT doc_id,
           CAST({md5_bucket_sql("tok", modulus=_HASH_DIM)} AS BIGINT)
               AS feature_idx,
           CAST(count(*) AS BIGINT) AS n
    FROM toks
    GROUP BY 1, 2
    """,
)
def ml_feature_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): tokens map to a fixed
    {dim}-bucket feature space via the engine's salt-able md5 bucket
    (content-derived, partitioning-independent, and reproducible in any
    engine — unlike murmur/xxhash whose cross-engine variants differ).
    Output is the sparse (doc, feature, count) matrix; vocabulary size
    never enters the schema, which is the point at 100 TB — no vocab
    build, no OOV, one explode + one partial-agg groupBy keyed by
    (doc, bucket).
    """
    from masd_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    return (
        toked.select(
            "doc_id", hash_bucket(F.col("tok"), modulus=_HASH_DIM).alias("feature_idx")
        )
        .groupBy("doc_id", "feature_idx")
        .agg(F.count("*").alias("n"))
    )


_NEG_K = 3
_NEG_BUCKETS = 16
_NEG_SALT = "neg"


def _neg_oracle() -> str:
    bucket = md5_bucket_sql("doc_id", salt=_NEG_SALT, modulus=_NEG_BUCKETS)
    return f"""
    WITH ranked AS (
        SELECT doc_id,
               {bucket} AS b,
               md5('{_NEG_SALT}' || doc_id) AS h,
               row_number() OVER (
                   PARTITION BY {bucket}
                   ORDER BY md5('{_NEG_SALT}' || doc_id), doc_id
               ) - 1 AS r,
               count(*) OVER (PARTITION BY {bucket}) AS cnt
        FROM documents
    ),
    exploded AS (
        SELECT rk.doc_id AS anchor_id, rk.b, rk.r, rk.cnt,
               s.s AS slot
        FROM ranked rk,
             (SELECT unnest(generate_series(1, {_NEG_K})) AS s) s
        WHERE s.s <= rk.cnt - 1
    )
    SELECT e.anchor_id, p.doc_id AS negative_id, e.slot
    FROM exploded e
    JOIN ranked p ON p.b = e.b AND p.r = (e.r + e.slot) % e.cnt
    """


@register("pipeline_negative_pairs", oracle=_neg_oracle())
def pipeline_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negatives: 3 deterministic partners per
    anchor document via md5-bucketed rank shifting — uniform-looking,
    RNG-free, reproducible across engines/cluster sizes, and never a
    cross join (one bucket-keyed shuffle + one (bucket, rank) equi
    join; see operators/sampling.py:negative_pairs for the scale
    accounting).
    """
    from masd_spark.operators.sampling import negative_pairs

    docs = load_table(spark, sf_dir, "documents")
    return negative_pairs(
        docs, id_col="doc_id", k=_NEG_K, n_buckets=_NEG_BUCKETS, salt=_NEG_SALT
    )


# --------------------------------------------------------------------------
# Model scoring: linear classifier over hashed features (fasttext-style
# quality filter, weights as plan literals)
# --------------------------------------------------------------------------

_LM_W_SALT = "lmw:"
_LM_W_SPAN = 2001  # weights in [-1000, 1000] milli-units


@register(
    "ml_linear_score_docs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               {md5_bucket_sql("tok", modulus=256)} AS feature_idx,
               CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY 1, 2
    ),
    scored AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(sum(n * ({md5_bucket_sql("feature_idx", salt=_LM_W_SALT, modulus=_LM_W_SPAN)} - 1000))
                    AS BIGINT) AS logit_milli
        FROM feats GROUP BY 1
    )
    SELECT doc_id, n_tokens, logit_milli,
           {qround6_sql('CAST(logit_milli AS DOUBLE) / n_tokens / 1000.0')}
               AS score,
           logit_milli > 0 AS keep
    FROM scored
    """,
)
def ml_linear_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-model document scoring — the fasttext-style quality-filter
    shape: hashed token features (256 buckets, the ml_feature_hash_docs
    space) dotted with a weight vector that lives as PLAN LITERALS
    (here md5-derived per-bucket milli-unit weights standing in for
    trained coefficients; a real model swaps in its 256 floats, same
    plan). The logit is an exact integer sum — no transcendental
    functions, because sigmoid is monotone, so thresholding the logit
    IS thresholding the probability; the per-token mean score is one
    exact-integer division rounded at the end.

    Scale: tokenize + hash are map-side; ONE (doc, bucket) partial agg
    then a per-doc agg that reuses the doc_id partitioning. No vocab
    build, no joins, no weight broadcast even — the "model" is O(dim)
    constants folded into the expression. This is how a 100 TB corpus
    gets classifier-filtered in a single pass.
    """
    from masd_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    feats = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .select("doc_id", hash_bucket(F.col("tok"), modulus=256).alias("feature_idx"))
        .groupBy("doc_id", "feature_idx")
        .agg(F.count("*").alias("n"))
    )
    w = hash_bucket(F.col("feature_idx"), salt=_LM_W_SALT, modulus=_LM_W_SPAN) - 1000
    scored = feats.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("n") * w).alias("logit_milli"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_milli",
        qround6(F.col("logit_milli").cast("double") / F.col("n_tokens") / 1000.0).alias("score"),
        (F.col("logit_milli") > 0).alias("keep"),
    )


# --------------------------------------------------------------------------
# Inference batching: length-bucketed batch assignment + padding waste
# --------------------------------------------------------------------------

_LB_BUCKET_TOKENS = 64  # length-bucket granularity
_LB_BATCH_SIZE = 16


@register(
    "pipeline_length_bucketing",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS n_tokens
        FROM documents
        -- a doc without an id or text cannot be batched (and Spark's
        -- size(split(NULL)) is -1 where DuckDB's len is NULL)
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    bucketed AS (
        SELECT doc_id, n_tokens,
               n_tokens // {_LB_BUCKET_TOKENS} AS bucket,
               CAST((row_number() OVER (PARTITION BY n_tokens // {_LB_BUCKET_TOKENS}
                                        ORDER BY n_tokens, doc_id) - 1)
                    // {_LB_BATCH_SIZE} AS BIGINT) AS batch_in_bucket
        FROM lens
    ),
    batches AS (
        SELECT bucket, batch_in_bucket,
               max(n_tokens) AS batch_max,
               CAST(count(*) AS BIGINT) AS batch_n,
               CAST(sum(n_tokens) AS BIGINT) AS batch_tokens
        FROM bucketed GROUP BY 1, 2
    )
    SELECT b.doc_id, b.n_tokens, b.bucket, b.batch_in_bucket,
           t.batch_max,
           CAST(t.batch_max * t.batch_n - t.batch_tokens AS BIGINT)
               AS batch_pad_waste
    FROM bucketed b JOIN batches t USING (bucket, batch_in_bucket)
    """,
)
def pipeline_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching: documents group into
    {bs}-doc batches WITHIN a token-length bucket (granularity
    {gran} tokens), ordered (n_tokens, doc_id) inside the bucket so
    near-equal lengths share a batch — the standard padding-waste
    minimizer in front of batched model inference. Each row carries its
    batch's max length and total pad waste (max*count - sum), the number
    a serving stack actually optimizes. Deterministic: bucket id, batch
    id, and waste are all integer arithmetic over a total order.

    Scale: one map-side length projection; the only shuffle is the
    per-bucket window (buckets are the partition key — thousands of
    independent partitions at corpus scale); batch stats reuse the same
    partitioning.
    """.format(bs=_LB_BATCH_SIZE, gran=_LB_BUCKET_TOKENS)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    lens = docs.select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    bucket = F.expr(f"n_tokens div {_LB_BUCKET_TOKENS}")
    w = Window.partitionBy(bucket).orderBy("n_tokens", "doc_id")
    bucketed = lens.select(
        "doc_id",
        "n_tokens",
        bucket.alias("bucket"),
        F.expr(
            f"CAST((row_number() OVER (PARTITION BY n_tokens div {_LB_BUCKET_TOKENS} "
            f"ORDER BY n_tokens, doc_id) - 1) div {_LB_BATCH_SIZE} AS BIGINT)"
        ).alias("batch_in_bucket"),
    )
    batches = bucketed.groupBy("bucket", "batch_in_bucket").agg(
        F.max("n_tokens").alias("batch_max"),
        F.count("*").alias("batch_n"),
        F.sum("n_tokens").alias("batch_tokens"),
    )
    return bucketed.join(batches, ["bucket", "batch_in_bucket"]).select(
        "doc_id",
        "n_tokens",
        "bucket",
        "batch_in_bucket",
        "batch_max",
        (F.col("batch_max") * F.col("batch_n") - F.col("batch_tokens"))
        .cast("bigint")
        .alias("batch_pad_waste"),
    )


_ES_EPOCH = 3
_ES_SHARDS = 8


@register(
    "pipeline_epoch_shard_order",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id,
               {md5_bucket_sql("CAST(doc_id AS VARCHAR)", salt=f"shard-e{_ES_EPOCH}:", modulus=_ES_SHARDS)} AS shard,
               md5('ord-e{_ES_EPOCH}:' || CAST(doc_id AS VARCHAR)) AS ord_key
        FROM documents
    )
    SELECT doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY ord_key, doc_id) AS BIGINT) AS pos
    FROM assigned
    """,
)
def pipeline_epoch_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle + sharding: every document
    gets a shard (md5-bucket of its id, salted by epoch number) and a
    position within the shard (rank of an epoch-salted md5 — a keyed
    pseudorandom permutation). Re-salting the epoch re-deals both, which
    is exactly how a trainer gets a fresh global shuffle per epoch
    WITHOUT any RNG state: reproducible from (epoch, doc_id) alone,
    independent of partitioning, cluster size, or insertion order —
    the same determinism recipe as the md5 sampling family
    (operators/sampling.py).

    Scale: one shuffle on the shard key; at 100 TB this materializes as
    write.partitionBy(shard) + sortWithinPartitions(ord_key) — shards
    are the training reader's parallel unit, and within-shard order is
    already the permutation, so the trainer streams sequentially.
    """
    from masd_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.select(
        "doc_id",
        hash_bucket(
            F.col("doc_id"), salt=f"shard-e{_ES_EPOCH}:", modulus=_ES_SHARDS
        ).alias("shard"),
        F.md5(
            F.concat(F.lit(f"ord-e{_ES_EPOCH}:"), F.col("doc_id").cast("string"))
        ).alias("ord_key"),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return assigned.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "pipeline_temperature_mixture",
    oracle="""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
               sum(sqrt(CAST(n_tokens AS DOUBLE))) AS tsq
        FROM per_src
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           ROUND(CAST(p.n_tokens AS DOUBLE) / tot.t, 6) AS natural_share,
           ROUND(sqrt(CAST(p.n_tokens AS DOUBLE)) / tot.tsq, 6) AS temp_share,
           ROUND((sqrt(CAST(p.n_tokens AS DOUBLE)) / tot.tsq)
                 / (CAST(p.n_tokens AS DOUBLE) / tot.t), 6) AS boost
    FROM per_src p CROSS JOIN tot
    """,
)
def pipeline_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing (alpha = 0.5): the standard
    multilingual/multi-source recipe (exponentiate source token masses,
    renormalize — mBERT/XLM-R style) that upweights small sources without
    letting any dominate. Per source: natural token share, the
    temperature share n^0.5 / sum(n^0.5), and the boost ratio a sampler
    applies on top of natural frequency (>1 = upsample; feeds
    upsample_mixture's integer replication weights).

    Portability: alpha=0.5 is computed as sqrt() — IEEE-exact (correctly
    rounded) on both engines, unlike pow(x, 0.5) whose libm rounding is
    unspecified; the only order-sensitive float sum spans |sources| rows
    and the 6-dp surface absorbs its ulp. Scale: size(split) per row, one
    partial agg to |sources| rows, every share computed on the broadcast
    tiny aggregate — the fact table is scanned exactly once.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text")).cast("bigint")).alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("t"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("tsq"),
    )
    nat = F.col("n_tokens").cast("double") / F.col("t")
    tmp = F.sqrt(F.col("n_tokens").cast("double")) / F.col("tsq")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(nat, 6).alias("natural_share"),
        F.round(tmp, 6).alias("temp_share"),
        F.round(tmp / nat, 6).alias("boost"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance resampling (data selection for pretraining)
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_TARGET = "src0"
_DSIR_TOPK = 200


@register(
    "pipeline_dsir_importance",
    oracle=f"""
    WITH ts AS (
        SELECT doc_id, source,
               string_split_regex(lower(trim(text)), '\\s+') AS ts
        FROM documents WHERE length(trim(text)) > 0
    ),
    bg AS (
        SELECT doc_id, source,
               unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS bg
        FROM ts WHERE len(ts) >= 2
    ),
    feats AS (
        SELECT doc_id, source,
               {md5_bucket_sql('bg', salt='dsir', modulus=_DSIR_BUCKETS)} AS bucket
        FROM bg
    ),
    dist AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS cr,
               CAST(count(*) FILTER (WHERE source = '{_DSIR_TARGET}')
                    AS BIGINT) AS ct
        FROM feats GROUP BY bucket
    ),
    tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS nr,
               CAST(sum(ct) AS BIGINT) AS nt
        FROM dist
    ),
    ratio AS (
        SELECT bucket,
               CAST(ln(CAST(ct + 1 AS DOUBLE)
                       / CAST(nt + {_DSIR_BUCKETS} AS DOUBLE))
                    AS DECIMAL(18,8))
             - CAST(ln(CAST(cr + 1 AS DOUBLE)
                       / CAST(nr + {_DSIR_BUCKETS} AS DOUBLE))
                    AS DECIMAL(18,8)) AS lr
        FROM dist CROSS JOIN tot
    ),
    scored AS (
        SELECT f.doc_id, f.source, sum(r.lr) AS w,
               CAST(count(*) AS BIGINT) AS n_bigrams
        FROM feats f JOIN ratio r USING (bucket)
        GROUP BY 1, 2
    )
    SELECT doc_id, source, n_bigrams,
           ROUND(CAST(w AS DOUBLE), 6) AS dsir_logweight
    FROM scored ORDER BY w DESC, doc_id LIMIT {_DSIR_TOPK}
    """,
)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, arXiv
    2302.03169): select raw-pool documents that look most like a target
    domain under a hashed-bigram bag-of-ngrams model. Per bucket b of
    64 md5-hashed bigram buckets, the importance log-ratio
    is ln p_target(b) - ln p_raw(b) with Laplace (+1) smoothing; a doc's
    weight is the sum of the ratio over its bigram OCCURRENCES (counts,
    not a set), and the top-200 docs by weight (doc_id
    tie-break) are the selected training subset. Target domain here =
    source 'src0' (the per-source token mixture is the only
    domain signal in the synthetic corpus).

    Engine addition (no reference analogue; reference scope is
    consumer.py:83-208 stream transforms) — this is the §7 pretraining
    data-selection family next to pipeline_temperature_mixture.

    Parity recipe: each ln() is computed on a cross-engine-identical
    double and quantized to DECIMAL(18,8) BEFORE any summation, so the
    per-doc fold is integer-exact and order/partitioning-independent;
    ORDER BY uses the exact decimal weight (not the rounded display
    value) + doc_id, so the LIMIT boundary is deterministic on both
    engines.

    Scale: ONE pass over the corpus builds both distributions (a single
    64-row groupBy with a conditional count — no second scan for the
    target), the ratio table is a broadcast of 64 rows, and scoring
    is a map-side broadcast join +
    one partial-agg shuffle keyed on doc_id; the final top-k is
    TakeOrderedAndProject (no global sort). At 100 TB the feature
    explode is the only corpus-sized intermediate and it never
    shuffles; re-tokenization for the two consumers (dist, scored) is
    a deliberate scan/shuffle trade — checkpoint the feats frame if
    the corpus is wider than it is tall.
    """
    from masd_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    ts = docs.select("doc_id", "source", tokens("text").alias("ts")).filter(
        F.size("ts") >= 2
    )
    feats = ts.select(
        "doc_id",
        "source",
        F.explode(
            F.expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i+1]))")
        ).alias("bg"),
    ).select(
        "doc_id",
        "source",
        hash_bucket(F.col("bg"), salt="dsir", modulus=_DSIR_BUCKETS).alias("bucket"),
    )
    dist = feats.groupBy("bucket").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("source") == _DSIR_TARGET, 1)).alias("ct"),
    )
    # 64 rows, but its LINEAGE is a full corpus scan — and it feeds both
    # the totals and the ratio table. Checkpoint so the corpus is scanned
    # once for the distributions, once for scoring (2 scans, not 3).
    dist = dist.localCheckpoint(eager=True)
    tot = dist.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    n_b = F.lit(_DSIR_BUCKETS)
    ratio = dist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + n_b).cast("double"))
            .cast("decimal(18,8)")
            - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + n_b).cast("double"))
            .cast("decimal(18,8)")
        ).alias("lr"),
    )
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr").alias("w"), F.count("*").alias("n_bigrams"))
    )
    return (
        scored.orderBy(F.col("w").desc(), "doc_id")
        .limit(_DSIR_TOPK)
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            F.round(F.col("w").cast("double"), 6).alias("dsir_logweight"),
        )
    )
