"""Sampling / data-mixture harness queries over the documents corpus.

Every selection is md5-derived (operators/sampling.py), so the DuckDB
oracle recomputes the EXACT same subset — these are value-checked, not
statistically checked. Conventions per masd_spark/queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.operators.sampling import (
    cap_per_group,
    hash_sample,
    md5_bucket_sql,
    stratified_sample,
    upsample_mixture,
)
from masd_spark.queries import register
from masd_spark.sources.tables import load_table

_ID_SQL = "CAST(doc_id AS VARCHAR)"


@register(
    "sample_hash_documents",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {md5_bucket_sql(_ID_SQL)} < 2500
    """,
)
def sample_hash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 25% Bernoulli sample by key hash — no RNG, no
    partitioning dependence (unlike df.sample()). Pure filter: pushes
    below any downstream shuffle, linear at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.25).select("doc_id", "lang", "source")


_STRATA_FRACTIONS = {"en": 0.5, "zh": 0.25, "es": 0.1}
_STRATA_DEFAULT = 0.05


@register(
    "sample_stratified_lang",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {md5_bucket_sql(_ID_SQL)} <
          CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500
                    WHEN 'es' THEN 1000 ELSE 500 END
    """,
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates (50% en / 25% zh / 10% es / 5% rest)
    via a BROADCAST thresholds dimension — the pattern survives thousands
    of strata where a literal when-chain would not.
    """
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", _STRATA_FRACTIONS, default_fraction=_STRATA_DEFAULT
    ).select("doc_id", "lang")


@register(
    "sample_cap_per_source",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5({_ID_SQL}), doc_id) AS sample_rank
        FROM documents
    )
    SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 12
    """,
)
def sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: at most 12 documents per source, chosen by hash
    rank — stops any one crawl host from dominating. One shuffle keyed by
    source (per-group top-k class).
    """
    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "source", "doc_id", cap=12).select(
        "doc_id", "source", "sample_rank"
    )


_MIX_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.4}


@register(
    "sample_upsample_mixture",
    oracle=f"""
    WITH w(source, base, extra_below) AS (
        VALUES ('src0', 2, 5000), ('src1', 1, 0), ('src2', 0, 4000)
    ),
    n AS (
        SELECT doc_id, d.source,
               base + CASE WHEN {md5_bucket_sql(_ID_SQL, salt="mix")} < extra_below
                           THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN w USING (source)
    )
    SELECT doc_id, source,
           CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_id
    FROM n WHERE n_copies > 0
    """,
)
def sample_upsample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting (src0 x2.5, src1 x1, src2 x0.4, rest dropped) by
    deterministic integer replication: floor(w) copies everywhere plus one
    extra for a hash-chosen frac(w) share of keys. Broadcast weights +
    row-local explode — the corpus itself never shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    return upsample_mixture(docs, "doc_id", "source", _MIX_WEIGHTS).select(
        "doc_id", "source", "copy_id"
    )


@register(
    "filter_quality_quantile",
    oracle="""
    WITH q AS (
        SELECT doc_id, lang,
               CASE WHEN length(text) > 0 THEN
                   ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                              AS DOUBLE) / length(text), 6) END AS alpha_ratio
        FROM documents
    ),
    r AS (
        SELECT doc_id, lang, alpha_ratio,
               percent_rank() OVER (PARTITION BY lang
                                    ORDER BY alpha_ratio,
                                             doc_id NULLS LAST) AS pct
        FROM q
        -- a doc with no text has no quality score to rank
        WHERE alpha_ratio IS NOT NULL
    )
    SELECT doc_id, lang, alpha_ratio, ROUND(pct, 6) AS quality_pct
    FROM r WHERE pct >= 0.2
    """,
)
def filter_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality gate: drop the bottom ~20% of each language
    by alpha ratio (absolute thresholds misfire across languages — CJK text
    has near-zero [A-Za-z]). percent_rank needs a per-lang sort: one
    shuffle keyed by lang; at 100 TB, approx thresholds from
    percentile_approx per lang (broadcast back) do the same gate with a
    partial-agg pass instead of a full sort.
    """
    from masd_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    q = (
        quality_features(docs)
        .select("doc_id", "lang", "alpha_ratio")
        .filter(F.col("alpha_ratio").isNotNull())
    )
    w = Window.partitionBy("lang").orderBy(
        "alpha_ratio", F.asc_nulls_last("doc_id")
    )
    return (
        q.withColumn("quality_pct", F.percent_rank().over(w))
        .filter(F.col("quality_pct") >= 0.2)
        .withColumn("quality_pct", F.round("quality_pct", 6))
    )


@register(
    "sample_weighted_es",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, n_chars,
               ROUND(ln(({md5_bucket_sql("CAST(doc_id AS VARCHAR)", salt="es:")}
                          + 0.5) / 10000.0)
                     / CAST(n_chars AS DOUBLE), 9) AS es_score
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, es_score
    FROM scored
    QUALIFY row_number() OVER (ORDER BY es_score DESC, doc_id) <= 100
    """,
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted 100-doc sample via deterministic Efraimidis-
    Spirakis: longer documents are proportionally likelier, yet the
    draw is pure hash math — reproducible across runs, partitionings,
    and engines (oracle recomputes the identical scores), monotone
    under reruns, no RNG seed plumbing. The top-k is per-partition
    heaps, not a global sort.
    """
    from masd_spark.operators.sampling import weighted_topk_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = weighted_topk_sample(
        docs, "doc_id", F.col("n_chars"), k=100, salt="es:"
    )
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("_es_score").alias("es_score"),
    )
