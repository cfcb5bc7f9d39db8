"""Warehouse-maintenance queries: CDC history (SCD2), fuzzy entity
resolution, and bloom-filtered joins.

The reference engine upserts only the latest document per key
(consumer.py:194-201 in omartrj/MASD — last-write-wins per station);
these queries cover what a warehouse built on the same feeds needs next:
keyed history tables (SCD2), dirty-key conformance against a dimension
(fuzzy join), and shuffle-avoiding semi-joins (bloom pre-filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.operators.bloom import bloom_semi_join
from masd_spark.operators.cdc import scd2_intervals
from masd_spark.queries import register, scratch_path
from masd_spark.sources.tables import load_table


def _dec_sum(col: str):
    """Order-independent double sum via DECIMAL(18,6) (parity recipe)."""
    return F.sum(F.col(col).cast("decimal(18,6)")).cast("double")


# --------------------------------------------------------------------------
# SCD2: per-customer order-priority history
# --------------------------------------------------------------------------

@register(
    "scd2_customer_priority",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, o_orderpriority,
               epoch_ms(o_orderdate) AS od_ms, o_orderkey,
               lag(o_orderpriority) OVER w AS prev,
               row_number() OVER w AS rn
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY epoch_ms(o_orderdate), o_orderkey)
    ),
    starts AS (
        SELECT o_custkey, o_orderpriority, od_ms, o_orderkey
        FROM ordered
        WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority
    ),
    iv AS (
        SELECT o_custkey, o_orderpriority, od_ms,
               row_number() OVER w2 AS version,
               lead(od_ms) OVER w2 AS valid_to_ms
        FROM starts
        WINDOW w2 AS (PARTITION BY o_custkey ORDER BY od_ms, o_orderkey)
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           CAST(version AS BIGINT) AS version,
           od_ms AS valid_from_ms, valid_to_ms,
           (valid_to_ms IS NULL) AS is_current
    FROM iv
    """,
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order priority: the append-only
    orders log collapses into validity intervals (a new version only when
    the priority actually changes). One shuffle on custkey, two window
    passes over the same partitioning — the lag/lead exchanges are
    reused, so the whole history build costs a single shuffle of the
    change log at any scale. (History complement to the reference's
    last-write-wins upsert, consumer.py:194-201.)
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.unix_millis("o_orderdate").alias("od_ms"),
        "o_orderkey",
    )
    out = scd2_intervals(
        orders,
        keys=["custkey"],
        order_by=["od_ms", "o_orderkey"],
        tracked="priority",
    )
    return out.select(
        "custkey",
        "priority",
        F.col("version").cast("long").alias("version"),
        F.col("valid_from").alias("valid_from_ms"),
        F.col("valid_to").alias("valid_to_ms"),
        "is_current",
    )


# --------------------------------------------------------------------------
# Fuzzy entity resolution: dirty nation names -> nation dimension
# --------------------------------------------------------------------------

# Deterministic per-customer corruption of the nation name (pure SQL so
# the oracle reproduces it bit-for-bit): three corruption modes keyed by
# custkey mod 3 — vowel loss, head truncation, noise suffix.
_DIRTY_SQL = (
    "CASE c_custkey % 3 "
    "WHEN 0 THEN translate(n_name, 'AEI', '') "
    "WHEN 1 THEN substr(n_name, 2) "
    "ELSE n_name || '-' || CAST(c_custkey % 10 AS {int_str}) END"
)


@register(
    "fuzzy_join_nations",
    oracle=f"""
    WITH dirty AS (
        SELECT * FROM (
            SELECT c_custkey,
                   {_DIRTY_SQL.format(int_str="VARCHAR")} AS dirty_name
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ) WHERE c_custkey IS NOT NULL AND dirty_name IS NOT NULL
    ),
    scored AS (
        SELECT d.c_custkey, d.dirty_name, m.n_name AS matched_nation,
               CAST(levenshtein(d.dirty_name, m.n_name) AS BIGINT) AS dist
        FROM dirty d CROSS JOIN nation m
        WHERE m.n_name IS NOT NULL
    )
    SELECT c_custkey, dirty_name, matched_nation, dist
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY c_custkey
                               ORDER BY dist, matched_nation) = 1
    """,
)
def fuzzy_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: each customer's deterministically
    corrupted nation name is resolved back to the 25-row nation
    dimension by minimum edit distance (ties broken alphabetically).
    The dimension is broadcast, so the probe side streams map-side with
    no shuffle — at 100 TB this is a linear scan; cost is
    |probe| x |dim| levenshtein evals, bounded by the small dim, all
    JVM-side (built-in levenshtein, no Python). The argmin is
    min(struct(dist, name)) — a partial+final aggregate, so the shuffle
    carries one candidate per probe key per map task (a row_number
    window would shuffle and sort EVERY scored candidate).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dirty = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            F.expr(_DIRTY_SQL.format(int_str="STRING")).alias("dirty_name"),
        )
        # null contract: a probe without an identity or a name cannot be
        # resolved; a null dimension name cannot be a candidate (its null
        # levenshtein distance would win Spark's struct-min — nulls sort
        # FIRST in struct comparison — while ORDER BY dist puts it last
        # in SQL engines)
        .filter(F.col("c_custkey").isNotNull() & F.col("dirty_name").isNotNull())
    )
    matches = nation.select(F.col("n_name").alias("matched_nation")).filter(
        F.col("matched_nation").isNotNull()
    )
    scored = dirty.join(F.broadcast(matches)).select(
        "c_custkey",
        "dirty_name",
        "matched_nation",
        F.levenshtein("dirty_name", "matched_nation").cast("long").alias("dist"),
    )
    best = scored.groupBy("c_custkey", "dirty_name").agg(
        F.min(F.struct("dist", "matched_nation")).alias("_best")
    )
    return best.select(
        "c_custkey",
        "dirty_name",
        F.col("_best.matched_nation").alias("matched_nation"),
        F.col("_best.dist").alias("dist"),
    )


# --------------------------------------------------------------------------
# Bloom-filtered semi-join: urgent-order line items
# --------------------------------------------------------------------------

@register(
    "bloom_semi_join_lineitem",
    oracle="""
    SELECT l_returnflag, count(*) AS n_items,
           CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def bloom_semi_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line items of urgent orders via a Bloom-pre-filtered semi-join.

    Models the non-broadcastable-dimension case (dim carries a
    shuffle_hash hint standing in for "too big to broadcast"): without
    the bloom stage the semi-join shuffles ALL of lineitem; with it, the
    broadcast bitset (8 KB here, size-independent of dim row count)
    drops ~80% of fact rows inside the scan stage, before the exchange.
    False positives are removed by the exact join — the result is
    bit-identical to the plain semi-join (the oracle). Plan shape
    asserted in tests/test_warehouse.py.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .hint("shuffle_hash")
    )
    joined = bloom_semi_join(
        lineitem, urgent, "l_orderkey", "o_orderkey", n_bits=1 << 16, n_hashes=3
    )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        _dec_sum("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Data layout: range-sorted parquet -> row-group pruning
# --------------------------------------------------------------------------

@register(
    "layout_range_pruned_scan",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 100000
    GROUP BY o_orderstatus
    """,
)
def layout_range_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the range-sorted layout: orders are rewritten
    range-clustered + sorted on o_totalprice, then a price-band query
    runs against the clustered copy. The answer is layout-independent
    (== the oracle on the original table); what the layout buys is that
    the BETWEEN filter prunes files and row groups whose min/max stats
    miss the band — footer-level invariants asserted in
    tests/test_layout.py. The rewrite itself is one range shuffle.
    """
    import hashlib
    import tempfile
    from pathlib import Path

    from masd_spark.sources.layout import write_range_sorted

    orders = load_table(spark, sf_dir, "orders")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = scratch_path(f"masd_layout_{tag}")
    write_range_sorted(orders, path, "o_totalprice", n_files=8)
    clustered = spark.read.parquet(path)
    return (
        clustered.filter(F.col("o_totalprice").between(50000, 100000))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "layout_zorder_pruned_scan",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 300
      AND o_totalprice BETWEEN 50000 AND 150000
    GROUP BY o_orderpriority
    """,
)
def layout_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column band query against a z-ordered rewrite of orders.
    The Morton layout keeps row-group min/max windows narrow on BOTH
    o_custkey and o_totalprice, so either band prunes row groups — a
    lexicographic sort only serves its leading column
    (tests/test_layout.py measures both layouts' footer windows).
    Result is layout-independent (== oracle on the original table).
    """
    import hashlib
    import tempfile
    from pathlib import Path

    from masd_spark.sources.layout import write_zordered

    orders = load_table(spark, sf_dir, "orders")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = scratch_path(f"masd_zorder_{tag}")
    write_zordered(orders, path, "o_custkey", "o_totalprice", n_files=8)
    z = spark.read.parquet(path)
    return (
        z.filter(
            F.col("o_custkey").between(100, 300)
            & F.col("o_totalprice").between(50000, 150000)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum("o_totalprice").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Data-quality audit: the "expectations" layer
# --------------------------------------------------------------------------

@register(
    "dq_audit_core",
    oracle="""
    SELECT 'orders_fk_customer' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'customer_pk_unique',
           CAST((SELECT count(*) FROM (
                     SELECT c_custkey FROM customer
                     GROUP BY 1 HAVING count(*) > 1))
                AS BIGINT),
           CAST((SELECT count(*) FROM customer) AS BIGINT)
    UNION ALL
    SELECT 'events_user_not_null',
           CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT),
           CAST((SELECT count(*) FROM events) AS BIGINT)
    UNION ALL
    SELECT 'documents_text_nonempty',
           CAST((SELECT count(*) FROM documents
                 WHERE text IS NULL OR length(trim(text)) = 0) AS BIGINT),
           CAST((SELECT count(*) FROM documents) AS BIGINT)
    """,
)
def dq_audit_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over the core tables: referential
    integrity (anti-joins), key uniqueness, null/empty rates — one row
    per check, (violations, checked). Each FK check is a LEFT ANTI hash
    join (at scale: broadcast when the parent's keys fit, else one
    key-shuffle; never a correlated per-row probe); uniqueness is a
    groupBy-HAVING. This is the audit an ingest gate runs before
    promoting a batch — kept as ONE query so the whole suite is a
    single job with shared scan reuse.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def check(name: str, violations: DataFrame, checked: DataFrame) -> DataFrame:
        return (
            violations.agg(F.count("*").alias("n_violations"))
            .crossJoin(checked.agg(F.count("*").alias("n_checked")))
            .select(
                F.lit(name).alias("check_name"), "n_violations", "n_checked"
            )
        )

    fk_orders = orders.join(
        customer.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    fk_lineitem = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    dup_cust = (
        customer.groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    null_users = events.filter(F.col("user_id").isNull())
    empty_docs = documents.filter(
        F.col("text").isNull() | (F.length(F.trim("text")) == 0)
    )
    return (
        check("orders_fk_customer", fk_orders, orders)
        .unionAll(check("lineitem_fk_orders", fk_lineitem, lineitem))
        .unionAll(check("customer_pk_unique", dup_cust, customer))
        .unionAll(check("events_user_not_null", null_users, events))
        .unionAll(check("documents_text_nonempty", empty_docs, documents))
    )


# --------------------------------------------------------------------------
# MERGE / upsert: base snapshot + change feed -> reconciled snapshot
# --------------------------------------------------------------------------

_MERGE_CUTOFF = "2000-01-01"


@register(
    "merge_upsert_latest_order",
    oracle=f"""
    WITH ranked AS (
        SELECT o_custkey AS custkey, o_orderkey AS last_orderkey,
               o_orderstatus AS last_status, o_totalprice AS last_total,
               epoch_ms(o_orderdate) AS last_od_ms,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY epoch_ms(o_orderdate) DESC,
                                           o_orderkey DESC) AS rn
        FROM orders
        -- upsert versioning needs non-null version columns: a null
        -- (date, orderkey) row has no defined recency, and two of them
        -- tie nondeterministically
        WHERE o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
    )
    SELECT custkey, last_orderkey, last_status, last_total, last_od_ms
    FROM ranked WHERE rn = 1
    """,
)
def merge_upsert_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert: a per-customer latest-order snapshot built before the
    cutoff is reconciled with the raw post-cutoff order feed via
    ``merge_upsert`` — matched keys take the newest update, unmatched
    update keys insert, untouched base keys survive. Because updates are
    strictly newer than the base here, the merged snapshot must equal the
    latest-order argmax over the WHOLE table, which is the oracle: the
    merge path and the direct path are two independent computations of the
    same result. (Set semantics of the reference's per-station
    replace_one(upsert=True) sink, consumer.py:194-201, as one shuffle.)
    """
    from masd_spark.operators.merge import merge_upsert

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderstatus").alias("last_status"),
            F.col("o_totalprice").alias("last_total"),
            F.unix_millis("o_orderdate").alias("last_od_ms"),
        )
        # version columns must be non-null (see oracle note)
        .filter(
            F.col("last_od_ms").isNotNull() & F.col("last_orderkey").isNotNull()
        )
    )
    cutoff_ms = F.unix_millis(F.lit(_MERGE_CUTOFF).cast("timestamp"))
    w = Window.partitionBy("custkey").orderBy(
        F.col("last_od_ms").desc(), F.col("last_orderkey").desc()
    )
    base = (
        orders.filter(F.col("last_od_ms") < cutoff_ms)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    updates = orders.filter(F.col("last_od_ms") >= cutoff_ms)
    return merge_upsert(
        base, updates, keys=["custkey"], version_cols=["last_od_ms", "last_orderkey"]
    )


# --------------------------------------------------------------------------
# Point-in-time lookup against the SCD2 history (feature-store semantics)
# --------------------------------------------------------------------------

@register(
    "pit_scd2_priority_at_ship",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, o_orderpriority,
               epoch_ms(o_orderdate) AS od_ms, o_orderkey,
               lag(o_orderpriority) OVER w AS prev,
               row_number() OVER w AS rn
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY epoch_ms(o_orderdate), o_orderkey)
    ),
    starts AS (
        SELECT o_custkey AS custkey, o_orderpriority AS priority, od_ms,
               o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY od_ms, o_orderkey) AS version
        FROM ordered
        WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority
    ),
    -- Two same-day orders can open two versions at one valid_from; the
    -- later version (max o_orderkey => max version) supersedes instantly,
    -- so keep exactly it — otherwise both ASOF sides tie-break at random.
    dstarts AS (
        SELECT custkey, priority, od_ms, version
        FROM (SELECT s.*, row_number() OVER (PARTITION BY custkey, od_ms
                                             ORDER BY version DESC) AS dd
              FROM starts s)
        WHERE dd = 1
    ),
    probe AS (
        SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS custkey,
               epoch_ms(l.l_shipdate) AS ship_ms
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        -- asof_join's invalid-input contract (null key / null time rows
        -- are excluded; DuckDB ASOF would treat null ship time as +inf)
        WHERE o.o_custkey IS NOT NULL AND l.l_shipdate IS NOT NULL
    )
    SELECT p.l_orderkey, p.l_linenumber, p.custkey, p.ship_ms,
           h.priority AS priority_at_ship,
           CAST(h.version AS BIGINT) AS version_at_ship
    FROM probe p
    ASOF LEFT JOIN dstarts h
        ON p.custkey = h.custkey AND p.ship_ms >= h.od_ms
    """,
)
def pit_scd2_priority_at_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) lookup: each lineitem is enriched
    with the ordering customer's priority VALID AT ship time, read from
    the SCD2 history that ``scd2_intervals`` builds out of the order log.
    The interval lookup runs as an as-of join against the version START
    rows (valid_from <= t < next valid_from is exactly as-of semantics) —
    the union+carry-forward composition, ONE shuffle on custkey, no
    per-row interval scan. Probes that ship before the customer's first
    recorded state (the fixture's ship dates are independent of order
    dates) get NULL — left as-of semantics on both sides. Oracle: DuckDB's
    native ASOF LEFT JOIN over an independently-built history.
    """
    from masd_spark.operators.relational import asof_join

    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.unix_millis("o_orderdate").alias("od_ms"),
        "o_orderkey",
    )
    hist = scd2_intervals(
        changes, keys=["custkey"], order_by=["od_ms", "o_orderkey"], tracked="priority"
    ).select("custkey", "priority", F.col("version").cast("long").alias("version"), "valid_from")
    # Same-day order pairs open two versions with one valid_from; as-of
    # carry-forward over duplicate (key, time) right rows is partition-order
    # nondeterministic (see asof_join's precondition), so collapse to the
    # superseding (max-version) start per (custkey, valid_from) — mirrored
    # by the oracle's dstarts dedup.
    wd = Window.partitionBy("custkey", "valid_from").orderBy(F.col("version").desc())
    hist = (
        hist.withColumn("_dd", F.row_number().over(wd))
        .filter(F.col("_dd") == 1)
        .drop("_dd")
    )
    probe = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", F.unix_millis("l_shipdate").alias("ship_ms"))
        .join(
            orders.select("o_orderkey", F.col("o_custkey").alias("custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_linenumber", "custkey", "ship_ms")
    )
    out = asof_join(
        probe,
        hist.select("custkey", F.col("valid_from").alias("vf"), "priority", "version"),
        key_col="custkey",
        left_time="ship_ms",
        right_time="vf",
        value_cols=["priority", "version"],
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "custkey",
        "ship_ms",
        F.col("asof_priority").alias("priority_at_ship"),
        F.col("asof_version").alias("version_at_ship"),
    )


# --------------------------------------------------------------------------
# CDC snapshot diff: two snapshot versions -> insert/update/delete rows
# --------------------------------------------------------------------------

@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH ranked AS (
        SELECT o_custkey AS custkey, o_orderkey, o_orderstatus, o_totalprice,
               epoch_ms(o_orderdate) AS od_ms,
               epoch_ms(o_orderdate) < epoch_ms(TIMESTAMP '{_MERGE_CUTOFF}')
                   AS is_old,
               row_number() OVER (
                   PARTITION BY o_custkey,
                       epoch_ms(o_orderdate) < epoch_ms(TIMESTAMP '{_MERGE_CUTOFF}')
                   ORDER BY epoch_ms(o_orderdate) DESC, o_orderkey DESC) AS rn
        FROM orders
    ),
    old AS (SELECT custkey, o_orderkey, o_orderstatus, o_totalprice
            FROM ranked WHERE is_old AND rn = 1),
    new AS (SELECT custkey, o_orderkey, o_orderstatus, o_totalprice
            FROM ranked WHERE NOT is_old AND rn = 1)
    SELECT coalesce(o.custkey, n.custkey) AS custkey,
           CASE WHEN o.custkey IS NULL THEN 'insert'
                WHEN n.custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_orderkey AS old_orderkey, n.o_orderkey AS new_orderkey,
           o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
           o.o_totalprice AS old_total, n.o_totalprice AS new_total
    FROM old o FULL OUTER JOIN new n ON o.custkey = n.custkey
    WHERE o.custkey IS NULL OR n.custkey IS NULL
       OR o.o_orderkey IS DISTINCT FROM n.o_orderkey
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed generation by snapshot diff: two per-customer
    latest-order snapshots (pre- and post-cutoff) full-outer-join on the
    key, and each key classifies as insert (new only), delete (old only)
    or update (both, any column null-safely different); unchanged rows
    are dropped. ONE shuffle on the key for the diff — both snapshot
    builds and the join share the custkey hash partitioning, so Spark
    plans a single exchange per input. Column-wise null-safe comparison,
    not row hashing: hashes don't survive cross-engine parity and hide
    WHICH column moved. This is how a lakehouse derives a change feed
    from table versions when the format doesn't record one.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.unix_millis("o_orderdate").alias("od_ms"),
    )
    cutoff_ms = F.unix_millis(F.lit(_MERGE_CUTOFF).cast("timestamp"))
    w = Window.partitionBy("custkey", "_is_old").orderBy(
        F.col("od_ms").desc(), F.col("o_orderkey").desc()
    )
    ranked = (
        orders.withColumn("_is_old", F.col("od_ms") < cutoff_ms)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    old = ranked.filter(F.col("_is_old")).select(
        "custkey",
        F.col("o_orderkey").alias("old_orderkey"),
        F.col("o_orderstatus").alias("old_status"),
        F.col("o_totalprice").alias("old_total"),
    )
    new = ranked.filter(~F.col("_is_old")).select(
        F.col("custkey").alias("n_custkey"),
        F.col("o_orderkey").alias("new_orderkey"),
        F.col("o_orderstatus").alias("new_status"),
        F.col("o_totalprice").alias("new_total"),
    )
    j = old.join(new, old.custkey == new.n_custkey, "full_outer")
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("custkey").isNull(), F.lit("insert"))
            .when(F.col("n_custkey").isNull(), F.lit("delete"))
            .otherwise(F.lit("update")),
        )
        .filter(
            F.col("custkey").isNull()
            | F.col("n_custkey").isNull()
            | ~F.col("old_orderkey").eqNullSafe(F.col("new_orderkey"))
            | ~F.col("old_status").eqNullSafe(F.col("new_status"))
            | ~F.col("old_total").eqNullSafe(F.col("new_total"))
        )
        .select(
            F.coalesce("custkey", "n_custkey").alias("custkey"),
            "change_type",
            "old_orderkey",
            "new_orderkey",
            "old_status",
            "new_status",
            "old_total",
            "new_total",
        )
    )


# --------------------------------------------------------------------------
# Incremental view maintenance: merge partial aggregates with a delta
# --------------------------------------------------------------------------

@register(
    "ivm_monthly_revenue_merge",
    oracle="""
    SELECT epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
           o_orderstatus,
           ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders,
           max(o_totalprice) AS max_price
    FROM orders
    -- the incremental split is keyed on o_orderdate: a null-dated row
    -- belongs to neither history nor any delta
    WHERE o_orderdate IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ivm_monthly_revenue_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a materialized monthly-revenue
    aggregate built from pre-cutoff data is REFRESHED by merging the
    post-cutoff delta's partial aggregates — never rescanning history.
    Works because every measure is algebraic (sum+sum, count+count,
    max+max); the merge is a groupBy over the union of two partial-agg
    frames, each tiny compared to raw data. The oracle recomputes the
    view from ALL raw orders in one pass: the incremental path must be
    indistinguishable from the full rebuild. Decimal sums make the
    revenue independent of which partial each row landed in.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.unix_millis(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "month_ms"
            ),
            "o_orderstatus",
            "o_totalprice",
            F.unix_millis("o_orderdate").alias("od_ms"),
        )
        # null-dated rows fall outside every cutoff split (see oracle)
        .filter(F.col("od_ms").isNotNull())
    )
    cutoff_ms = F.unix_millis(F.lit(_MERGE_CUTOFF).cast("timestamp"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("month_ms", "o_orderstatus").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("_sum"),
            F.count("*").alias("_cnt"),
            F.max("o_totalprice").alias("_max"),
        )

    hist = partial(orders.filter(F.col("od_ms") < cutoff_ms))
    delta = partial(orders.filter(F.col("od_ms") >= cutoff_ms))
    merged = (
        hist.unionByName(delta)
        .groupBy("month_ms", "o_orderstatus")
        .agg(
            F.round(F.sum("_sum").cast("double"), 6).alias("revenue"),
            F.sum("_cnt").alias("n_orders"),
            F.max("_max").alias("max_price"),
        )
    )
    return merged


# --------------------------------------------------------------------------
# Retention policy: keep the newest N versions per key
# --------------------------------------------------------------------------

_KEEP_N = 3


@register(
    "warehouse_retention_keep_n",
    oracle=f"""
    WITH ranked AS (
        SELECT o_custkey AS custkey, o_orderkey,
               epoch_ms(o_orderdate) AS od_ms,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY epoch_ms(o_orderdate) DESC,
                                           o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT custkey, o_orderkey, od_ms,
           CAST(rn AS BIGINT) AS version_rank,
           rn > {_KEEP_N} AS is_expired
    FROM ranked
    """,
)
def warehouse_retention_keep_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-retention policy: rank each customer's orders newest-first
    and flag everything past the newest {N} as expired — the keep/delete
    manifest a retention job feeds to a table format's DELETE. One window
    over one key shuffle; emitting a FLAG rather than filtering keeps the
    query a pure function the delete executor (or an audit) can consume
    either way. Ties break on the order key, so the manifest is stable
    across runs — a retention job that flags different rows on rerun
    would corrupt time travel.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("custkey").orderBy(
        F.col("od_ms").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("od_ms"),
        )
        .withColumn("version_rank", F.row_number().over(w).cast("long"))
        .withColumn("is_expired", F.col("version_rank") > _KEEP_N)
    )


# --------------------------------------------------------------------------
# Date dimension generation
# --------------------------------------------------------------------------

@register(
    "dim_date_generate",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS lo,
               CAST(max(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    d AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS dt
        FROM bounds
    )
    SELECT CAST(epoch_ms(CAST(dt AS TIMESTAMP)) AS BIGINT) AS date_ms,
           CAST(year(dt) AS BIGINT) AS year,
           CAST(month(dt) AS BIGINT) AS month,
           CAST(day(dt) AS BIGINT) AS day_of_month,
           CAST(isodow(dt) AS BIGINT) AS iso_dow,
           isodow(dt) >= 6 AS is_weekend,
           CAST(quarter(dt) AS BIGINT) AS quarter
    FROM d
    """,
)
def dim_date_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension builder: one row per calendar day spanning the
    fact table's date range, with the standard attributes (ISO weekday,
    weekend flag, quarter). The span comes from a 2-value aggregate and
    the rows from ONE ``sequence`` explode — never a driver loop or a
    cross join; at any history length this is bounded by days, not facts.
    Downstream star joins then broadcast this dimension. ISO weekday
    (Mon=1) is computed portably from the epoch-day modulus on the Spark
    side to dodge engine dayofweek conventions.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    d = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("dt")
    )
    # 1970-01-01 is a Thursday: epoch_day mod 7 == 0 -> Thu(4) in ISO.
    epoch_day = F.unix_date(F.col("dt"))
    iso_dow = ((epoch_day + F.lit(3)) % 7 + F.lit(1)).cast("long")
    return d.select(
        (F.unix_date(F.col("dt")).cast("long") * 86_400_000).alias("date_ms"),
        F.year("dt").cast("long").alias("year"),
        F.month("dt").cast("long").alias("month"),
        F.dayofmonth("dt").cast("long").alias("day_of_month"),
        iso_dow.alias("iso_dow"),
        (iso_dow >= 6).alias("is_weekend"),
        F.quarter("dt").cast("long").alias("quarter"),
    )


@register(
    "dq_quarantine_readings",
    oracle="""
    WITH readings AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 20 = 0 THEN '<<bad_data>>'
                    ELSE CAST(value AS VARCHAR) END AS value_str
        FROM events
    ),
    judged AS (
        SELECT event_id, event_type,
               TRY_CAST(value_str AS DOUBLE) AS v
        FROM readings
    )
    SELECT event_id,
           CASE WHEN v IS NULL THEN 'unparseable_value'
                WHEN v > 150.0 THEN 'value_out_of_range'
                WHEN event_type NOT IN
                     ('click','view','purchase','signup','error')
                     THEN 'unknown_event_type'
           END AS failed_rule,
           CASE WHEN v IS NULL OR v > 150.0 OR event_type NOT IN
                     ('click','view','purchase','signup','error')
                THEN 'quarantine' ELSE 'pass' END AS verdict
    FROM judged
    """,
)
def dq_quarantine_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level data-quality disposition — the quarantine SPLIT that
    complements ``dq_audit_core``'s aggregate violation counts: every
    row gets a verdict and its FIRST failed rule (precedence: parse >
    range > enum), so an ingest pipeline can route quarantined rows with
    their reason while clean rows flow on. All three rules are map-side
    column math over one scan — no shuffle, no second pass; at 100 TB
    the split is a partitioned write by verdict. Uses the shared
    deterministic malformation derivation (event_id % 20) so violations
    are real (~5% parse, ~5% range) and the oracle replays them exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    value_str = F.when(
        F.col("event_id") % 20 == 0, F.lit("<<bad_data>>")
    ).otherwise(F.col("value").cast("string"))
    v = value_str.try_cast("double")
    known = F.col("event_type").isin(
        "click", "view", "purchase", "signup", "error"
    )
    failed = (
        F.when(v.isNull(), F.lit("unparseable_value"))
        .when(v > 150.0, F.lit("value_out_of_range"))
        .when(~known, F.lit("unknown_event_type"))
    )
    return ev.select(
        "event_id",
        failed.alias("failed_rule"),
        F.when(failed.isNotNull(), F.lit("quarantine"))
        .otherwise(F.lit("pass"))
        .alias("verdict"),
    )
