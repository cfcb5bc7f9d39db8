"""Randomized differential testing: hypothesis-generated relational
queries run through BOTH engines.

The registry's 206 oracled queries are fixed points; this axis samples
the NEIGHBORHOOD around them — random filter/group/aggregate
combinations over lineitem, rendered twice from one AST: once through
the PySpark DataFrame API (the engine surface under test) and once as
DuckDB SQL (the oracle). Any semantic divergence Catalyst introduces
for a predicate/aggregate shape no hand-written query happens to use —
null comparison semantics, ANSI cast edges, aggregate-over-empty-group
behavior, timestamp literal coercion — fails here with the shrunken
counterexample printed by hypothesis.

Exactness rules (the repo's standing parity recipe, applied to the
generator): double columns are quantized to DECIMAL(18,6) BEFORE any
sum, so folds are order/partitioning-independent; only exact
aggregates (count / count-distinct / min / max / decimal-sum /
bigint-sum) are generated; DuckDB's HUGEINT sum is cast back to
BIGINT. Derandomized for a stable suite.
"""

from __future__ import annotations

from dataclasses import dataclass

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from masd_spark.sources.tables import load_table

from tests.oracle import _normalize, duckdb_connection

SF_FUZZ = "/root/testdata/sf0.001"  # 6k-row lineitem: ~0.3s per example


# -- AST ------------------------------------------------------------------


@dataclass(frozen=True)
class Atom:
    col: str
    op: str  # <, <=, >, >=, =, <>
    lit: object  # int, str, or ISO date string for timestamps
    negate: bool


@dataclass(frozen=True)
class Query:
    atoms: tuple[Atom, ...]
    conj: str  # AND / OR
    group: tuple[str, ...]
    aggs: tuple[tuple[str, str], ...]  # (kind, col)


_NUM_ATOM_COLS = ["l_quantity", "l_linenumber", "l_discount"]
_STR_ATOMS = [("l_returnflag", ["A", "N", "R"]), ("l_linestatus", ["O", "F"])]
_GROUPS = [
    (),
    ("l_returnflag",),
    ("l_linestatus",),
    ("l_linenumber",),
    ("l_returnflag", "l_linestatus"),
]
_DEC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
_MINMAX_COLS = _DEC_COLS + _INT_COLS + ["l_returnflag", "l_shipdate"]


def _atoms() -> st.SearchStrategy[Atom]:
    num = st.builds(
        Atom,
        col=st.sampled_from(_NUM_ATOM_COLS),
        op=st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]),
        lit=st.integers(min_value=0, max_value=50),
        negate=st.booleans(),
    )
    txt = st.one_of(
        *(
            st.builds(
                Atom,
                col=st.just(c),
                op=st.sampled_from(["=", "<>"]),
                lit=st.sampled_from(vals),
                negate=st.booleans(),
            )
            for c, vals in _STR_ATOMS
        )
    )
    ts = st.builds(
        Atom,
        col=st.just("l_shipdate"),
        op=st.sampled_from(["<", ">="]),
        lit=st.dates(
            min_value=__import__("datetime").date(1992, 1, 1),
            max_value=__import__("datetime").date(1998, 12, 31),
        ).map(lambda d: d.isoformat()),
        negate=st.just(False),
    )
    return st.one_of(num, txt, ts)


def _queries() -> st.SearchStrategy[Query]:
    aggs = st.lists(
        st.one_of(
            st.tuples(st.just("count"), st.just("*")),
            st.tuples(st.just("count"), st.sampled_from(_INT_COLS)),
            st.tuples(st.just("count_distinct"), st.sampled_from(_INT_COLS + ["l_returnflag"])),
            st.tuples(st.just("min"), st.sampled_from(_MINMAX_COLS)),
            st.tuples(st.just("max"), st.sampled_from(_MINMAX_COLS)),
            st.tuples(st.just("sum_int"), st.sampled_from(_INT_COLS)),
            st.tuples(st.just("sum_dec"), st.sampled_from(_DEC_COLS)),
        ),
        min_size=1,
        max_size=3,
    ).map(tuple)
    return st.builds(
        Query,
        atoms=st.lists(_atoms(), min_size=0, max_size=3).map(tuple),
        conj=st.sampled_from(["AND", "OR"]),
        group=st.sampled_from(_GROUPS),
        aggs=aggs,
    )


# -- render: DuckDB SQL ---------------------------------------------------


def _atom_sql(a: Atom) -> str:
    if a.col == "l_shipdate":
        cmp_ = f"{a.col} {a.op} TIMESTAMP '{a.lit} 00:00:00'"
    elif isinstance(a.lit, str):
        cmp_ = f"{a.col} {a.op} '{a.lit}'"
    else:
        cmp_ = f"{a.col} {a.op} {a.lit}"
    return f"NOT ({cmp_})" if a.negate else f"({cmp_})"


def _agg_sql(kind: str, col: str, alias: str) -> str:
    if kind == "count" and col == "*":
        return f"CAST(count(*) AS BIGINT) AS {alias}"
    if kind == "count":
        return f"CAST(count({col}) AS BIGINT) AS {alias}"
    if kind == "count_distinct":
        return f"CAST(count(DISTINCT {col}) AS BIGINT) AS {alias}"
    if kind in ("min", "max"):
        return f"{kind}({col}) AS {alias}"
    if kind == "sum_int":
        return f"CAST(sum({col}) AS BIGINT) AS {alias}"
    if kind == "sum_dec":
        return f"sum(CAST({col} AS DECIMAL(18,6))) AS {alias}"
    raise AssertionError(kind)


def to_sql(q: Query) -> str:
    sel = list(q.group) + [
        _agg_sql(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM lineitem"
    if q.atoms:
        sql += " WHERE " + f" {q.conj} ".join(_atom_sql(a) for a in q.atoms)
    if q.group:
        sql += " GROUP BY " + ", ".join(q.group)
    return sql


# -- render: DataFrame API ------------------------------------------------


def _atom_col(a: Atom):
    c = F.col(a.col)
    lit = F.lit(a.lit).cast("timestamp") if a.col == "l_shipdate" else F.lit(a.lit)
    ops = {
        "<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
        "=": c == lit, "<>": c != lit,
    }
    e = ops[a.op]
    return ~e if a.negate else e


def _agg_col(kind: str, col: str, alias: str):
    if kind == "count" and col == "*":
        return F.count(F.lit(1)).alias(alias)
    if kind == "count":
        return F.count(col).alias(alias)
    if kind == "count_distinct":
        return F.countDistinct(col).alias(alias)
    if kind in ("min", "max"):
        return getattr(F, kind)(col).alias(alias)
    if kind == "sum_int":
        return F.sum(col).alias(alias)
    if kind == "sum_dec":
        return F.sum(F.col(col).cast("decimal(18,6)")).alias(alias)
    raise AssertionError(kind)


def to_df(spark, q: Query):
    df = load_table(spark, SF_FUZZ, "lineitem")
    if q.atoms:
        pred = _atom_col(q.atoms[0])
        for a in q.atoms[1:]:
            pred = (pred & _atom_col(a)) if q.conj == "AND" else (pred | _atom_col(a))
        df = df.filter(pred)
    aggs = [_agg_col(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)]
    if q.group:
        return df.groupBy(*q.group).agg(*aggs)
    return df.agg(*aggs)


# -- the property ---------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_con():
    con = duckdb_connection(SF_FUZZ)
    yield con
    con.close()


@settings(
    max_examples=35,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_queries())
def test_random_relational_query_matches_duckdb(spark, fuzz_con, q):
    sdf = to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- join property --------------------------------------------------------
#
# Same idea one shape up: lineitem JOIN orders with a random join type,
# per-side filters, and exact aggregates. Exercises null-extension
# semantics (left/full outer), join-key null handling, and aggregate
# behavior over the extended side — the shapes where engines genuinely
# disagree by default.

_JOIN_TYPES = ["inner", "left", "right", "full"]
_O_STATUS = ["O", "F", "P"]


@dataclass(frozen=True)
class JoinQuery:
    join_type: str
    li_atom: Atom | None
    o_status: str | None  # filter orders on o_orderstatus = X
    group: tuple[str, ...]  # subset of (l_returnflag, o_orderpriority)
    aggs: tuple[tuple[str, str], ...]


_JOIN_GROUPS = [
    (),
    ("l_returnflag",),
    ("o_orderpriority",),
    ("l_returnflag", "o_orderpriority"),
]
_JOIN_AGGS = st.lists(
    st.one_of(
        st.tuples(st.just("count"), st.just("*")),
        st.tuples(st.just("count"), st.sampled_from(["l_orderkey", "o_custkey"])),
        st.tuples(st.just("count_distinct"), st.sampled_from(["l_orderkey", "o_custkey"])),
        st.tuples(st.just("min"), st.sampled_from(["l_quantity", "o_totalprice", "o_orderdate"])),
        st.tuples(st.just("max"), st.sampled_from(["l_quantity", "o_totalprice", "o_orderdate"])),
        st.tuples(st.just("sum_int"), st.sampled_from(["l_suppkey", "o_custkey"])),
        st.tuples(st.just("sum_dec"), st.sampled_from(["l_extendedprice", "o_totalprice"])),
    ),
    min_size=1,
    max_size=3,
).map(tuple)


def _join_queries() -> st.SearchStrategy[JoinQuery]:
    return st.builds(
        JoinQuery,
        join_type=st.sampled_from(_JOIN_TYPES),
        li_atom=st.one_of(st.none(), _atoms()),
        o_status=st.one_of(st.none(), st.sampled_from(_O_STATUS)),
        group=st.sampled_from(_JOIN_GROUPS),
        aggs=_JOIN_AGGS,
    )


_JT_SQL = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN", "full": "FULL JOIN"}


def join_to_sql(q: JoinQuery) -> str:
    li = "SELECT * FROM lineitem"
    if q.li_atom:
        li += " WHERE " + _atom_sql(q.li_atom)
    od = "SELECT * FROM orders"
    if q.o_status:
        od += f" WHERE o_orderstatus = '{q.o_status}'"
    sel = list(q.group) + [
        _agg_sql(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)
    ]
    sql = (
        f"SELECT {', '.join(sel)} FROM ({li}) li "
        f"{_JT_SQL[q.join_type]} ({od}) o ON li.l_orderkey = o.o_orderkey"
    )
    if q.group:
        sql += " GROUP BY " + ", ".join(q.group)
    return sql


def join_to_df(spark, q: JoinQuery):
    li = load_table(spark, SF_FUZZ, "lineitem")
    if q.li_atom:
        li = li.filter(_atom_col(q.li_atom))
    od = load_table(spark, SF_FUZZ, "orders")
    if q.o_status:
        od = od.filter(F.col("o_orderstatus") == q.o_status)
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"], q.join_type)
    aggs = [_agg_col(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)]
    if q.group:
        return j.groupBy(*q.group).agg(*aggs)
    return j.agg(*aggs)


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_join_queries())
def test_random_join_query_matches_duckdb(spark, fuzz_con, q):
    sdf = join_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(join_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (join_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {join_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- window-function property ---------------------------------------------
#
# Third shape: analytic windows. Determinism rules: rank/dense_rank are
# tie-stable by definition; row_number / lag / running-sum get a total
# order that ties on EVERY column — the synthetic lineitem has 1161
# duplicate (l_orderkey, l_linenumber) pairs (found by the first soak
# run: two engines legitimately disagreed on lag() under the
# "primary-key" tiebreak), so uniqueness must come from the full row,
# which pins the value sequence up to full-row duplicates (and those
# are output-invariant). Running sums are decimal-quantized ROWS
# frames. Null ordering is pinned to NULLS FIRST on both engines
# (Spark's ASC default; DuckDB defaults NULLS LAST so the SQL says it
# explicitly).

from pyspark.sql import Window as W  # noqa: E402

_SORT_COLS = ["l_quantity", "l_extendedprice", "l_shipdate", "l_returnflag"]
_ALL_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]
_PARTS = [(), ("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
_LAG_VALS = ["l_orderkey", "l_returnflag", "l_quantity"]


@dataclass(frozen=True)
class WinQuery:
    atom: Atom | None
    part: tuple[str, ...]
    fn: str  # rank / dense_rank / row_number / lag / runsum
    sort: str
    val: str  # lag value col or runsum dec col


def _win_queries() -> st.SearchStrategy[WinQuery]:
    return st.builds(
        WinQuery,
        atom=st.one_of(st.none(), _atoms()),
        part=st.sampled_from(_PARTS),
        fn=st.sampled_from(["rank", "dense_rank", "row_number", "lag", "runsum"]),
        sort=st.sampled_from(_SORT_COLS),
        val=st.sampled_from(_LAG_VALS),
    )


def win_to_sql(q: WinQuery) -> str:
    over_part = f"PARTITION BY {', '.join(q.part)} " if q.part else ""
    tiebreak = ", ".join(f"{c} NULLS FIRST" for c in _ALL_COLS)
    uniq = f"ORDER BY {q.sort} NULLS FIRST, {tiebreak}"
    tie_ok = f"ORDER BY {q.sort} NULLS FIRST"
    if q.fn in ("rank", "dense_rank"):
        expr = f"{q.fn}() OVER ({over_part}{tie_ok})"
    elif q.fn == "row_number":
        expr = f"row_number() OVER ({over_part}{uniq})"
    elif q.fn == "lag":
        expr = f"lag({q.val}) OVER ({over_part}{uniq})"
    else:
        dec = q.val if q.val != "l_returnflag" else "l_quantity"
        expr = (
            f"sum(CAST({dec} AS DECIMAL(18,6))) OVER ({over_part}{uniq} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    sql = f"SELECT l_orderkey, l_linenumber, {expr} AS w FROM lineitem"
    if q.atom:
        sql += " WHERE " + _atom_sql(q.atom)
    return sql


def win_to_df(spark, q: WinQuery):
    df = load_table(spark, SF_FUZZ, "lineitem")
    if q.atom:
        df = df.filter(_atom_col(q.atom))
    base = W.partitionBy(*q.part) if q.part else W.partitionBy()
    tie_ok = base.orderBy(F.col(q.sort).asc_nulls_first())
    uniq = base.orderBy(
        F.col(q.sort).asc_nulls_first(),
        *[F.col(c).asc_nulls_first() for c in _ALL_COLS],
    )
    if q.fn in ("rank", "dense_rank"):
        col = getattr(F, q.fn)().over(tie_ok)
    elif q.fn == "row_number":
        col = F.row_number().over(uniq)
    elif q.fn == "lag":
        col = F.lag(q.val).over(uniq)
    else:
        dec = q.val if q.val != "l_returnflag" else "l_quantity"
        col = F.sum(F.col(dec).cast("decimal(18,6)")).over(
            uniq.rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    return df.select("l_orderkey", "l_linenumber", col.alias("w"))


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_win_queries())
def test_random_window_query_matches_duckdb(spark, fuzz_con, q):
    sdf = win_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(win_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (win_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {win_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- scalar string-function property --------------------------------------
#
# Fourth shape: scalar string expressions over documents.text — the
# layer every text operator's oracle twin is written in. Random
# composition inner(trim/lower/upper) -> outer(length/substr/md5/
# replace/reverse), compared value-for-value. Catches 1-based-index,
# empty-string, and null-propagation disagreements between the
# DataFrame functions and the SQL the oracles use.

_INNER_FNS = ["trim", "lower", "upper"]
_OUTER_FNS = ["length", "substr", "md5", "replace", "reverse", "identity"]


@dataclass(frozen=True)
class StrQuery:
    inner: str
    outer: str
    start: int  # substr 1-based start
    n: int  # substr length


def _str_queries() -> st.SearchStrategy[StrQuery]:
    return st.builds(
        StrQuery,
        inner=st.sampled_from(_INNER_FNS),
        outer=st.sampled_from(_OUTER_FNS),
        start=st.integers(min_value=1, max_value=30),
        n=st.integers(min_value=0, max_value=20),
    )


def str_to_sql(q: StrQuery) -> str:
    e = f"{q.inner}(text)"
    if q.outer == "substr":
        e = f"substr({e}, {q.start}, {q.n})"
    elif q.outer == "replace":
        e = f"replace({e}, ' ', '_')"
    elif q.outer != "identity":
        e = f"{q.outer}({e})"
    if q.outer == "length":
        e = f"CAST({e} AS BIGINT)"
    return f"SELECT doc_id, {e} AS w FROM documents"


def str_to_df(spark, q: StrQuery):
    df = load_table(spark, SF_FUZZ, "documents")
    e = getattr(F, q.inner)("text")
    if q.outer == "substr":
        e = F.substring(e, q.start, q.n)
    elif q.outer == "replace":
        e = F.replace(e, F.lit(" "), F.lit("_"))
    elif q.outer == "length":
        e = F.length(e).cast("bigint")
    elif q.outer != "identity":
        e = getattr(F, q.outer)(e)
    return df.select("doc_id", e.alias("w"))


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_str_queries())
def test_random_string_expr_matches_duckdb(spark, fuzz_con, q):
    sdf = str_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(str_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (str_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {str_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- set-operations property ----------------------------------------------
#
# Fifth shape (SURVEY §2.7): two filtered projections of lineitem
# combined with UNION [ALL] / INTERSECT / EXCEPT. Spark's DataFrame
# set ops are ALL-semantics by default (union = UNION ALL,
# intersectAll/exceptAll = multiset forms), where SQL keywords default
# to DISTINCT — exactly the kind of asymmetry the fuzzer should pin,
# so both semantics are sampled and rendered explicitly on each side.

_SETOP_COLS = [
    ("l_returnflag", "l_linestatus"),
    ("l_returnflag", "l_linenumber"),
    ("l_orderkey", "l_linenumber"),
    ("l_linestatus",),
]


@dataclass(frozen=True)
class SetQuery:
    cols: tuple[str, ...]
    op: str  # union_all / union / intersect / intersect_all / except / except_all
    left: Atom | None
    right: Atom | None


def _set_queries() -> st.SearchStrategy[SetQuery]:
    return st.builds(
        SetQuery,
        cols=st.sampled_from(_SETOP_COLS),
        op=st.sampled_from(
            ["union_all", "union", "intersect", "intersect_all", "except", "except_all"]
        ),
        left=st.one_of(st.none(), _atoms()),
        right=st.one_of(st.none(), _atoms()),
    )


_SETOP_SQL = {
    "union_all": "UNION ALL",
    "union": "UNION",
    "intersect": "INTERSECT",
    "intersect_all": "INTERSECT ALL",
    "except": "EXCEPT",
    "except_all": "EXCEPT ALL",
}


def set_to_sql(q: SetQuery) -> str:
    cols = ", ".join(q.cols)
    left = f"SELECT {cols} FROM lineitem"
    if q.left:
        left += " WHERE " + _atom_sql(q.left)
    right = f"SELECT {cols} FROM lineitem"
    if q.right:
        right += " WHERE " + _atom_sql(q.right)
    return f"({left}) {_SETOP_SQL[q.op]} ({right})"


def set_to_df(spark, q: SetQuery):
    base = load_table(spark, SF_FUZZ, "lineitem")
    left = base.filter(_atom_col(q.left)) if q.left else base
    right = base.filter(_atom_col(q.right)) if q.right else base
    left, right = left.select(*q.cols), right.select(*q.cols)
    if q.op == "union_all":
        return left.unionByName(right)
    if q.op == "union":
        return left.unionByName(right).distinct()
    if q.op == "intersect":
        return left.intersect(right)
    if q.op == "intersect_all":
        return left.intersectAll(right)
    if q.op == "except":
        return left.subtract(right)
    return left.exceptAll(right)


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_set_queries())
def test_random_set_op_matches_duckdb(spark, fuzz_con, q):
    sdf = set_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(set_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (set_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {set_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- events time-bucket property ------------------------------------------
#
# Sixth shape: the events table and its timestamp contract. load_table
# normalizes events.ts to "ns since epoch as long" (the parquet has
# shipped as both ns-long and µs-TIMESTAMP); the oracle side reads the
# raw parquet with epoch_ms(). Random epoch-ms bucketing + grouping +
# exact aggregates must agree — any drift in the ts normalization or
# the ms derivation (`ts DIV 1_000_000`) shows up immediately. Both
# renderers apply the engine's measurement-value contract (rows whose
# value is NaN/±Inf are excluded, NULL kept — queries/__init__.py
# finite_values/finite_events), so the shape stays comparable on the
# non-finite-poisoned fixture too.

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_BUCKETS_MS = [60_000, 300_000, 3_600_000, 86_400_000]
_EV_GROUPS = [("bucket_ms",), ("event_type",), ("bucket_ms", "event_type"), ("user_id",)]


@dataclass(frozen=True)
class EventQuery:
    types: tuple[str, ...]  # empty = no type filter
    val_cmp: int | None  # value > N filter
    bucket_ms: int
    group: tuple[str, ...]
    aggs: tuple[tuple[str, str], ...]


_EV_AGGS = st.lists(
    st.one_of(
        st.tuples(st.just("count"), st.just("*")),
        st.tuples(st.just("count"), st.sampled_from(["value", "user_id"])),
        st.tuples(st.just("count_distinct"), st.sampled_from(["user_id", "event_type"])),
        st.tuples(st.just("min"), st.sampled_from(["ts_ms", "value", "user_id"])),
        st.tuples(st.just("max"), st.sampled_from(["ts_ms", "value", "user_id"])),
        st.tuples(st.just("sum_int"), st.sampled_from(["user_id", "event_id"])),
        st.tuples(st.just("sum_dec"), st.just("value")),
    ),
    min_size=1,
    max_size=3,
).map(tuple)


def _event_queries() -> st.SearchStrategy[EventQuery]:
    return st.builds(
        EventQuery,
        types=st.lists(
            st.sampled_from(_EVENT_TYPES), min_size=0, max_size=3, unique=True
        ).map(tuple),
        val_cmp=st.one_of(st.none(), st.integers(min_value=-50, max_value=150)),
        bucket_ms=st.sampled_from(_BUCKETS_MS),
        group=st.sampled_from(_EV_GROUPS),
        aggs=_EV_AGGS,
    )


def _ts_ms_sql() -> str:
    """DuckDB rendering of "events.ts as epoch-ms BIGINT", branched on the
    fixture's physical type exactly like sources/tables.py:load_table —
    epoch_ms(TIMESTAMP) on the µs-TIMESTAMP variant, integer floor-division
    on the ns-long int64 variant (epoch_ms(BIGINT) would return a
    TIMESTAMP there and break the % bucketing arithmetic; ADVICE r7)."""
    from masd_spark.sources.tables import _events_ts_physical

    if _events_ts_physical(f"{SF_FUZZ}/events.parquet") == "int64":
        return "ts // 1000000"
    return "epoch_ms(ts)"


def event_to_sql(q: EventQuery) -> str:
    where = []
    if q.types:
        where.append("event_type IN (" + ", ".join(f"'{t}'" for t in q.types) + ")")
    if q.val_cmp is not None:
        where.append(f"value > {q.val_cmp}")
    sel = list(q.group) + [
        _agg_sql(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)
    ]
    sql = (
        f"WITH e AS (SELECT event_id, {_ts_ms_sql()} AS ts_ms, "
        f"ts_ms - (ts_ms % {q.bucket_ms}) AS bucket_ms, "
        f"user_id, event_type, value FROM events "
        f"WHERE value IS NULL OR isfinite(value)) "
        f"SELECT {', '.join(sel)} FROM e"
    )
    if where:
        sql += " WHERE " + " AND ".join(where)
    if q.group:
        sql += " GROUP BY " + ", ".join(q.group)
    return sql


def event_to_df(spark, q: EventQuery):
    from masd_spark.queries import finite_values

    e = finite_values(load_table(spark, SF_FUZZ, "events")).select(
        "event_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
    )
    e = e.withColumn(
        "bucket_ms", F.col("ts_ms") - F.col("ts_ms") % F.lit(q.bucket_ms)
    )
    if q.types:
        e = e.filter(F.col("event_type").isin(*q.types))
    if q.val_cmp is not None:
        e = e.filter(F.col("value") > q.val_cmp)
    aggs = [_agg_col(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)]
    if q.group:
        return e.groupBy(*q.group).agg(*aggs)
    return e.agg(*aggs)


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_event_queries())
def test_random_event_bucket_query_matches_duckdb(spark, fuzz_con, q):
    sdf = event_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(event_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (event_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {event_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- embeddings/array property --------------------------------------------
#
# Seventh shape: array-column semantics on embeddings — element access
# (both engines 1-based via element_at / list subscript), per-label
# exact aggregates over a random coordinate, under the embedding
# family's valid_vectors invalid-input contract (null id / null vector
# / any NULL-or-non-finite element excluded on BOTH sides), so the
# shape is comparable on the poisoned fixture as well.
#
# FUZZER FINDING (first derandomized run): FLOAT -> DECIMAL casts
# genuinely disagree between the engines — DuckDB rounds from the
# float32's SHORTEST decimal repr (0.2153955 -> 0.215396) while Spark
# rounds from the full binary expansion (0.2153954952... -> 0.215395).
# The parity recipe is therefore: NEVER cast a float32 column straight
# to DECIMAL; widen to DOUBLE first (exact, both engines) so both
# round the same value. Both renderers below do the double hop.

_EMB_DIM = 64


@dataclass(frozen=True)
class EmbQuery:
    idx: int  # 1-based coordinate
    label_eq: int | None
    mod: tuple[int, int] | None  # vec_id % m = r
    group: tuple[str, ...]
    aggs: tuple[str, ...]  # subset of count/min/max/sum_dec/n_labels


def _emb_queries() -> st.SearchStrategy[EmbQuery]:
    return st.builds(
        EmbQuery,
        idx=st.integers(min_value=1, max_value=_EMB_DIM),
        label_eq=st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        mod=st.one_of(
            st.none(),
            st.tuples(
                st.integers(min_value=2, max_value=7),
                st.integers(min_value=0, max_value=1),
            ),
        ),
        group=st.sampled_from([(), ("label",)]),
        aggs=st.lists(
            st.sampled_from(["count", "min", "max", "sum_dec", "n_labels"]),
            min_size=1,
            max_size=3,
            unique=True,
        ).map(tuple),
    )


def _emb_agg_sql(kind: str, idx: int, alias: str) -> str:
    el = f"embedding[{idx}]"
    if kind == "count":
        return f"CAST(count(*) AS BIGINT) AS {alias}"
    if kind in ("min", "max"):
        return f"{kind}({el}) AS {alias}"
    if kind == "sum_dec":
        return f"sum(CAST(CAST({el} AS DOUBLE) AS DECIMAL(18,6))) AS {alias}"
    return f"CAST(count(DISTINCT label) AS BIGINT) AS {alias}"


def emb_to_sql(q: EmbQuery) -> str:
    from masd_spark.queries import valid_embeddings

    where = []
    if q.label_eq is not None:
        where.append(f"label = {q.label_eq}")
    if q.mod:
        m, r = q.mod
        where.append(f"vec_id % {m} = {r}")
    sel = list(q.group) + [
        _emb_agg_sql(k, q.idx, f"a{i}") for i, k in enumerate(q.aggs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM embeddings"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if q.group:
        sql += " GROUP BY " + ", ".join(q.group)
    return valid_embeddings(sql)


def emb_to_df(spark, q: EmbQuery):
    from masd_spark.operators.similarity import valid_vectors

    e = valid_vectors(
        load_table(spark, SF_FUZZ, "embeddings"), "vec_id", "embedding"
    )
    if q.label_eq is not None:
        e = e.filter(F.col("label") == q.label_eq)
    if q.mod:
        m, r = q.mod
        e = e.filter(F.col("vec_id") % m == r)
    el = F.element_at("embedding", q.idx)
    agg_map = {
        "count": F.count(F.lit(1)),
        "min": F.min(el),
        "max": F.max(el),
        "sum_dec": F.sum(el.cast("double").cast("decimal(18,6)")),
        "n_labels": F.countDistinct("label"),
    }
    aggs = [agg_map[k].alias(f"a{i}") for i, k in enumerate(q.aggs)]
    if q.group:
        return e.groupBy(*q.group).agg(*aggs)
    return e.agg(*aggs)


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_emb_queries())
def test_random_embedding_query_matches_duckdb(spark, fuzz_con, q):
    sdf = emb_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(emb_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (emb_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {emb_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )


# -- semi/anti join property ----------------------------------------------
#
# Eighth shape: existence joins. Spark's leftsemi/leftanti implement
# EXISTS / NOT EXISTS semantics — NOT the SQL `NOT IN` operator, which
# under three-valued logic returns zero rows the moment the subquery
# yields one NULL key. The oracle side renders EXISTS/NOT EXISTS so the
# semantics match BY CONSTRUCTION on dirty data too; a future edit that
# swaps an anti-join for a NOT IN (or vice versa) in an operator breaks
# parity here on the null fixture before it ships.

_SEMI_AGG = st.lists(
    st.one_of(
        st.tuples(st.just("count"), st.just("*")),
        st.tuples(st.just("count_distinct"), st.sampled_from(["l_orderkey", "l_returnflag"])),
        st.tuples(st.just("min"), st.sampled_from(["l_quantity", "l_shipdate"])),
        st.tuples(st.just("max"), st.sampled_from(["l_quantity", "l_shipdate"])),
        st.tuples(st.just("sum_dec"), st.sampled_from(["l_extendedprice", "l_quantity"])),
    ),
    min_size=1,
    max_size=2,
).map(tuple)


@dataclass(frozen=True)
class SemiQuery:
    anti: bool
    li_atom: Atom | None
    o_status: str | None
    group: tuple[str, ...]
    aggs: tuple[tuple[str, str], ...]


def _semi_queries() -> st.SearchStrategy[SemiQuery]:
    return st.builds(
        SemiQuery,
        anti=st.booleans(),
        li_atom=st.one_of(st.none(), _atoms()),
        o_status=st.one_of(st.none(), st.sampled_from(_O_STATUS)),
        group=st.sampled_from([(), ("l_returnflag",), ("l_linestatus",)]),
        aggs=_SEMI_AGG,
    )


def semi_to_sql(q: SemiQuery) -> str:
    od = "SELECT * FROM orders"
    if q.o_status:
        od += f" WHERE o_orderstatus = '{q.o_status}'"
    neg = "NOT " if q.anti else ""
    where = [
        f"{neg}EXISTS (SELECT 1 FROM ({od}) o "
        "WHERE o.o_orderkey = lineitem.l_orderkey)"
    ]
    if q.li_atom:
        where.append(_atom_sql(q.li_atom))
    sel = list(q.group) + [
        _agg_sql(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM lineitem WHERE " + " AND ".join(where)
    if q.group:
        sql += " GROUP BY " + ", ".join(q.group)
    return sql


def semi_to_df(spark, q: SemiQuery):
    li = load_table(spark, SF_FUZZ, "lineitem")
    if q.li_atom:
        li = li.filter(_atom_col(q.li_atom))
    od = load_table(spark, SF_FUZZ, "orders")
    if q.o_status:
        od = od.filter(F.col("o_orderstatus") == q.o_status)
    j = li.join(
        od,
        li["l_orderkey"] == od["o_orderkey"],
        "left_anti" if q.anti else "left_semi",
    )
    aggs = [_agg_col(k, c, f"a{i}") for i, (k, c) in enumerate(q.aggs)]
    if q.group:
        return j.groupBy(*q.group).agg(*aggs)
    return j.agg(*aggs)


@settings(
    max_examples=25,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_semi_queries())
def test_random_semi_anti_join_matches_duckdb(spark, fuzz_con, q):
    sdf = semi_to_df(spark, q)
    s_names, s_norm = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = fuzz_con.execute(semi_to_sql(q))
    o_names, o_norm = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert s_names == o_names, (semi_to_sql(q), s_names, o_names)
    assert s_norm == o_norm, (
        f"differential mismatch for: {semi_to_sql(q)}\n"
        f"  spark rows: {s_norm[:5]}\n  duckdb rows: {o_norm[:5]}"
    )
