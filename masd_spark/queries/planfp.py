"""Plan-content query fingerprints (VERDICT r7 item 1).

The source-text fingerprint scheme certified a query's driver green against
a hash of its OWN function source + oracle string — blind to edits in shared
helpers (``operators/*.py``, query-module helper functions) that change
results without touching the registered function body. This module replaces
it with a fingerprint derived from what the query actually ASKS Spark to do:

    fingerprint = sha256( fn source
                        + oracle text
                        + normalized analyzed-plan text of the returned
                          DataFrame AND of every side-effecting action the
                          query ran while building it (index writes,
                          driver-side collects feeding literals)
                        + [closure hash, only for plan-opaque queries] )

The analyzed logical plan transitively reflects every helper the query
reached — a changed aggregation expression, join condition, literal
constant, or filter in ``operators/dedup.py`` changes the plan text of every
dependent query, re-fronting exactly those into the next driver window,
while comment/docstring/refactor edits that leave plans identical re-front
nothing.

Plan-opaque queries — those whose plan hides Python compute (Arrow/pandas
exec nodes, Python UDTFs, ``LogicalRDD`` from a completed stream or a
``localCheckpoint``, ``LocalRelation`` whose rows the plan does not print) —
additionally fold in a hash of their registering module's transitive
``masd_spark`` file closure: coarse (any edit in the closure re-fronts
them), but never blind.

Recomputing a fingerprint requires running the query's plan construction
against the tiny fixture (``sf0.001``), so fingerprints are CACHED in the
git-tracked ``plan_fingerprints.json`` keyed by a cheap static dependency
key (fn source + oracle + closure file hashes). Reads are pure cache
lookups; a stale cache entry (any file in the closure edited) reports the
fingerprint as UNKNOWN, which ``effective_checked_rounds`` treats as
possibly-invalidated (-1). ``write_manifest`` refreshes stale entries with
a real Spark run before certifying — the same run-after-every-edit
discipline ``registry_manifest.json`` already imposes.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

PLAN_FP_FILE = "plan_fingerprints.json"

# Fingerprint-algorithm version, folded into every cache dependency key.
# BUMP THIS whenever normalization rules, opacity classification, capture
# hooks, or the payload recipe change — the cache can't see edits to this
# file (it is deliberately outside the module closures it hashes), so the
# bump is what forces the full recompute after an algorithm change.
ALGO_VERSION = "1"

# Fixture the plans are captured against. sf0.001 keeps the in-query
# actions (iterative kernels, index builds, stream twins) cheap; the plan
# SHAPE is scale-independent, which is the point.
def _fixture_dir() -> str:
    import os

    return os.getenv("MASD_FP_FIXTURE", "/root/testdata/sf0.001")


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _cache_path() -> Path:
    return _repo_root() / PLAN_FP_FILE


# ---------------------------------------------------------------------------
# plan-text normalization
# ---------------------------------------------------------------------------

# Session-dependent noise in analyzed-plan text, in substitution order:
# expression ids (#123 / #123L), lambda variable counters (lambda x_139),
# CTE definition ids, temp/checkpoint paths, UUID-named views, object
# addresses. Everything semantic (column names, literals, join conditions,
# window specs) survives.
_NORM_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"(lambda [A-Za-z]\w*?)_\d+"), r"\1"),
    (re.compile(r"#\d+"), "#"),
    (re.compile(r"\bcte \[?\d+\]?", re.I), "cte"),
    (re.compile(r"CTERelation(Def|Ref) \d+"), r"CTERelation\1"),
    (
        re.compile(
            r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
        ),
        "<UUID>",
    ),
    (re.compile(r"(file:)?/tmp/[^\s,;)\]}]+"), "<TMP>"),
    (re.compile(r"(file:)?/dev/shm/[^\s,;)\]}]+"), "<TMP>"),
    (re.compile(r"(file:)?\S*spark-warehouse"), "<WH>"),
    (re.compile(r"0x[0-9a-f]+"), "0x"),
]


def normalize_plan(txt: str) -> str:
    txt = txt.replace(_fixture_dir(), "<SF>")
    for pat, repl in _NORM_RULES:
        txt = pat.sub(repl, txt)
    return txt


# Plan nodes that hide Python-side compute or data the plan text does not
# print — queries containing any of these get the coarse closure-hash term.
_OPAQUE_RE = re.compile(
    r"ArrowEvalPython|BatchEvalPython|MapInPandas|PythonMapInArrow"
    r"|FlatMapGroupsInPandas|MapGroupsInPandas|FlatMapCoGroupsInPandas"
    r"|TransformWithState|LogicalRDD|LocalRelation|PythonUDF"
)
# Built-in generators whose `Generate f(...)` node is fully described by
# the plan; any OTHER generator name is a Python UDTF (opaque body).
_BUILTIN_GENERATORS = {
    "explode",
    "explode_outer",
    "posexplode",
    "posexplode_outer",
    "inline",
    "inline_outer",
    "stack",
    "json_tuple",
    "variant_explode",
    "variant_explode_outer",
}


def _is_opaque(plan_text: str) -> bool:
    if _OPAQUE_RE.search(plan_text):
        return True
    for name in re.findall(r"Generate (\w+)\(", plan_text):
        if name.lower() not in _BUILTIN_GENERATORS:
            return True
    return False


# ---------------------------------------------------------------------------
# static module closure (the cheap staleness key)
# ---------------------------------------------------------------------------

_PKG_ROOT = Path(__file__).resolve().parents[1]  # masd_spark/
_REF_RE = re.compile(r"\bmasd_spark(?:\.\w+)*")


def _module_path(dotted: str) -> Path | None:
    parts = dotted.split(".")[1:]  # drop leading masd_spark
    base = _PKG_ROOT.joinpath(*parts) if parts else _PKG_ROOT
    py = base.with_suffix(".py")
    if py.is_file():
        return py
    init = base / "__init__.py"
    if init.is_file():
        return init
    return None


def _file_refs(path: Path) -> set[str]:
    try:
        text = path.read_text()
    except OSError:
        return set()
    return set(_REF_RE.findall(text))


def module_closure(module_name: str) -> list[tuple[str, str]]:
    """Transitive ``masd_spark`` file closure of a module, as sorted
    (dotted name, file sha256) pairs. Reference detection is a static
    token scan (this codebase imports absolutely, often inside function
    bodies, so an AST import walk would under-approximate); the scan
    over-approximates, which only costs an occasional extra recompute."""
    seen: dict[str, str] = {}
    frontier = [module_name]
    while frontier:
        mod = frontier.pop()
        if mod in seen:
            continue
        path = _module_path(mod)
        if path is None:
            continue
        seen[mod] = hashlib.sha256(path.read_bytes()).hexdigest()
        # a dotted reference implies its parent packages' __init__ too
        for ref in _file_refs(path):
            parts = ref.split(".")
            for i in range(1, len(parts) + 1):
                frontier.append(".".join(parts[:i]))
    return sorted(seen.items())


_CLOSURE_CACHE: dict[str, str] = {}


def closure_hash(module_name: str) -> str:
    h = _CLOSURE_CACHE.get(module_name)
    if h is None:
        payload = "\n".join(f"{m} {fh}" for m, fh in module_closure(module_name))
        h = hashlib.sha256(payload.encode()).hexdigest()
        _CLOSURE_CACHE[module_name] = h
    return h


def clear_closure_cache() -> None:
    _CLOSURE_CACHE.clear()


def dep_key(spec) -> str:
    """Cheap static staleness key for a query's cached plan fingerprint:
    any edit to the fn, its oracle, or any file in its module's closure
    changes the key and forces a recompute (which may well produce the
    SAME fingerprint — that is the precision win over hashing sources)."""
    return hashlib.sha256(
        (
            ALGO_VERSION
            + "\x00"
            + spec.src_fingerprint
            + "\x00"
            + closure_hash(spec.module)
        ).encode()
    ).hexdigest()[:20]


# ---------------------------------------------------------------------------
# plan capture
# ---------------------------------------------------------------------------


def _analyzed_text(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


class _ActionCapture:
    """Context manager that records the normalized analyzed plan of every
    side-effecting DataFrame action the query runs while constructing its
    result: writer terminals (index builds) and driver-side actions
    (collects feeding literals in iterative kernels). Plans only — never
    result data; opaque data paths are covered by the closure term."""

    _DF_ACTIONS = (
        "collect",
        "toPandas",
        "count",
        "take",
        "first",
        "head",
        "toLocalIterator",
        "foreach",
        "foreachPartition",
    )
    _WRITER_ACTIONS = (
        "save",
        "saveAsTable",
        "insertInto",
        "parquet",
        "orc",
        "json",
        "csv",
        "text",
    )

    def __init__(self, sink: list[str]):
        self.sink = sink
        self._saved: list[tuple[type, str, object]] = []

    def _record(self, jdf_owner) -> None:
        try:
            self.sink.append(normalize_plan(_analyzed_text(jdf_owner)))
        except Exception:
            self.sink.append("<uncapturable-plan>")

    def __enter__(self):
        from pyspark.sql import DataFrame
        from pyspark.sql.readwriter import DataFrameWriter

        sink_record = self._record

        def patch(cls, name, owner_of):
            orig = getattr(cls, name)

            def patched(self, *a, **k):
                sink_record(owner_of(self))
                return orig(self, *a, **k)

            self._saved.append((cls, name, orig))
            setattr(cls, name, patched)

        for name in self._DF_ACTIONS:
            if hasattr(DataFrame, name):
                patch(DataFrame, name, lambda df: df)
        for name in self._WRITER_ACTIONS:
            if hasattr(DataFrameWriter, name):
                patch(DataFrameWriter, name, lambda w: w._df)
        return self

    def __exit__(self, *exc):
        for cls, name, orig in self._saved:
            setattr(cls, name, orig)
        return False


def compute_fingerprint(spark, spec) -> str:
    """Run the query's plan construction against the tiny fixture and hash
    fn source + oracle + captured plan texts (+ closure for opaque plans).
    Deterministic across sessions by normalization (pinned in
    tests/test_rotation.py)."""
    import inspect

    sink: list[str] = []
    with _ActionCapture(sink):
        df = spec.fn(spark, _fixture_dir())
        sink.append(normalize_plan(_analyzed_text(df)))
    joined = "\n====\n".join(sink)
    try:
        src = inspect.getsource(spec.raw_fn or spec.fn)
    except (OSError, TypeError):
        src = spec.src_fingerprint
    payload = src + "\x00" + (spec.oracle or "") + "\x00" + joined
    if _is_opaque(joined):
        payload += "\x00" + closure_hash(spec.module)
    return "p" + hashlib.sha256(payload.encode()).hexdigest()[:19]


# ---------------------------------------------------------------------------
# cache
# ---------------------------------------------------------------------------


def load_cache() -> dict[str, dict]:
    try:
        return json.loads(_cache_path().read_text())
    except (OSError, ValueError):
        return {}


def _write_cache(cache: dict[str, dict]) -> None:
    with open(_cache_path(), "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
        f.write("\n")


def current_fingerprints(registry) -> dict[str, str | None]:
    """Pure cache read: query name -> plan fingerprint, or None when the
    cached entry is missing or its dependency key no longer matches (some
    file in the closure was edited — fingerprint unknown until
    :func:`refresh` recomputes it). Never starts Spark."""
    cache = load_cache()
    out: dict[str, str | None] = {}
    for name, spec in registry.items():
        rec = cache.get(name)
        if rec and rec.get("dep") == dep_key(spec):
            out[name] = rec["fp"]
        else:
            out[name] = None
    return out


def refresh(registry, spark=None, log=None) -> dict[str, str]:
    """Recompute every stale/missing cache entry (building a local session
    only if needed), prune unregistered names, persist, and return the
    full name -> fingerprint map."""
    cache = load_cache()
    stale = [
        name
        for name, spec in registry.items()
        if cache.get(name, {}).get("dep") != dep_key(spec)
    ]
    if stale:
        if spark is None:
            from masd_spark.session import get_spark

            spark = get_spark("masd-planfp")
        for i, name in enumerate(stale):
            spec = registry[name]
            fp = compute_fingerprint(spark, spec)
            cache[name] = {"dep": dep_key(spec), "fp": fp}
            if log:
                log(f"[{i + 1}/{len(stale)}] {name} -> {fp}")
            if i % 10 == 9:  # survive an interrupted long rebuild
                _write_cache(cache)
    for name in list(cache):
        if name not in registry:
            del cache[name]
    _write_cache(cache)
    return {name: cache[name]["fp"] for name in registry}
