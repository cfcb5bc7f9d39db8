"""Registry-wide per-query timing + plan capture (optimization rounds).

Times EVERY registered query end-to-end with the noop sink (guide §1.4)
in one warm JVM — two passes, per-query min (bench.py's transient-stall
estimator) — and optionally dumps each query's ``explain("formatted")``
text. This is the measure-first harness behind OPTIMIZATION_r{N}.md: the
bench.py headline covers 9 queries; the driver re-runs the full registry,
so regressions/wins anywhere matter.

Usage:
    python scripts/bench_registry.py [--sf-dir DIR] [--passes N]
        [--only substr[,substr...]] [--skip substr[,substr...]]
        [--plans-dir DIR] [--out FILE]

Plans are written as <plans-dir>/<query>.txt. Timing JSON goes to --out
(default stdout): {"queries": {name: sec}, "errors": {name: msg}}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--no-time", action="store_true",
                    help="capture plans only; skip the timed noop runs")
    args = ap.parse_args()

    from masd_spark.session import get_spark
    from masd_spark.queries import load_all

    spark = get_spark(app_name="masd-bench-registry")
    registry = load_all()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]
    names = [
        n for n in registry
        if (not only or any(s in n for s in only))
        and not any(s in n for s in skip)
    ]

    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    errors: dict[str, str] = {}
    if plans_dir:
        for name in names:
            try:
                df = registry[name].fn(spark, args.sf_dir)
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                (plans_dir / f"{name}.txt").write_text(txt)
            except Exception as exc:  # noqa: BLE001
                errors[name] = repr(exc)[:500]

    per_pass: list[dict[str, float]] = []
    if not args.no_time:
        for _ in range(args.passes):
            timings: dict[str, float] = {}
            for name in names:
                if name in errors:
                    continue
                spark.sparkContext.setJobDescription(name)
                try:
                    t0 = time.perf_counter()
                    df = registry[name].fn(spark, args.sf_dir)
                    df.write.mode("overwrite").format("noop").save()
                    timings[name] = round(time.perf_counter() - t0, 3)
                except Exception as exc:  # noqa: BLE001
                    errors[name] = repr(exc)[:500]
                finally:
                    spark.sparkContext.setJobDescription(None)
            per_pass.append(timings)
            from masd_spark.queries.dedup import _SHINGLE_CACHE
            import gc

            _SHINGLE_CACHE.clear()
            gc.collect()
            spark.catalog.clearCache()

    timings = (
        {
            n: min(p.get(n, float("inf")) for p in per_pass if n in p)
            for n in per_pass[-1]
        }
        if per_pass
        else {}
    )
    out = {
        "sf_dir": args.sf_dir,
        "passes": args.passes,
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "total": round(sum(timings.values()), 3),
        "errors": errors,
    }
    if len(per_pass) > 1:
        out["queries_cold"] = per_pass[0]
    text = json.dumps(out, indent=1)
    if args.out:
        Path(args.out).write_text(text + "\n")
        print(f"wrote {args.out}: total={out['total']}s over {len(timings)} queries"
              + (f", {len(errors)} errors" if errors else ""))
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
