"""Dump .explain("formatted") for bench/gate queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [query ...]
  tag    -> plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
            default "before")
  query  -> registry names; default = the bench headline registry set.

Captures the logical->physical plan of the DataFrame each query run()
returns (eager side work inside run() — index builds, KMeans fits —
executes but is not part of the dumped plan; those paths are covered by
the operator-level dumps their blocks write)."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from photon_ml_spark.queries import all_queries
    from photon_ml_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if not names:
        import bench

        names = [n for n in bench.BENCH_QUERIES if n in registry]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].run(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
