"""Curate-driver 10x end-to-end with the PII stage enabled (round-7
verdict Next #7): the PII scrub is the newest stage and runs FIRST
over the raw corpus, so its cost share belongs in the measured record,
not in plan-shape reasoning. Runs the bench's curate config + ``"pii":
{}`` at sf0.1 and over ``.stress/x10`` (built by ``stress_scale.py
build``) and prints both per-stage timing maps plus the ratio map as
one JSON line.

    python scripts/stress_scale.py build   # once
    PYTHONPATH=. python scripts/bench_curate10x.py
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".stress", f"x{int(os.environ.get('STRESS_FACTOR', '10'))}"
)


def run_once(spark, docs_path: str) -> dict:
    from photon_ml_spark.cli import curate

    out = tempfile.mkdtemp(prefix="bench_curate10x_")
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            curate(
                {
                    "input": docs_path,
                    "output_dir": out,
                    "pii": {},
                    "quality": {"min_tokens": 5, "min_quality": 0.2},
                    "exact_dedup": True,
                    "near_dedup": {"threshold": 0.5, "n": 2},
                    "split": {"test_frac": 0.1},
                    "chunk": {"max_tokens": 256, "overlap": 32},
                    "report": True,
                },
                spark,
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return json.loads(buf.getvalue().strip().splitlines()[-1]).get(
        "timings", {}
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from photon_ml_spark.session import get_spark

    spark = get_spark(app_name="bench-curate10x", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    # warmup at sf0.01 (sibling of SRC, falling back to SRC itself):
    # JVM/codegen/parquet-footer caches, so the sf0.1 leg does not
    # carry the cold-start cost the x10 leg skips
    warm = os.path.join(os.path.dirname(SRC.rstrip("/")), "sf0.01")
    run_once(
        spark,
        f"{warm if os.path.isdir(warm) else SRC}/documents.parquet",
    )
    spark.catalog.clearCache()
    out: dict = {
        "sf01": run_once(spark, f"{SRC}/documents.parquet"),
    }
    spark.catalog.clearCache()
    out["x10"] = run_once(spark, f"{X10}/documents.parquet")
    # stamps are rounded to 10ms by the driver — a ratio against a
    # ~0 base is noise, not measurement: emit null for those
    out["ratio"] = {
        k: (
            round(v / out["sf01"][k], 1)
            if out["sf01"].get(k, 0) >= 0.05
            else None
        )
        for k, v in out["x10"].items()
    }
    print(json.dumps({"curate10x_pii": out}))


if __name__ == "__main__":
    main()
