#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the driver bench (bench.py is frozen): this times individual
declared queries with the noop sink, labels jobs, and captures
.explain("formatted") to plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py q_minhash_signature q_er_components --tag before
  python bench_extra.py --pipeline            # pipeline stage timings
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tempel_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = None
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    spark = get_spark("bench_extra")

    if "--pipeline" in sys.argv:
        from bench import run_pipeline_bench, _sf_from_dir

        out = run_pipeline_bench(spark, _sf_from_dir(SF_DIR))
        print(json.dumps(out))
        return

    from tempel_spark.plans.testdata_queries import QUERIES

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    results: dict[str, list[float]] = {}
    for name in args:
        results[name] = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            results[name].append(round(time.time() - t0, 3))
        if tag:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                QUERIES[name](spark, SF_DIR).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
