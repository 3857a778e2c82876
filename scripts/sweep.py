"""Run every registered query against its DuckDB oracle (the local
stand-in for the driver's correctness gate).

Usage: python scripts/sweep.py [sf_dir] [q_name,q_name,...]
Prints one line per query and a final PASS/FAIL tally.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from oracle_harness import compare, duck_con
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "8"))
        .config("spark.driver.memory", "10g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duck_con(sf)
    qs, osql = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            print(f"SWEEP {name} NO-ORACLE (rows-only: {fn(spark, sf).count()})")
            continue
        try:
            r = compare(fn(spark, sf), con, osql[name], name)
            ok = bool(r.get("values_match"))
        except Exception as ex:  # noqa: BLE001
            ok, r = False, {"err": repr(ex)[:400]}
        n_pass += ok
        n_fail += not ok
        print(f"SWEEP {name} {'OK' if ok else 'FAIL ' + str(r)[:400]}", flush=True)
    print(f"SWEEP-TOTAL pass={n_pass} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
