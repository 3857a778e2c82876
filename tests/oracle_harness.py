"""Local stand-in for the driver's DuckDB oracle gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet (tables pre-registered as views, like the driver),
then compares row count, schema width, and order-insensitive values
(columns sorted by name, rows sorted, floats to 9 significant digits).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Driver-aligned canonical rows.

    Calibrated against CORRECTNESS_r01: the driver's value hash is
    int-vs-float sensitive (DuckDB HUGEINT -> pandas float64 made
    q_distribution_cumsum fail while values were numerically equal)
    but NOT integer-width sensitive (Spark int32 F.size vs DuckDB
    BIGINT len() passed in q_token_count_regex). So floats carry an
    'f:' tag — an integral float never equals the same-valued int.
    """
    import numpy as np

    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, (float, np.floating)):
                if math.isnan(v):
                    row.append("f:NaN")
                elif v == 0:
                    row.append("f:0")
                else:
                    row.append(f"f:{v:.9g}")
            elif v is None or v is pd.NaT:
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> dict:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    res = {
        "name": name,
        "rows": (len(sp), len(du)),
        "cols": (sorted(map(str.lower, sp.columns)), sorted(map(str.lower, du.columns))),
    }
    res["rows_match"] = res["rows"][0] == res["rows"][1]
    res["cols_match"] = res["cols"][0] == res["cols"][1]
    if res["rows_match"] and res["cols_match"]:
        sp.columns = [c.lower() for c in sp.columns]
        du.columns = [c.lower() for c in du.columns]
        a, b = _canon(sp), _canon(du)
        res["values_match"] = a == b
        if not res["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            res["sample_diff"] = diffs
    else:
        res["values_match"] = False
    res["ok"] = res["rows_match"] and res["cols_match"] and res["values_match"]
    return res


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[dict]:
    from tempel_spark.plans import testdata_queries as tq

    con = duck_con(sf_dir)
    results = []
    for name, fn in tq.QUERIES.items():
        if only and name not in only:
            continue
        sql = tq.ORACLES.get(name)
        if sql is None:
            try:
                n = fn(spark, sf_dir).count()
                results.append({"name": name, "ok": n >= 0, "rows_only": n})
            except Exception as exc:  # noqa: BLE001
                results.append({"name": name, "ok": False, "error": str(exc)[:200]})
            continue
        try:
            results.append(compare(fn(spark, sf_dir), con, sql, name))
        except Exception as exc:  # noqa: BLE001
            results.append({"name": name, "ok": False, "error": str(exc)[:300]})
    return results


if __name__ == "__main__":
    import sys

    from tempel_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("oracle_harness", cpus=8)
    results = run_all(spark, sf_dir, only)
    n_ok = sum(1 for r in results if r["ok"])
    for r in results:
        flag = "OK " if r["ok"] else "FAIL"
        extra = ""
        if not r["ok"]:
            extra = " " + str({k: v for k, v in r.items() if k not in ("name", "ok")})[:400]
        print(f"{flag} {r['name']}{extra}")
    print(f"{n_ok}/{len(results)} pass")
