"""Local mimic of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare schema
column names, row counts, and column-name-sorted values.

Used by tests/test_queries_vs_duckdb.py and runnable standalone:
    python -m spider_spark.verify [sf_dir] [only1,only2] [--json out.json]

``--json`` writes a per-query artifact (the committed
CORRECTNESS_local_r{N}.json files) so the queries the driver's sample
doesn't cover have a recorded, diffable signal each round.

Known boundary sensitivity (latent, never observed failing): t38's
entropy compares floats that both engines build by folding c*log2(c) over
the SAME token-sorted array, so the only cross-engine freedom is libm
log2 ULPs (~1e-14). A token distribution whose entropy lands EXACTLY on a
half-boundary of the 4-dp rounding grid could flip floor(x*1e4+0.5) on
one engine only. If t38 ever FAILs here with a single-row value diff at
the 4th decimal, that is the diagnosis (see t38's docstring in
operators/textstats.py) — not a logic regression.
"""

from __future__ import annotations

import math
import os
import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_run(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    """EXACT value normalization — floats compare bit-for-bit (via
    shortest-round-trip repr), matching the driver's strict value hash.
    Round-1 lesson: a 9-dp-rounded local compare let two ULP-level
    divergences (f10, f19) pass locally and fail the driver gate."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # pandas/numpy scalars → python
    if hasattr(v, "item"):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    return str(v)


def compare(spark_df, duck_df) -> tuple[bool, str]:
    """Column-name-sorted, order-insensitive value comparison."""
    import pandas as pd

    sp = spark_df.toPandas()
    cols_sp = sorted(sp.columns)
    cols_dk = sorted(duck_df.columns)
    if cols_sp != cols_dk:
        return False, f"columns differ: spark={cols_sp} duckdb={cols_dk}"
    if len(sp) != len(duck_df):
        return False, f"row counts differ: spark={len(sp)} duckdb={len(duck_df)}"
    a = [
        tuple(_norm_cell(v) for v in row)
        for row in sp[cols_sp].itertuples(index=False, name=None)
    ]
    b = [
        tuple(_norm_cell(v) for v in row)
        for row in duck_df[cols_dk].itertuples(index=False, name=None)
    ]
    a.sort(key=repr)
    b.sort(key=repr)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        return False, f"values differ; spark-only={diff_a} duckdb-only={diff_b}"
    return True, "ok"


def verify_all(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, str]:
    from spider_spark.operators import ORACLE, QUERIES

    results = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in ORACLE:
                ddf = duckdb_run(ORACLE[name], sf_dir)
                ok, msg = compare(sdf, ddf)
                results[name] = "PASS" if ok else f"FAIL: {msg}"
            else:
                n = sdf.count()
                results[name] = f"ROWS_ONLY({n})"
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR: {type(e).__name__}: {e}"
    return results


if __name__ == "__main__":
    import json
    import time

    from spider_spark.session import get_spark

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    # --master lets the multi-executor parity test run the SAME
    # oracle checks under local-cluster (separate executor JVMs)
    master = "local[8]"
    if "--master" in argv:
        i = argv.index("--master")
        master = argv[i + 1]
        del argv[i : i + 2]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    only = argv[1].split(",") if len(argv) > 1 else None
    extra = None
    if "local-cluster" in master:
        # executor JVMs spawn their own python workers, which don't
        # inherit the driver's cwd — point them at the repo (the
        # spark-submit path ships a zip via --py-files instead;
        # tests/test_cli.py covers that route)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra = {"spark.executorEnv.PYTHONPATH": repo_root}
    spark = get_spark(master=master, extra=extra)
    res = verify_all(spark, sf, only)
    bad = 0
    for k in sorted(res):
        print(f"{k:28s} {res[k]}")
        if res[k].startswith(("FAIL", "ERROR")):
            bad += 1
    print(f"\n{len(res)} queries, {bad} failing")
    if json_out:
        n_pass = sum(1 for v in res.values() if v == "PASS")
        artifact = {
            "sf_dir": sf,
            "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_queries": len(res),
            "n_oracle_pass": n_pass,
            "n_rows_only": sum(
                1 for v in res.values() if v.startswith("ROWS_ONLY")
            ),
            "n_failing": bad,
            "queries": dict(sorted(res.items())),
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {json_out}")
    sys.exit(1 if bad else 0)
