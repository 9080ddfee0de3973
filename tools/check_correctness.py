"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the same query in DuckDB over the identical parquet
tables; compares row count, column names, and a value hash computed
over name-sorted columns with rows sorted canonically.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round to defeat engine float noise
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from bigdata_tag_system_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    passed, failed, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=3)
            failed.append(name)
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            # type-check BEFORE fetching: DuckDB sum(<integer>) returns
            # HUGEINT, which our fetchall() path reads as a plain Python
            # int (hash-identical to Spark's long) but the DRIVER's
            # comparator canonicalizes differently — the r4/r5
            # text_repetition + tpch_q12 driver-reds were exactly this.
            # Every oracle must cast integer aggregates to BIGINT.
            otypes = [str(t) for t in con.sql(oracles[name]).types]
            hbad = [t for t in otypes if "HUGEINT" in t]
            # probe_hugeint_canary is the ONE deliberate naked-HUGEINT
            # oracle (a driver-environment diagnostic; see its docstring)
            if name == "probe_hugeint_canary":
                hbad = []
            if hbad:
                print(f"FAIL  {name}: oracle emits {hbad} — cast ::BIGINT")
                failed.append(name)
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            failed.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failed.append(name)
            continue
        sh, oh = _hash(srows, scols), _hash(orows, ocols)
        if sh != oh:
            print(f"FAIL  {name}: hash spark={sh} oracle={oh} rows={len(srows)}")
            failed.append(name)
            continue
        passed.append(name)
        print(f"ok    {name}: rows={len(srows)}")

    print(f"\n{len(passed)} passed, {len(failed)} FAILED, {len(weak)} weak-checked")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
