"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column names, and an order-insensitive
value hash (rows stringified, sorted).  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entrymod
    from spatial_spark.session import get_spark

    spark = get_spark("correctness_check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            spark_secs = round(time.time() - t0, 2)
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            print(f"{name:24s} SPARK_ERROR {str(e)[:160]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows),
                             "secs": spark_secs}
            print(f"{name:24s} ROWS_ONLY rows={len(srows)} ({spark_secs}s)")
            continue
        try:
            orows = con.execute(oracles[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            print(f"{name:24s} ORACLE_ERROR {str(e)[:160]}")
            continue
        s_hash = table_hash(scols, [[r[c] for c in scols] for r in srows])
        o_hash = table_hash(ocols, orows)
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = s_hash == o_hash
        status = "OK" if (ok_count and ok_cols and ok_hash) else "MISMATCH"
        if status == "OK" and len(srows) == 0:
            status = "OK_EMPTY"  # vacuous: both sides 0 rows — check the query
        results[name] = {
            "status": status, "rows": len(srows), "oracle_rows": len(orows),
            "cols_ok": ok_cols, "hash_ok": ok_hash, "secs": spark_secs,
        }
        print(f"{name:24s} {status} rows={len(srows)}/{len(orows)} "
              f"cols={'Y' if ok_cols else 'N'} hash={'Y' if ok_hash else 'N'} "
              f"({spark_secs}s)")
        if status == "MISMATCH" and (not ok_hash) and ok_count and ok_cols:
            # print first differing rows to debug
            so = sorted("|".join(norm_cell(r[c]) for c in sorted(scols)) for r in srows)
            oo = sorted("|".join(norm_cell(v) for v in
                                 [r[ocols.index(c)] for c in sorted(ocols)])
                        for r in orows)
            for a, b in zip(so, oo):
                if a != b:
                    print(f"   spark : {a}\n   oracle: {b}")
                    break

    n_ok = sum(1 for r in results.values() if r["status"] == "OK")
    n_total = len(results)
    print(f"\n{n_ok}/{n_total} OK "
          f"({sum(1 for r in results.values() if r['status'] == 'ROWS_ONLY')} rows-only)")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1)
    return 0 if all(r["status"] in ("OK", "ROWS_ONLY") for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
