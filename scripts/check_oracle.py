"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row-count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [query_name ...] [--sf DIR]
Exit code 0 iff all checked queries match.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    import datetime
    from decimal import Decimal
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = SF_DIR
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf]

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args or list(queries)

    # Deliberately a PLAIN session (no session.get_spark() extras) so this
    # harness replicates the driver's environment — round 1 shipped a bug
    # that only reproduced on a plain session.
    spark = (SparkSession.builder.master("local[32]")
             .appName("oracle_check")
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    failed, passed, rows_only = [], [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            otypes = [str(d[1]) for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue

        ok = True
        # Type gate (round-7): the driver's canonicalizer hashes column
        # TYPES, not just values — a DuckDB HUGEINT (what SUM(BIGINT)
        # silently becomes) or DECIMAL output column hash-mismatches a
        # Spark LONG/DOUBLE even when every value is identical.  Three
        # rounds of red rows (r3 q57, r5 nx_q17, r6 ×8) were this class
        # and invisible to the value compare below, so fail loudly here.
        bad_types = [(c, t) for c, t in zip(ocols, otypes)
                     if any(k in t.upper()
                            for k in ("HUGEINT", "INT128", "DECIMAL"))]
        if bad_types:
            print(f"FAIL {name}: oracle output types the driver hashes "
                  f"differently than Spark (cast them in the oracle SQL): "
                  f"{bad_types}")
            ok = False
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            s_n = normalize([tuple(r) for r in srows], scols)
            o_n = normalize(orows, ocols)
            if s_n != o_n:
                diffs = [(a, b) for a, b in zip(s_n, o_n) if a != b][:5]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for a, b in diffs:
                    print(f"    spark : {a}\n    oracle: {b}")
                ok = False
        if ok:
            passed.append(name)
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
        else:
            failed.append(name)

    print(f"\n== {len(passed)} passed, {len(failed)} failed, "
          f"{len(rows_only)} rows-only ==")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
