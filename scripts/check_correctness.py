"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` entry
exists, the same query in DuckDB over the same parquet files; compares
row-count, sorted-column schema, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), v if v is not None else 0) for v in t),
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        # + 0.0 folds IEEE -0.0 into 0.0 (engines disagree on the SIGN of an
        # exactly-zero rounded sum; they agree on the value)
        return round(v, 9) + 0.0
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry_mod
    from audit_anomaly_detection_etl_spark.session import get_spark

    spark = get_spark("correctness-check")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    failed = []
    for name, fn in sorted(queries.items()):
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "spark_error", "error": str(e)[:300]}
            failed.append(name)
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(srows)}
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "oracle_error", "error": str(e)[:300]}
            failed.append(name)
            continue
        schema_ok = sorted(scols) == sorted(ocols)
        count_ok = len(srows) == len(orows)
        hash_ok = (
            value_hash(srows, scols) == value_hash(orows, ocols) if schema_ok else False
        )
        ok = schema_ok and count_ok and hash_ok
        results[name] = {
            "status": "match" if ok else "MISMATCH",
            "rows": len(srows),
            "oracle_rows": len(orows),
            "schema_ok": schema_ok,
            "hash_ok": hash_ok,
        }
        if not ok:
            results[name]["spark_cols"] = scols
            results[name]["oracle_cols"] = ocols
            failed.append(name)

    print(json.dumps(results, indent=1))
    n_match = sum(1 for r in results.values() if r["status"] == "match")
    # registered-vs-reported count: a partial driver run (or a filter) must
    # be VISIBLE — round 2's driver record silently covered 50/67 queries
    print(
        f"\n{len(results)}/{len(queries)} registered queries checked"
        + (f" (filter={name_filter!r})" if name_filter else ""),
        file=sys.stderr,
    )
    print(f"{n_match}/{len(results)} match; failed: {failed}", file=sys.stderr)
    if not name_filter and len(results) != len(queries):
        print("WARNING: partial coverage with no filter", file=sys.stderr)
        return 1
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
