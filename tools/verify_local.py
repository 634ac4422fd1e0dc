"""Local stand-in for the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` at a given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet
files, and compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified
with float rounding).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        # Do NOT round through float: the driver's normalizer treats
        # DECIMAL distinctly (every decimal-emitting query hash-failed
        # in r1 while passing the old float-rounded compare here).
        # Exact stringification makes the local gate at least as strict
        # as the driver; queries should emit DOUBLE/BIGINT instead.
        return str(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, datetime.datetime):
        # full microsecond precision: the fixture timestamps carry
        # micros, and truncating here would mask sub-second divergence
        # the driver's normalizer may still see
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("verify-local")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(
                f"ok?  {name}: rows-only ({len(srows)} rows, "
                f"{time.time()-t0:.1f}s) cols={scols}"
            )
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        import decimal as _dec

        for side, cols_, rows_ in (("spark", scols, srows), ("oracle", ocols, orows)):
            if rows_ and any(isinstance(v, _dec.Decimal) for v in rows_[0]):
                bad = [c for c, v in zip(cols_, rows_[0]) if isinstance(v, _dec.Decimal)]
                print(
                    f"WARN {name}: {side} emits DECIMAL columns {bad} — "
                    "the driver's hash is unreliable for these; cast to DOUBLE"
                )
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # show a diff sample
                sset = set(
                    "\x1f".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oset = set(
                    "\x1f".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for x in list(sset - oset)[:3]:
                    print(f"   spark-only: {x!r}")
                for x in list(oset - sset)[:3]:
                    print(f"   oracle-only: {x!r}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
