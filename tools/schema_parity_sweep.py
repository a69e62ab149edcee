"""Report-only schema/type parity sweep between Spark results and
their DuckDB oracles.

The strict value canon (tools/check_oracle.py) catches int-vs-float
type mismatches implicitly (an int value and a float value hash
differently at bit level), but Python's `bool == int` / `hash(True) ==
hash(1)` identity means a BOOLEAN-vs-integer column mismatch would
sail through the value gate — while the driver's separate
`schema_match` check may not be so forgiving.  This sweep runs every
registry entry at sf0.01 on both engines and compares, per column, the
set of observed Python value types (None ignored), normalized to
families: bool / int / float(=float+Decimal, the canon's conversion) /
str / date / datetime / bytes.

Pure REPORT tool — prints one line per mismatch and a summary; it does
not gate.  Run after adding an operator whose output includes booleans
or unusual types.

Usage: PYTHONPATH=/root/repo python tools/schema_parity_sweep.py [name ...]
"""

from __future__ import annotations

import datetime
import os
import sys
from decimal import Decimal

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def fam(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):  # MUST precede int (bool is an int subclass)
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, (float, Decimal)):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, datetime.datetime):
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    return type(v).__name__


def col_families(rows, ncols):
    fams: list[set] = [set() for _ in range(ncols)]
    for r in rows:
        for i in range(ncols):
            f = fam(r[i])
            if f:
                fams[i].add(f)
    return fams


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("schema-parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_checked = 0
    mismatches = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = sdf.collect()
            res = con.execute(oracles[name])
            o_cols = [c.lower() for c in [d[0] for d in res.description]]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"ERR   {name}: {type(e).__name__}: {str(e).splitlines()[0][:150]}")
            continue
        n_checked += 1
        s_f = dict(zip(s_cols, col_families(s_rows, len(s_cols))))
        o_f = dict(zip(o_cols, col_families(o_rows, len(o_cols))))
        for c in sorted(set(s_f) & set(o_f)):
            if s_f[c] != o_f[c]:
                mismatches.append((name, c, sorted(s_f[c]), sorted(o_f[c])))
                print(f"TYPE  {name}.{c}: spark={sorted(s_f[c])} oracle={sorted(o_f[c])}")
    print(f"\nchecked {n_checked} entries; {len(mismatches)} column-type mismatches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
