"""Local replica of the driver's correctness gate — STRICT canon.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB at sf0.01, compares row count, column names, and an
order-insensitive value multiset.

Canon version ``r12-strict-bitlevel`` (VERDICT r11 ask #2).  The r11
round proved the old canon (floats rounded to 6 decimals, lists
tuple-ized) was measurably LOOSER than the driver's: DuckDB's one
``-0.0`` vs Spark's ``+0.0`` passed locally but hash-mismatched at the
driver (`feature_scale_lineitem`), and a list-typed output column
crashed the driver's pandas canonicalizer outright
(`inverted_index_postings`).  The strict canon therefore:

* hashes floats at BIT level (``struct.pack('<d', v)``) with NO
  rounding and NO signed-zero folding — ``-0.0`` and ``+0.0`` are
  different values here, exactly as they are to the driver;
  ``Decimal`` is converted to the nearest double first (Spark emits
  doubles where DuckDB may emit DECIMAL for the same expression);
* REJECTS list-typed output columns at gate time ("driver canon
  cannot sort lists — stringify or explode") instead of tuple-izing;
* every NaN canonicalizes to the string "NaN" (payloads ignored).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [--json PATH] [name ...]

``--json PATH`` additionally writes one record per query (status, rows,
elapsed, failure detail) so a full-gate run is auditable as an artifact
(LOCAL_GATE_r{N}.json) alongside the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time
from collections import Counter
from decimal import Decimal

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CANON_VERSION = "r12-strict-bitlevel"


class ListColumnError(TypeError):
    """A result cell is a container type — the driver's pandas
    canonicalizer cannot sort/hash it (r11 `inverted_index_postings`
    crash for lists; maps/sets are the same class)."""


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat().replace("T", " ")
    if isinstance(v, (list, tuple, dict, set, frozenset)):
        raise ListColumnError(
            f"{type(v).__name__}-typed output cell: driver canon cannot "
            "sort containers — stringify (array_join / array_to_string / "
            "to_json) or explode to rows"
        )
    if isinstance(v, bytearray):  # Spark BinaryType; bytes is hashable
        return bytes(v)
    return v


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT_PATH] [query ...]", file=sys.stderr)
            return 2
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    records: dict[str, dict] = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = sdf.collect()
        except Exception as e:
            failures.append(name)
            detail = f"spark error: {type(e).__name__}: {str(e).splitlines()[0][:200]}"
            records[name] = {"status": "fail", "detail": detail}
            print(f"FAIL  {name}: {detail}")
            continue
        if name not in oracles:
            dt = time.time() - t0
            records[name] = {"status": "rows_only", "spark_rows": len(s_rows), "sec": round(dt, 2)}
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [c.lower() for c in [d[0] for d in res.description]]
            o_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            detail = f"oracle error: {str(e).splitlines()[0][:200]}"
            records[name] = {"status": "fail", "detail": detail}
            print(f"FAIL  {name}: {detail}")
            continue

        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if not problems:
            try:
                ms, mo = row_multiset(s_rows, s_cols), row_multiset(o_rows, o_cols)
            except TypeError as e:
                # ListColumnError, or an unhashable type norm_value
                # did not anticipate — either way record a PER-ENTRY
                # failure instead of crashing the whole sweep
                problems.append(f"{type(e).__name__}: {e}")
            else:
                if ms != mo:
                    diff_s = list((ms - mo).items())[:3]
                    diff_o = list((mo - ms).items())[:3]
                    problems.append(
                        f"values spark-only={diff_s} oracle-only={diff_o}"
                    )
        if problems:
            failures.append(name)
            detail = "; ".join(problems)
            records[name] = {"status": "fail", "spark_rows": len(s_rows), "detail": detail}
            print(f"FAIL  {name}: {detail}")
        else:
            dt = time.time() - t0
            records[name] = {"status": "ok", "spark_rows": len(s_rows), "sec": round(dt, 2)}
            print(f"ok    {name}: {len(s_rows)} rows match [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        import json

        summary = {
            "canon": CANON_VERSION,
            "sf_dir": SF_DIR,
            "n_queries": len(records),
            "n_ok": sum(1 for r in records.values() if r["status"] == "ok"),
            "n_rows_only": sum(1 for r in records.values() if r["status"] == "rows_only"),
            "n_fail": len(failures),
            "failures": failures,
            "queries": records,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
