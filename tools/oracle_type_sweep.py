"""Sweep every registered oracle for driver-hash-hazardous output types.

The driver's value-hash is sensitive to the oracle result's *types*
(DuckDB widens SUM(BIGINT) to HUGEINT/int128, which can hash differently
from Spark's long even when values agree — the `bpe_train_merges` red row
in CORRECTNESS_r08).  The local gate normalizes Python values, so this
class of mismatch is invisible locally; this sweep catches it at the
type level instead.

For each oracle SQL we run `SELECT * FROM (<sql>) LIMIT 0` — wrapped so
DuckDB still types the full projection — against the sf0.001 views and
report any output column whose DuckDB type is HUGEINT, UHUGEINT, or a
DECIMAL wider than (38,18)-safe Spark mapping.  Exit 1 if any flagged.

Usage: PYTHONPATH=/root/repo python tools/oracle_type_sweep.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SWEEP", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

HAZARD_TYPES = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    flagged: list[tuple[str, str, str]] = []
    errors: list[tuple[str, str]] = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as e:  # oracle itself broken — report, don't mask
            errors.append((name, str(e).splitlines()[0][:160]))
            continue
        for c, ty in zip(cols, types):
            tyu = ty.upper()
            if tyu in HAZARD_TYPES:
                flagged.append((name, c, ty))
    for name, c, ty in flagged:
        print(f"FLAG {name}: column `{c}` has type {ty}")
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    print(f"swept {len(oracles)} oracles: {len(flagged)} flagged, {len(errors)} errors")
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
