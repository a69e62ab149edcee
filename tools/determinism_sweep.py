"""Determinism audit over the full registry — three stability tiers.

The strict oracle canon (check_oracle.py, ``r12-strict-bitlevel``)
proves Spark == DuckDB at bit level *for one run under one config*.
This tool measures what that single run cannot: whether each side is
STABLE, i.e. whether the driver re-running the exact same query could
ever see a different bit image than the gate did.

Tier 1 — repeat-run stability (driver-relevant, must be perfect):
  the same Spark config in two separate JVM processes, and the same
  DuckDB thread count in two separate processes.  Any hash flip here
  is live driver-gate flakiness: unseeded randomness, dict-order
  dependence, time dependence, or scheduler-order float folding.

Tier 2 — DuckDB thread-count stability (driver-relevant): the
  driver's DuckDB thread count is not ours to pick, and DuckDB
  parallel aggregation CAN fold floats in morsel order.  threads=1 vs
  threads=4(+) must agree, else the oracle itself is config-dependent.

Tier 3 — Spark cross-parallelism stability (scale-relevant): a
  different core/shuffle-partition/scan-split layout re-orders every
  partial aggregation, which is exactly what a 1000-executor cluster
  does to a local[32] plan.  Entries that flip here are
  summation-order-sensitive at the emitted precision; each flip either
  gets the exact-integer-quantization treatment
  (COVERAGE.md "engine-safe rounding" recipe) or a documented waiver
  (e.g. iterative SOM fits, where ulp drift in training is inherent
  and the oracle is seeded to the SAME config the driver runs).

Usage (each `run` in a FRESH process so Spark/DuckDB configs bind):
  python tools/determinism_sweep.py run --engine spark  --out A.json
  python tools/determinism_sweep.py run --engine duckdb --threads 4 --out D1.json
  python tools/determinism_sweep.py compare A.json B.json [--label tier1]

Spark config is taken from the usual env knobs (SPARK_GRAFT_CPUS,
SPARK_GRAFT_SHUFFLE, SPARK_GRAFT_MAX_PARTITION_BYTES), so tier 3 is
just a different env.  Hashes use the strict canon's norm_value, so a
flip here is precisely a flip the gate/driver hash would see.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_oracle import SF_DIR, TABLES, norm_value  # noqa: E402


def _cell_bytes(v) -> bytes:
    v = norm_value(v)
    if v is None:
        payload = b"\x00"
    elif isinstance(v, bool):  # before int: True must not alias 1
        payload = b"b" + (b"1" if v else b"0")
    elif isinstance(v, bytes):
        payload = b"f" + v
    elif isinstance(v, str):
        payload = b"s" + v.encode("utf-8")
    elif isinstance(v, int):
        payload = b"i" + str(v).encode()
    else:
        payload = b"r" + repr(v).encode()
    # length prefix makes the row encoding INJECTIVE: without it, a
    # variable-length cell containing the separator (raw packed doubles
    # hit any byte ~0.4% of the time per position) or a shifted cell
    # split could collide two different rows into one pre-hash image
    return len(payload).to_bytes(4, "little") + payload


def result_hash(rows, colnames) -> str:
    """Order-insensitive multiset hash under the strict canon: md5 per
    row (columns in name order, cells length-prefixed), digests sorted,
    then md5 of the concatenation.  Identical results => identical hash
    regardless of row order; one flipped float bit => different hash."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    row_digests = sorted(
        hashlib.md5(b"".join(_cell_bytes(r[i]) for i in order)).digest()
        for r in rows
    )
    h = hashlib.md5()
    h.update(str(len(rows)).encode())
    for d in row_digests:
        h.update(d)
    return h.hexdigest()


def run_spark(out_path: str, only: set[str]) -> None:
    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("determinism-sweep")
    conf = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.master",
            "spark.sql.shuffle.partitions",
            "spark.sql.files.maxPartitionBytes",
        )
    }
    records: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            cols = [c.lower() for c in sdf.columns]
            rows = sdf.collect()
            records[name] = {
                "hash": result_hash(rows, cols),
                "rows": len(rows),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — per-entry, sweep continues
            records[name] = {
                "error": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            }
        print(f"{name}: {records[name].get('hash', records[name].get('error'))}")
    _write(out_path, {"engine": "spark", "sf_dir": SF_DIR, "conf": conf, "queries": records})


def run_duckdb(out_path: str, threads: int, only: set[str]) -> None:
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    records: dict[str, dict] = {}
    for name, sql in entrymod.oracle_sql().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = con.execute(sql)
            cols = [d[0].lower() for d in res.description]
            rows = res.fetchall()
            records[name] = {
                "hash": result_hash(rows, cols),
                "rows": len(rows),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            records[name] = {
                "error": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            }
        print(f"{name}: {records[name].get('hash', records[name].get('error'))}")
    _write(
        out_path,
        {"engine": "duckdb", "sf_dir": SF_DIR, "threads": threads, "queries": records},
    )


def compare(path_a: str, path_b: str, label: str) -> int:
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    qa, qb = a["queries"], b["queries"]
    names = sorted(set(qa) | set(qb))
    flips, errors, missing = [], [], []
    for n in names:
        ra, rb = qa.get(n), qb.get(n)
        if ra is None or rb is None:
            missing.append(n)
        elif "error" in ra or "error" in rb:
            errors.append({n: [ra.get("error"), rb.get("error")]})
        elif ra["hash"] != rb["hash"]:
            flips.append(n)
    n_stable = len(names) - len(flips) - len(errors) - len(missing)
    print(
        f"[{label}] {len(names)} entries: {n_stable} stable, "
        f"{len(flips)} hash flips, {len(errors)} errors, {len(missing)} missing"
    )
    if flips:
        print("FLIPS:", flips)
    if errors:
        print("ERRORS:", json.dumps(errors, indent=1)[:2000])
    return 1 if (flips or errors or missing) else 0


def _write(path: str, payload: dict) -> None:
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("run")
    pr.add_argument("--engine", choices=["spark", "duckdb"], required=True)
    pr.add_argument("--threads", type=int, default=4)
    pr.add_argument("--out", required=True)
    pr.add_argument("names", nargs="*")
    pc = sub.add_parser("compare")
    pc.add_argument("a")
    pc.add_argument("b")
    pc.add_argument("--label", default="compare")
    args = p.parse_args()
    if args.cmd == "run":
        only = set(args.names)
        if args.engine == "spark":
            run_spark(args.out, only)
        else:
            run_duckdb(args.out, args.threads, only)
        return 0
    return compare(args.a, args.b, args.label)


if __name__ == "__main__":
    raise SystemExit(main())
