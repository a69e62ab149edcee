"""Aggregate shuffle bytes per job description from a Spark event log.

Reads the JSON-lines event log(s) written when SPARK_GRAFT_EVENTLOG_DIR
is set (sparkml_som_spark/session.py), maps stages -> jobs -> the
`spark.job.description` label set by the measuring tool, and sums task
shuffle read/write bytes per label.  This is how the r15 codec A/B
reports *measured* shuffle volumes (guide §2.3 "measure shuffle bytes
... with each") instead of guessing them.

Usage: python tools/parse_eventlog.py <eventlog-file-or-dir> [prefix]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def parse(path: str) -> dict[str, dict[str, int]]:
    stage_to_job: dict[int, int] = {}
    job_desc: dict[int, str] = {}
    agg: dict[str, dict[str, int]] = defaultdict(
        lambda: {"shuffle_write": 0, "shuffle_read": 0, "input": 0, "tasks": 0, "jobs": 0, "job_ms": 0}
    )
    job_start_ts: dict[int, int] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
                agg[job_desc[jid]]["jobs"] += 1
                job_start_ts[jid] = ev.get("Submission Time", 0)
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_start_ts:
                    agg[job_desc.get(jid, "")]["job_ms"] += (
                        ev.get("Completion Time", 0) - job_start_ts[jid]
                    )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                desc = job_desc.get(stage_to_job.get(sid, -1), "")
                tm = ev.get("Task Metrics") or {}
                sw = (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                srm = tm.get("Shuffle Read Metrics") or {}
                sr = srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                inp = (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
                a = agg[desc]
                a["shuffle_write"] += sw
                a["shuffle_read"] += sr
                a["input"] += inp
                a["tasks"] += 1
    return agg


def main() -> None:
    target = sys.argv[1]
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""
    files = (
        [os.path.join(target, f) for f in os.listdir(target) if not f.startswith(".")]
        if os.path.isdir(target)
        else [target]
    )
    total: dict[str, dict[str, int]] = {}
    for p in files:
        for desc, a in parse(p).items():
            if prefix and not desc.startswith(prefix):
                continue
            t = total.setdefault(
                desc,
                {"shuffle_write": 0, "shuffle_read": 0, "input": 0, "tasks": 0, "jobs": 0, "job_ms": 0},
            )
            for k in t:
                t[k] += a[k]
    for desc in sorted(total):
        a = total[desc]
        print(
            f"{desc or '<unlabelled>':45s} write={a['shuffle_write']/1e6:10.2f}MB "
            f"read={a['shuffle_read']/1e6:10.2f}MB input={a['input']/1e6:10.2f}MB "
            f"tasks={a['tasks']} jobs={a['jobs']} job_ms={a['job_ms']}"
        )


if __name__ == "__main__":
    main()
