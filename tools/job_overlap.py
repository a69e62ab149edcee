"""Job-concurrency report from a Spark event log (VERDICT r15 ask #7):
do the SOM CV folds / grid candidates actually overlap on the scheduler,
or do the concurrent driver threads serialize?

Reads rolling-v2 event-log dirs (zstd-compressed events files) or plain
files, lists every job's [submit, complete] window, and reports the
maximum number of jobs in flight plus the overlap fraction
(sum of job durations / wall span — >1.0 means real overlap).

Usage: python tools/job_overlap.py <eventlog-dir-or-file> [desc-filter]
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys


def _lines(path: str):
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.startswith("events_"):
                    fp = os.path.join(root, f)
                    if f.endswith(".zstd"):
                        out = subprocess.run(
                            ["zstd", "-d", "-c", fp], capture_output=True, check=True
                        ).stdout
                        yield from io.BytesIO(out).read().decode().splitlines()
                    else:
                        yield from open(fp)
    else:
        yield from open(path)


def main() -> int:
    path = sys.argv[1]
    filt = sys.argv[2] if len(sys.argv) > 2 else None
    jobs: dict[int, dict] = {}
    for line in _lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "submit": ev.get("Submission Time", 0),
                "desc": (ev.get("Properties") or {}).get("spark.job.description", ""),
            }
        elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["complete"] = ev.get("Completion Time", 0)
    rows = [
        (j["submit"], j["complete"], jid, j["desc"])
        for jid, j in jobs.items()
        if "complete" in j and (filt is None or filt in j["desc"])
    ]
    rows.sort()
    if not rows:
        print("no jobs matched")
        return 1
    events = []
    for s, c, _jid, _d in rows:
        events.append((s, 1))
        events.append((c, -1))
    events.sort()
    cur = peak = 0
    for _t, d in events:
        cur += d
        peak = max(peak, cur)
    span = max(c for _s, c, _j, _d in rows) - min(s for s, _c, _j, _d in rows)
    total = sum(c - s for s, c, _j, _d in rows)
    print(
        json.dumps(
            {
                "n_jobs": len(rows),
                "wall_span_ms": span,
                "sum_job_ms": total,
                "overlap_factor": round(total / span, 3) if span else None,
                "peak_concurrent_jobs": peak,
            }
        )
    )
    for s, c, jid, d in rows:
        print(f"  job {jid:>4} {c - s:>7} ms  {d[:80]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
