"""Join a Spark event log with bench_jobs.py phase boundaries: per phase,
list every job (SQL execution description, wall, stage operator scopes)
so the scheduling floor vs. compute split is visible.

Usage: python scripts/parse_events.py [phases_json] [event_log_path]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    phases_json = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/bench_jobs_phases.json"
    with open(phases_json) as f:
        ph = json.load(f)
    log_path = sys.argv[2] if len(sys.argv) > 2 \
        else f"/tmp/spark-events/{ph['app_id']}"

    jobs = {}          # jobId -> dict
    stage_info = {}    # stageId -> dict
    sql_desc = {}      # execId -> description
    with open(log_path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "exec": props.get("spark.sql.execution.id"),
                    "start": ev["Submission Time"] / 1000.0,
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "end": None,
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name")
                        except Exception:
                            nm = None
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stage_info[si["Stage ID"]] = {
                    "scopes": scopes,
                    "tasks": si.get("Number of Tasks", 0),
                    "wall": (comp - sub) / 1000.0 if sub and comp else None,
                }
            elif e and e.endswith("SparkListenerSQLExecutionStart"):
                sql_desc[str(ev.get("executionId"))] = \
                    ev.get("description", "")[:90].replace("\n", " ")

    def phase_of(t: float) -> str:
        for p in ph["phases"]:
            if p["t0"] <= t <= p["t1"] + 0.05:
                return p["name"]
        return "(outside)"

    by_phase = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        if j["end"] is None:
            continue
        by_phase[phase_of(j["start"])].append((jid, j))

    for p in ph["phases"]:
        name = p["name"]
        js = by_phase.get(name, [])
        tot = sum(j["end"] - j["start"] for _, j in js)
        gap = p["wall"] - tot
        print(f"\n== {name}: wall {p['wall']:.3f}s, {len(js)} jobs "
              f"(job-sum {tot:.3f}s, driver-gap {gap:.3f}s) ==")
        for jid, j in js:
            w = j["end"] - j["start"]
            d = sql_desc.get(str(j["exec"]), "")
            parts = []
            for sid in j["stages"]:
                si = stage_info.get(sid)
                if si and si["wall"] is not None:
                    sc = ",".join(si["scopes"][:4])
                    parts.append(f"[{si['tasks']}t {si['wall']:.2f}s {sc}]")
            print(f"  job {jid}: {w:6.3f}s exec={j['exec']} ({d})")
            for pt in parts:
                print(f"      {pt}")
    js = by_phase.get("(outside)", [])
    if js:
        tot = sum(j['end'] - j['start'] for _, j in js)
        print(f"\n== outside phases: {len(js)} jobs, {tot:.3f}s ==")


if __name__ == "__main__":
    main()
