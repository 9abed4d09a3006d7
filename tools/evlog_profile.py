#!/usr/bin/env python3
"""Offline profile of a Spark event log written via SPARK_GRAFT_EVENTLOG.

Usage: evlog_profile.py <eventlog-file> [desc-substring]

Prints one line per job (id, wall seconds, description, #tasks) and,
with a filter, a per-stage breakdown (stage name, wall, task time,
shuffle read/write bytes, spill) for the matching jobs — the guide-§7
"which stage is slow" readout without a live UI.
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1]
want = sys.argv[2] if len(sys.argv) > 2 else None

jobs = {}        # id -> dict
stages = {}      # id -> dict
stage_job = {}   # stage id -> job id

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = e.get("Properties", {}).get(
                "spark.job.description", "")
            jobs[jid] = {"desc": desc, "t0": e["Submission Time"],
                         "t1": None, "stages": e.get("Stage IDs", [])}
            for sid in e.get("Stage IDs", []):
                stage_job[sid] = jid
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            t0 = si.get("Submission Time")
            t1 = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", ""),
                "wall": (t1 - t0) / 1e3 if t0 and t1 else 0.0,
                "tasks": si.get("Number of Tasks", 0),
            }
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            s = stages.setdefault(sid, {"name": "?", "wall": 0.0,
                                        "tasks": 0})
            s["task_ms"] = s.get("task_ms", 0) + \
                m.get("Executor Run Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            s["sh_read"] = s.get("sh_read", 0) + \
                sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            s["sh_write"] = s.get("sh_write", 0) + \
                sw.get("Shuffle Bytes Written", 0)
            s["spill"] = s.get("spill", 0) + m.get("Disk Bytes Spilled", 0)
            s["rows_read"] = s.get("rows_read", 0) + \
                sr.get("Total Records Read", 0)

def mb(x): return f"{x/1048576:8.1f}M"

bydesc = defaultdict(float)
print("== jobs ==")
for jid in sorted(jobs):
    j = jobs[jid]
    if j["t1"] is None:
        continue
    wall = (j["t1"] - j["t0"]) / 1e3
    bydesc[j["desc"]] += wall
    if want and want not in j["desc"]:
        continue
    print(f"job {jid:4d} {wall:8.3f}s  {j['desc'][:60]:60s} "
          f"stages={len(j['stages'])}")
    if want:
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or "task_ms" not in s:
                continue
            print(f"   stage {sid:5d} wall={s['wall']:7.2f}s "
                  f"taskcpu={s.get('task_ms',0)/1e3:8.2f}s "
                  f"n={s['tasks']:4d} shR={mb(s.get('sh_read',0))} "
                  f"shW={mb(s.get('sh_write',0))} "
                  f"rowsR={s.get('rows_read',0):>12,} "
                  f"spill={mb(s.get('spill',0))}  {s['name'][:70]}")

print("\n== wall by description ==")
for d, w in sorted(bydesc.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{w:9.3f}s  {d[:90]}")
