#!/usr/bin/env python3
"""Per-stage profile from a Spark event log (Accumulables-based).

Usage: evlog_stage_profile.py <events.json> <desc-substring> [topN]

Aggregates per stage: wall, executor run time, shuffle records
read/written, rows output (max accumulable), for jobs whose
description matches. Stages sorted by wall desc.
"""
import json
import sys

path, want = sys.argv[1], sys.argv[2]
topn = int(sys.argv[3]) if len(sys.argv) > 3 else 25

job_of_stage = {}
match_jobs = set()
stages = {}

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get("spark.job.description", "")
            if want in desc:
                match_jobs.add(e["Job ID"])
                for sid in e.get("Stage IDs", []):
                    job_of_stage[sid] = e["Job ID"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            if sid not in job_of_stage:
                continue
            t0, t1 = si.get("Submission Time"), si.get("Completion Time")
            s = stages.setdefault(sid, {})
            s["wall"] = (t1 - t0) / 1e3 if t0 and t1 else 0
            s["n"] = si.get("Number of Tasks", 0)
            s["job"] = job_of_stage[sid]
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            if sid not in job_of_stage:
                continue
            s = stages.setdefault(sid, {})
            for a in (e.get("Task Info") or {}).get("Accumulables", []):
                nm, up = a.get("Name", ""), a.get("Update")
                try:
                    up = int(up)
                except (TypeError, ValueError):
                    continue
                if nm == "internal.metrics.executorRunTime":
                    s["run"] = s.get("run", 0) + up
                elif nm == "internal.metrics.shuffle.read.recordsRead":
                    s["rin"] = s.get("rin", 0) + up
                elif nm == "internal.metrics.shuffle.write.recordsWritten":
                    s["rout"] = s.get("rout", 0) + up
                elif nm == "internal.metrics.shuffle.read.fetchWaitTime":
                    s["fetch"] = s.get("fetch", 0) + up
                elif nm == "internal.metrics.diskBytesSpilled":
                    s["spill"] = s.get("spill", 0) + up

rows = sorted(stages.items(), key=lambda kv: -kv[1].get("wall", 0))[:topn]
tot = sum(s.get("wall", 0) for _, s in stages.items())
print(f"total stage wall {tot:.1f}s across {len(stages)} stages "
      f"({len(match_jobs)} jobs)")
print(f"{'stage':>6s} {'job':>5s} {'wall':>7s} {'cpu':>8s} {'n':>4s} "
      f"{'recIn':>12s} {'recOut':>12s} {'spill':>9s}")
for sid, s in rows:
    print(f"{sid:6d} {s.get('job',-1):5d} {s.get('wall',0):7.2f} "
          f"{s.get('run',0)/1e3:8.2f} {s.get('n',0):4d} "
          f"{s.get('rin',0):12,} {s.get('rout',0):12,} "
          f"{s.get('spill',0)/1048576:8.1f}M")
