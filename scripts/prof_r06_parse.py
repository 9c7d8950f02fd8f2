"""Parse the event log written by prof_r06.py: per job-description stage
decomposition (stage wall, task time, python eval share, shuffle bytes)."""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str) -> None:
    job_desc: dict[int, str] = {}
    stage_to_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    task_metrics = defaultdict(lambda: defaultdict(float))
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description") or ""
                job_desc[jid] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:60],
                    "tasks": si.get("Number of Tasks"),
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                m = task_metrics[sid]
                m["run_ms"] += tm.get("Executor Run Time", 0)
                m["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                m["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                m["gc_ms"] += tm.get("JVM GC Time", 0)
                m["sched_ms"] += max(
                    0,
                    (ev.get("Task Info", {}).get("Launch Time", 0)) * 0,
                )
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                m["sh_read_mb"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                ) / 1e6
                m["fetch_ms"] += sr.get("Fetch Wait Time", 0)
                m["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                m["sh_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                inp = tm.get("Input Metrics") or {}
                m["input_mb"] += inp.get("Bytes Read", 0) / 1e6

    by_job: dict[int, list[int]] = defaultdict(list)
    for sid in stages:
        by_job[stage_to_job.get(sid, -1)].append(sid)

    for jid in sorted(by_job):
        desc = job_desc.get(jid, "?")
        sids = sorted(by_job[jid])
        tot_wall = sum(
            (stages[s]["done"] - stages[s]["sub"]) / 1000
            for s in sids
            if stages[s]["sub"] and stages[s]["done"]
        )
        if tot_wall < 0.15:
            continue
        print(f"\n== job {jid} [{desc}] stages_wall_sum={tot_wall:.2f}s")
        for s in sids:
            st = stages[s]
            if not (st["sub"] and st["done"]):
                continue
            wall = (st["done"] - st["sub"]) / 1000
            if wall < 0.1:
                continue
            m = task_metrics[s]
            print(
                f"  stage {s} wall={wall:6.2f}s tasks={st['tasks']:4d} "
                f"run={m['run_ms']/1000:7.1f}s cpu={m['cpu_ms']/1000:7.1f}s "
                f"gc={m['gc_ms']/1000:5.1f}s fetchwait={m['fetch_ms']/1000:5.1f}s "
                f"shR={m['sh_read_mb']:7.1f}MB shW={m['sh_write_mb']:7.1f}MB "
                f"in={m['input_mb']:7.1f}MB  {st['name']}"
            )


if __name__ == "__main__":
    main(sys.argv[1])
