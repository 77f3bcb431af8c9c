"""Stage-level profile of the frontier admission round: runs the bench
round once (after warm-up), then pulls per-stage wall/task metrics from the
Spark UI REST API and prints the top stages by duration — the feedback loop
for finding the round's dominant cost.

Usage: python tools/profile_frontier.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_FRONTIER_MULT", "4")

    import bench
    from smartcrawler_spark.session import get_spark

    spark = get_spark(app_name="profile-frontier", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    bench.bench_frontier_round(spark, sf_dir)  # warm-up
    tracker_base = spark.sparkContext.uiWebUrl
    # mark the boundary: stages submitted after this are the measured round
    before = _stages(tracker_base)
    seen_ids = {s["stageId"] for s in before}
    r = bench.bench_frontier_round(spark, sf_dir)
    after = _stages(tracker_base)
    new = [s for s in after if s["stageId"] not in seen_ids
           and s["status"] == "COMPLETE"]
    new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    total_task_ms = sum(s.get("executorRunTime") or 0 for s in new)
    print(json.dumps({"round": r, "n_stages": len(new),
                      "total_task_time_ms": total_task_ms}))
    for s in new[:12]:
        dur = s.get("executorRunTime") or 0
        print(f'{dur/1000.0:8.2f}s task-time  {s.get("numCompleteTasks", "?"):>4} tasks  '
              f'shuffleRead={int((s.get("shuffleReadBytes") or 0)/1e6)}MB '
              f'shuffleWrite={int((s.get("shuffleWriteBytes") or 0)/1e6)}MB  '
              f'stage {s["stageId"]}: {s.get("name", "")[:90]}')
    spark.stop()


def _stages(ui_url: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui_url}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"))


if __name__ == "__main__":
    main()
