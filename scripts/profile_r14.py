#!/usr/bin/env python3
"""Per-query stage/job profiling via the Spark UI REST API.

Usage: python3 scripts/profile_r14.py <name> [<name> ...]

For each query: runs it twice through the noop sink (second run = warm),
then reports jobs, stages, task counts, per-stage wall, shuffle bytes and
Python boundary time, from the REST API, for the WARM run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES
from ecommerce_analytics_platform_spark.session import get_spark


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_r14", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()
    base = "http://localhost:4040/api/v1"
    app_id = rest(base, "/applications")[0]["id"]
    app = f"{base}/applications/{app_id}"

    for name in names:
        fn, _sql = QUERIES[name]
        for warm in (0, 1):
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
            sc = spark.sparkContext
            sc.setJobGroup(f"q:{name}:{warm}", name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
        jobs = rest(app, "/jobs")
        mine = [j for j in jobs if j.get("jobGroup") == f"q:{name}:1"]
        stage_ids = sorted({s for j in mine for s in j["stageIds"]})
        n_tasks = sum(j["numTasks"] for j in mine)
        rows = []
        tot_sh_r = tot_sh_w = 0
        for sid in stage_ids:
            try:
                sg = rest(app, f"/stages/{sid}")
            except Exception:
                continue
            for att in sg:
                if att["status"] == "SKIPPED":
                    continue
                dur = (att.get("executorRunTime") or 0) / 1000.0
                subt = (att.get("completionTime") and att.get("firstTaskLaunchedTime"))
                sh_r = att.get("shuffleReadBytes", 0)
                sh_w = att.get("shuffleWriteBytes", 0)
                tot_sh_r += sh_r
                tot_sh_w += sh_w
                rows.append(
                    f"    stage {sid}: tasks={att['numCompleteTasks']} "
                    f"execRunSum={dur:.2f}s shR={sh_r/1e6:.2f}MB shW={sh_w/1e6:.2f}MB "
                    f"name={att['name'][:60]}"
                )
        print(f"== {name}: warm wall={wall:.3f}s jobs={len(mine)} "
              f"stages={len(stage_ids)} tasks={n_tasks} "
              f"shuffleR={tot_sh_r/1e6:.2f}MB shuffleW={tot_sh_w/1e6:.2f}MB")
        for r in rows:
            print(r)
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
