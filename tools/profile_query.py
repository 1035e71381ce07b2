"""Per-stage profile of contract queries (round-13 optimization tool).

Runs named queries() entries (or bench SCALE_PROBES) at
$SPARK_GRAFT_SF_DIR with the Spark UI's REST API enabled, times a noop
write, and prints the heaviest stages (executor run time, task count,
input/shuffle bytes) so the expensive operator inside a multi-stage
query is visible without the UI.

Usage: python tools/profile_query.py [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from blackroad_data_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = get_spark("profile", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": os.environ.get("SPARK_GRAFT_UI_PORT", "4049"),
    })
    # extra_conf is ignored when a session already exists in this
    # interpreter (getOrCreate reuses it) — fail with a clear message
    # instead of an AttributeError on uiWebUrl (ADVICE r13)
    if spark.sparkContext.uiWebUrl is None:
        sys.exit("profile_query: Spark UI is disabled — a session "
                 "created before this tool ran owns the process; "
                 "run profile_query.py in a FRESH python process")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}"
    app_id = spark.sparkContext.applicationId

    # warm JVM + Arrow pool like bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32, numPartitions=32).select(_warm("id")).collect()

    queries = dict(entry_mod.queries())
    try:
        import bench
        queries.update(bench.SCALE_PROBES)
    except Exception:
        pass

    def stages():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    unknown = [n for n in args if n not in queries]
    if unknown:
        sys.exit(f"profile_query: unknown query name(s) {unknown} — "
                 "valid names are queries() entries and bench "
                 "SCALE_PROBES keys")
    for name in args:
        fn = queries[name]
        # one warm run, then the measured run delimited by stage ids
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        new = [s for s in stages() if s["stageId"] not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: build {t1 - t0:.2f}s exec {t2 - t1:.2f}s "
              f"total {t2 - t0:.2f}s, {len(new)} stages ===")
        for s in new[:12]:
            print(f"  stage {s['stageId']:>5} runtime {s['executorRunTime']/1e3:7.2f}s "
                  f"tasks {s['numCompleteTasks']:>4} "
                  f"in {s.get('inputBytes', 0)/1e6:8.1f}MB "
                  f"sh_r {s.get('shuffleReadBytes', 0)/1e6:8.1f}MB "
                  f"sh_w {s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB  "
                  f"{(s.get('description') or s.get('name', ''))[:80]}")


if __name__ == "__main__":
    main()
