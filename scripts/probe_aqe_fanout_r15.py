"""Round-15 verdict-item-8 probe: do the AQE-coalesced packed Arrow
stages fan back out when stage bytes exceed the advisory partition
size (i.e. at cluster-scale bytes)? Runs each query with default AQE
sizing and with a 16KB advisory, reporting per-stage task counts.
"""
import sys, time, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os; os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from time_series_spark_spark.session import get_spark
from time_series_spark_spark.queries import REGISTRY

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("aqe_probe")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()

NAMES = ["events_matrix_profile_type", "events_dominant_period",
         "forecast_croston_purchases"]

def run(name, advisory=None):
    if advisory is not None:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    else:
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionSize")
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    before = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j not in before]
    stage_tasks = []
    for j in jobs:
        info = tracker.getJobInfo(j)
        for sid in (info.stageIds if info else []):
            si = tracker.getStageInfo(sid)
            if si is not None and si.numTasks > 0:
                stage_tasks.append(si.numTasks)
    return {"name": name, "advisory": advisory, "sec": round(dt, 3),
            "stage_tasks": stage_tasks}

for name in NAMES:
    for adv in (None, "16KB"):
        print(json.dumps(run(name, adv)), flush=True)
