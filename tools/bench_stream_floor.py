"""Streaming fixed-cost floor measurement (round-13 verdict #8).

The streaming family is ~40% of the bench total. How much of each
query's wall time is the irreducible cost of exercising the REAL
Structured Streaming path (spool + checkpoint + query start/stop +
availableNow drain), as opposed to engine work this repo controls?

Measures, in one warm session (medians over ``runs``):
  a. no-op drain: 1-row JSON spool -> readStream -> foreachBatch(pass)
     -> availableNow -> awaitTermination, FRESH checkpoint each time.
     This is the floor any per-query streaming bench entry pays.
  b. the same with a SECOND drain over the SAME checkpoint (no new
     data): the restart-resume cost.
  c. a stateful no-op: groupBy count into complete mode memory-less
     foreachBatch — adds state-store setup at the capped partition
     count (queries_streaming._STREAM_SHUFFLE_PARTITIONS).

Usage: python tools/bench_stream_floor.py [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalable_etl_spark.session import tune_session  # noqa: E402


def _spool(tmp: str) -> str:
    d = os.path.join(tmp, "src")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "a.json"), "w") as fh:
        fh.write('{"k": 1, "v": "x"}\n')
    return d


def _drain(spark, src, ckpt, stateful=False):
    df = spark.readStream.schema("k INT, v STRING").json(src)
    if stateful:
        df = df.groupBy("k").count()
    q = (
        df.writeStream.foreachBatch(lambda b, i: b.count())
        .outputMode("complete" if stateful else "append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    tmp = tempfile.mkdtemp(prefix="streamfloor_")
    src = _spool(tmp)

    # warm the streaming machinery once (JIT, source/sink classloads)
    _drain(spark, src, os.path.join(tmp, "warm"))
    _drain(spark, src, os.path.join(tmp, "warm_state"), stateful=True)

    fresh, resume, state = [], [], []
    for i in range(runs):
        ck = os.path.join(tmp, f"ck{i}")
        t0 = time.perf_counter()
        _drain(spark, src, ck)
        fresh.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _drain(spark, src, ck)  # same checkpoint, nothing new
        resume.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _drain(spark, src, os.path.join(tmp, f"cks{i}"), stateful=True)
        state.append(time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "stream_fixed_floor_sec",
                "runs": runs,
                "fresh_noop_drain": round(statistics.median(fresh), 3),
                "resume_empty_drain": round(statistics.median(resume), 3),
                "fresh_stateful_drain": round(statistics.median(state), 3),
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
