"""Stage-level attribution for the N→4N scaling gap: run the bench
pipeline once per level with the Spark UI enabled, pull per-stage wall
times from the UI REST API, and print the stages whose share of wall
GROWS at the large level — the serialization locus, if any.

Usage: python scripts/scaling_stages.py [small_cores] [large_cores] [sf]
(defaults 4 16 20). Run on an otherwise idle machine; one run per level
(this is a diagnosis tool, not the headline protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.environ["REPO"])
from pdf_parser_spark import corpus
from pdf_parser_spark.extraction import run_pipeline
from pdf_parser_spark.session import get_spark

sf = float(os.environ["SF"])
spark = get_spark(cores=int(os.environ["SPARK_GRAFT_CPUS"]))
# spark.ui.enabled is a static conf — set via SPARK_GRAFT_EXTRA_CONF at build
spark.sparkContext.setLogLevel("ERROR")
path = os.environ.get("CORPUS_DIR") or os.path.join(
    os.environ["REPO"], ".cache", f"bench_corpus_sf{sf}.parquet"
)
docs = spark.read.parquet(path)

def one():
    t0 = time.perf_counter()
    out = run_pipeline(spark, docs)
    for name in ("extracted_spans", "extracted", "doc_stats"):
        out[name].write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt

one()  # warmup
# mark the timed run via a job group so warmup stages can be excluded
sc = spark.sparkContext
sc.setJobGroup("timed", "timed run")
wall = one()
ui = sc.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
stages = json.load(
    urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
)
print("RESULT " + json.dumps({
    "wall": wall,
    "stages": [
        {
            "id": s["stageId"],
            "attempt": s["attemptId"],
            "name": s["name"].split("\n")[0][:90],
            "executorRunTime_s": round(s["executorRunTime"] / 1000.0, 2),
            "executorCpuTime_s": round(s["executorCpuTime"] / 1e9, 2),
            "tasks": s["numCompleteTasks"],
            "shuffleRead_MB": round(s["shuffleReadBytes"] / 1e6, 1),
            "shuffleWrite_MB": round(s["shuffleWriteBytes"] / 1e6, 1),
            "submitted": s.get("firstTaskLaunchedTime"),
        }
        for s in stages
    ],
}))
spark.stop()
"""


def run_level(cores: int, sf: float) -> dict:
    n_exec = max(1, cores // 4)
    env = dict(
        os.environ,
        REPO=REPO,
        SF=str(sf),
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},4,12288]",
        SPARK_LOCAL_DIRS="/dev/shm/sparktmp",
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_EXTRA_CONF="spark.ui.enabled=true",
    )
    cmd = [sys.executable, "-c", DRIVER]
    if cores < (os.cpu_count() or cores):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level {cores} failed")
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main():
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    s = run_level(small, sf)
    l = run_level(large, sf)
    print(json.dumps({"small": s, "large": l}))


if __name__ == "__main__":
    main()
