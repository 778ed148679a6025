"""Drive cluster_bench.py at TWO CLUSTER SIZES (N=1 executor, 4N=4
executors) on a real Spark standalone cluster and record the executor
scaling efficiency — the north rule's literal shape, evidenced with
separate executor JVMs instead of local[N] task slots.

Cluster recipe (one host; each worker pinned to a DISJOINT 2-core set so
executors own exactly their cores — the same accounting discipline as
scaling_bench.py's taskset levels):

    SPARK_HOME=$(python -c "import pyspark,os;print(os.path.dirname(pyspark.__file__))")
    $SPARK_HOME/bin/spark-class org.apache.spark.deploy.master.Master \
        --host 127.0.0.1 --port 7077 &
    for i in 0 1 2 3; do
      taskset -c $((i*2))-$((i*2+1)) $SPARK_HOME/bin/spark-class \
        org.apache.spark.deploy.worker.Worker spark://127.0.0.1:7077 \
        --cores 2 --memory 12g --host 127.0.0.1 &
    done

Then: python run_cluster_bench.py  (env: ROWS, ROUNDS, MASTER)

Configs are interleaved ABAB across rounds so shared-host load drift
hits both equally; best round per config is kept. Efficiency =
gbps(4 executors) / (4 * gbps(1 executor)). Results ->
BENCH/cluster_scaling_latest.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CONFIGS = {
    "n1": ["--total-executor-cores", "2"],   # 1 executor x 2 cores
    "n4": ["--total-executor-cores", "8"],   # 4 executors x 2 cores
}


def submit(label: str, rows: int, master: str) -> dict:
    cmd = ["spark-submit", "--master", master,
           "--py-files", "dist/sparkolumnar.zip",
           "--driver-memory", "8g",
           "--executor-cores", "2", "--executor-memory", "10g",
           *CONFIGS[label],
           "cluster_bench.py", "--rows", str(rows), "--repeats", "2",
           "--label", label,
           "--total-cores", CONFIGS[label][-1]]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"{label} failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    rows = int(os.environ.get("ROWS", "500000"))
    rounds = int(os.environ.get("ROUNDS", "3"))
    master = os.environ.get("MASTER", "spark://127.0.0.1:7077")
    best: dict = {}
    for r in range(rounds):
        for label in ("n1", "n4"):
            res = submit(label, rows, master)
            print(f"round {r} {label}: {res}", file=sys.stderr)
            if label not in best or res["gbps"] > best[label]["gbps"]:
                best[label] = res
    eff = round(best["n4"]["gbps"] / (4 * best["n1"]["gbps"]), 3)
    out = {"rows": rows, "rounds": rounds, "master": master,
           "workers": "4 x 2-core JVMs, disjoint taskset pins",
           "path": "hybrid (encode_table_direct_write, durable blocks)",
           "one_executor": best["n1"], "four_executors": best["n4"],
           "executor_scaling_efficiency_1_to_4": eff}
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cluster_scaling_latest.json", "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
