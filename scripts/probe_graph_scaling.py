"""Ad-hoc two-level probe for ONE job family — the fast iteration loop
behind the full protocol in bench_scaling.py. Runs the graph job (or
triples with --triples) at local[N] for each level, reports wall
seconds and total task CPU-seconds (from the Spark event log), and the
N -> 4N CPU-inflation ratio the round-6 shuffle-narrowing work targets.

Usage: python scripts/probe_graph_scaling.py [tag] [levels...]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVDIR = "/tmp/graft_eventlog_probe"

WORKER = r"""
import glob, json, os, sys, time
sys.path.insert(0, %(repo)r)
from pdf2ontology_spark import synth
from pdf2ontology_spark.session import get_spark
from pdf2ontology_spark.operators import graph
import __spark_entry__ as e

TAG = %(tag)r
synth.ensure_synth(TAG)
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId

def force(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0

ckpt = "/tmp/graft_probe_triples_" + TAG
if not os.path.exists(ckpt + "/_SUCCESS"):
    (e.q_triples_all(spark, TAG).repartition(64, "doc_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024 * 1024).parquet(ckpt))

t = spark.read.parquet(ckpt)
force(graph.nodes(t))  # warmup
walls, windows = [], []
for _ in range(%(reps)d):
    w0 = time.time() * 1000
    walls.append(force(graph.nodes(t)) + force(graph.edges(t)))
    windows.append((w0, time.time() * 1000))
spark.stop()

# metrics from the MIN-WALL rep only — the least-contended sample on a
# host whose load swings 0 -> 20 within minutes
best = min(range(len(walls)), key=lambda i: walls[i])
w0, w1 = windows[best]
cpu_ms = 0
shuf_w = 0
shuf_recs = 0
for path in glob.glob(os.path.join(%(evdir)r, app_id + "*")):
    with open(path) as f:
        for line in f:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            fin = ev.get("Task Info", {}).get("Finish Time", 0)
            if w0 <= fin <= w1:
                tm = ev.get("Task Metrics") or {}
                cpu_ms += tm.get("Executor Run Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                shuf_w += sw.get("Shuffle Bytes Written", 0)
                shuf_recs += sw.get("Shuffle Records Written", 0)
print("RESULT " + json.dumps({
    "walls": walls,
    "cpu_s": cpu_ms / 1000.0,
    "shuffle_mb": shuf_w / 1e6,
    "shuffle_records": shuf_recs,
}))
"""


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "sfxl"
    levels = [int(x) for x in sys.argv[2:]] or [4, 16]
    os.makedirs(EVDIR, exist_ok=True)
    out = {}
    for lv in levels:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(lv),
            SPARK_GRAFT_EVENTLOG=EVDIR,
        )
        code = WORKER % {"repo": REPO, "tag": tag, "reps": 3, "evdir": EVDIR}
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(r.stdout[-2000:], r.stderr[-2000:])
            raise SystemExit(f"worker failed at local[{lv}]")
        out[lv] = json.loads(line[0][7:])
        print(
            f"local[{lv}]: walls={out[lv]['walls']} cpu_s={out[lv]['cpu_s']:.1f} "
            f"shuffle_mb={out[lv]['shuffle_mb']:.1f} "
            f"shuffle_records={out[lv]['shuffle_records']:.0f}"
        )
    if len(levels) == 2:
        a, b = levels
        wa, wb = min(out[a]["walls"]), min(out[b]["walls"])
        print(
            f"speedup {wa / wb:.2f}x, efficiency {(wa / wb) / (b / a):.2f}, "
            f"cpu inflation {out[b]['cpu_s'] / out[a]['cpu_s']:.2f}x"
        )


if __name__ == "__main__":
    main()
