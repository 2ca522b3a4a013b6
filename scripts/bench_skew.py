"""Heavy-tail skew evidence (north rule: "salted repartitioning on
doc_id hash to tame skew from media-heavy documents").

Corpus: the ``sfskew`` synthetic tag — 20k interleaved docs where 1%
carry 300-500 media spans (~100x the typical load), the shape a crawl
with image-gallery pages exhibits. On this corpus the bench runs the
SAME Arrow-batched media-quality stage twice:

- **unsalted**: the media spans keep a doc_id-hash partitioning — the
  partitioning every doc-keyed upstream stage (extraction, grouping)
  naturally leaves behind, and what a naive pipeline would feed the
  decode stage;
- **salted**: the production path (``_media_base``) — repartition on
  ``xxhash64(doc_id, media_ref)``, so one doc's media fans out across
  the cluster.

For each mode it reports (a) the PARTITION ROW-COUNT histogram
(deterministic — host-noise-free evidence of the imbalance the salt
removes), (b) wall seconds, and (c) the per-task run-time p50/p95/max
from the Spark event log. The partition count is ``tasks_per_core *
cores`` — sized like a real cluster (a few waves per core), which is
exactly the regime where one pinned partition stalls the stage tail.

The companion plan guard (tests/test_plans.py::
test_media_stages_salt_on_composite_key) pins the salted exchange in
the production plan so this property cannot silently regress.

Usage: python scripts/bench_skew.py [tag] [n_part]
Writes BENCH/SKEW_r6.md style output to stdout as JSON lines.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVDIR = "/tmp/graft_eventlog_skew"

WORKER = r"""
import glob, json, os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
from pdf2ontology_spark import synth
from pdf2ontology_spark.session import get_spark
from pdf2ontology_spark.operators import media, segment
from pdf2ontology_spark.sources import tables
from pyspark.sql import functions as F

TAG = %(tag)r
N_PART = %(n_part)d
synth.ensure_synth(TAG)
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId
# explode AFTER any repartition: explode is narrow, so a doc_id-hash
# layout of the nested docs is exactly the doc-keyed layout the
# exploded spans inherit (the shape upstream doc-keyed stages leave)
docs = tables.load_documents_spans(spark, TAG)
spans = segment.explode_spans(docs)

def run(mode):
    doc_keyed = segment.explode_spans(docs.repartition(N_PART, F.xxhash64("doc_id")))
    if mode == "salted":
        df = media.media_quality(spans, salt=True)
    else:
        # doc-keyed layout feeding an UNSALTED stage: repartition the
        # docs by doc_id hash, explode, keep that layout (salt=False)
        df = media.media_quality(doc_keyed, salt=False)
    # (a) deterministic partition-size histogram of the stage input
    base = media._media_base(
        doc_keyed if mode == "unsalted" else spans,
        None,
        salt=(mode == "salted"),
    )
    sizes = (
        base.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .toPandas()["count"]
        .to_numpy()
    )
    sizes = np.sort(np.concatenate([sizes, np.zeros(max(0, N_PART - len(sizes)))]))
    hist = {
        "n_part": int(len(sizes)),
        "rows_total": int(sizes.sum()),
        "rows_mean": float(sizes.mean()),
        "rows_p50": float(np.percentile(sizes, 50)),
        "rows_p95": float(np.percentile(sizes, 95)),
        "rows_max": int(sizes.max()),
        "max_over_mean": float(sizes.max() / sizes.mean()),
    }
    # (b) wall: warmup once, then %(reps)d timed reps with per-rep
    # event-time windows — the task histogram is computed from the
    # MIN-WALL rep only, the least host-noise-contaminated sample
    def force():
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0
    force()
    walls, windows = [], []
    for _ in range(%(reps)d):
        w0 = time.time() * 1000
        walls.append(force())
        windows.append((w0, time.time() * 1000))
    return hist, walls, windows

mode = %(mode)r
spark.conf.set("spark.sql.shuffle.partitions", str(N_PART))
hist, walls, windows = run(mode)
spark.stop()

# (c) task run-time histogram for the min-wall rep's window
w0, w1 = windows[int(np.argmin(walls))]
task_ms = []
for path in glob.glob(os.path.join(%(evdir)r, app_id + "*")):
    with open(path) as f:
        for line in f:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            fin = ev.get("Task Info", {}).get("Finish Time", 0)
            if w0 <= fin <= w1:
                task_ms.append((ev.get("Task Metrics") or {}).get("Executor Run Time", 0))
task_ms = sorted(task_ms)
tstats = {}
if task_ms:
    arr = np.array(task_ms, dtype=float)
    tstats = {
        "n_tasks": len(task_ms),
        "task_p50_ms": float(np.percentile(arr, 50)),
        "task_p95_ms": float(np.percentile(arr, 95)),
        "task_max_ms": float(arr.max()),
        "p95_over_p50": float(np.percentile(arr, 95) / max(1.0, np.percentile(arr, 50))),
    }
print("RESULT " + json.dumps({
    "mode": mode, "partition_rows": hist, "walls": walls, "tasks": tstats,
}))
"""


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "sfskew"
    n_part = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    os.makedirs(EVDIR, exist_ok=True)
    for mode in ["unsalted", "salted"]:
        env = dict(os.environ, SPARK_GRAFT_EVENTLOG=EVDIR)
        code = WORKER % {
            "repo": REPO,
            "tag": tag,
            "n_part": n_part,
            "mode": mode,
            "evdir": EVDIR,
            "reps": int(os.environ.get("SPARK_GRAFT_SKEW_REPS", "4")),
        }
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(r.stdout[-3000:], r.stderr[-3000:])
            raise SystemExit(f"worker failed for mode={mode}")
        print(line[0][7:])


if __name__ == "__main__":
    main()
