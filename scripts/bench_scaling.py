"""Two-parallelism scaling evidence (BASELINE.json north_rule).

Runs the triple-extraction job and the full graph job in fresh
subprocesses at local[8] and local[32] on the SAME input (the sfxl
synthetic corpus, 150k docs — large enough that compute dominates fixed
per-query overheads), takes the best of 3 in-session repetitions, and
writes BENCH/BASELINE.md with throughput at both levels plus scaling
efficiency = (T_8 / T_32) / 4.

The sandbox host is noisy (idle load avg ~10; identical reps vary up to
4x under contention), so the MINIMUM rep (least-contended estimate) is
reported. Run this script with nothing else executing on the machine.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import time, sys, json
sys.path.insert(0, %(repo)r)
from pdf2ontology_spark import synth
from pdf2ontology_spark.session import get_spark
import __spark_entry__ as e

synth.ensure_synth("sfxxl")
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

def force(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0

reps = {"triples": [], "graph": []}
for _ in range(3):
    reps["triples"].append(force(e.q_triples_all(spark, "sfxxl")))
    reps["graph"].append(force(e.q_nodes(spark, "sfxxl")) + force(e.q_edges(spark, "sfxxl")))
n = e.q_triples_all(spark, "sfxxl").count()
spark.stop()
print(json.dumps({"reps": reps, "n_triples": n}))
"""


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    lo_cpus, hi_cpus = 8, 32
    lo, hi = run(lo_cpus), run(hi_cpus)
    n = lo["n_triples"]
    rows = []
    for job in ("triples", "graph"):
        t_lo = min(lo["reps"][job])
        t_hi = min(hi["reps"][job])
        speedup = t_lo / t_hi
        eff = speedup / (hi_cpus / lo_cpus)
        rows.append((job, t_lo, t_hi, speedup, eff))

    md = f"""# BENCH/BASELINE.md — measured scaling (two parallelism levels)

Same code, same input (sfxl synthetic corpus: 600k interleaved docs,
{n} triples), only the `local[N]` core count differs — the sandbox
stand-in for N vs 4N executor clusters per BASELINE.json north_rule.
Best (min) of 3 in-session repetitions (noisy shared host).

| job | local[{lo_cpus}] (s) | local[{hi_cpus}] (s) | speedup | scaling efficiency |
|---|---|---|---|---|
"""
    for job, t_lo, t_hi, sp, eff in rows:
        md += f"| {job} | {t_lo:.2f} | {t_hi:.2f} | {sp:.2f}x | {eff:.2f} |\n"
    t_lo, t_hi = rows[0][1], rows[0][2]
    md += f"""
triples/sec: local[{lo_cpus}] = {n / t_lo:,.0f}, local[{hi_cpus}] = {n / t_hi:,.0f}

raw local[{lo_cpus}]: `{json.dumps(lo)}`

raw local[{hi_cpus}]: `{json.dumps(hi)}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
