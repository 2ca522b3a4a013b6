"""Physical-plan audit: dump .explain("formatted") for the headline
queries and grep for the properties that matter at 100 TB —
PushedFilters reaching the scan, pruned ReadSchema, WholeStageCodegen
coverage, exchange (shuffle) count, broadcast usage. Writes PLANS.md.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from pdf2ontology_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

AUDIT = [
    "triples_all",
    "nodes",
    "edges",
    "canonical_nodes_lsh",
    "minhash_pairs",
    "dedup_clusters",
    "simhash_pairs",
    "embedding_cosine_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "grid_row_maps",
    "preprocessed_media",
    "media_quality",
    "skew_rotation",
    "content_layout",
    "shipping_priority",
    "sessionize",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = [
        """# PLANS.md — physical-plan audit (sf0.01, local[32] conf)

How to read this (the 100 TB checklist):
- **PushedFilters** at every parquet scan — kind/key predicates reach
  the reader, so a 100 TB scan only decodes matching row groups.
- **ReadSchema** pruned to used columns — the TPC-H-style queries read
  3-4 columns, not the table; the spans scans read the full nested
  struct because every field is consumed.
- **Exchange count** = shuffle budget (NOTE: formatted explain prints
  each node twice — tree + detail — so the raw counts below are 2x the
  physical node count). triples_all is the FUSED single-scan plan:
  FileScan -> Project -> Generate, ONE corpus read, zero extraction
  shuffles (its only exchange is the loader's small-file repartition,
  which disappears at bench scale where row-group splits cover the
  cores). The LSH canonicalization is the most exchange-heavy plan by
  design (blocking join + iterative components) and is exactly the
  stage the north rule says to pay for.
- **Broadcast** on every dimension-sided join (region/nation rollup,
  query-side of ANN, minhash band self-join probe side).
- Whole-stage codegen covers the expression spine everywhere; the
  Python stages in the engine are all Arrow-batched mapInPandas/
  pandas_udf kernels: the media decode family, the round-7 fused grid
  kernel (operators/grid_fused.py — replaces 4 window shuffles of
  interpreted array lambdas), the banded-LSH signature kernel, and the
  connected-components union-find. No row-at-a-time BatchEvalPython
  anywhere.
"""
    ]
    for name in AUDIT:
        plan = plan_of(qs[name](spark, SF))
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bcast = len(re.findall(r"BroadcastExchange|BroadcastHashJoin", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_nonempty = [p for p in pushed if p.strip()]
        scans = re.findall(r"ReadSchema: ([^\n]+)", plan)
        out.append(f"## {name}\n")
        n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        out.append(
            f"- parquet scans: {n_scans}; "
            f"exchanges (raw matches, 2x per node): {n_exchange}; "
            f"broadcast joins/exchanges: {n_bcast}\n"
            f"- scans with pushed filters: {len(pushed_nonempty)}/{len(pushed)}\n"
        )
        for s in scans[:4]:
            out.append(f"- ReadSchema: `{s[:160]}`\n")
        out.append("\n<details><summary>full plan</summary>\n\n```\n" + plan + "```\n</details>\n")
    spark.stop()
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
