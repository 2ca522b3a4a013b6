"""Capture .explain("formatted") for bench queries into plans/r07/.

Usage: python scripts/capture_plans_r07.py <suffix> [query ...]
Writes plans/r07/<query>_<suffix>.txt for each query (default: the
bench.py query list). Read-only — builds plans, runs nothing.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pdf2ontology_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "segment_spans", "doc_stats", "reassemble_text", "table_cells",
    "relationship_entries", "triples_all", "entities_distinct", "nodes",
    "edges", "canonical_nodes_lsh", "minhash_pairs", "simhash", "lang_id",
    "token_count", "ann_brute_topk", "assess_media", "embedding_cosine_pairs",
    "grid_row_maps", "preprocessed_media", "media_quality", "skew_rotation",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans_r07")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
