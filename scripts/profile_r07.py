"""Stage-isolation profiling for the round-7 optimization work (guide
§1.4: noop-sink timing of plan fragments). NOT the frozen bench.py —
this exists to attribute time inside the expensive queries.

Usage: python scripts/profile_r07.py [stage ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from pdf2ontology_spark.operators import dedup, grid, linking, similarity  # noqa: E402
from pdf2ontology_spark.session import get_spark  # noqa: E402
from pdf2ontology_spark.sources import tables  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def run(spark, name, make):
    spark.sparkContext.setJobDescription(name)
    ts = [round(noop(make()), 3) for _ in range(3)]
    print(f"{name:45s} min={min(ts):7.3f}  reps={ts}", flush=True)
    spark.sparkContext.setJobDescription(None)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="profile_r07")
    spark.sparkContext.setLogLevel("ERROR")

    def want(tag):
        return not only or tag in only

    if want("emb"):
        emb = tables.load_table(spark, SF, "embeddings")
        n = tables.table_rows(SF, "embeddings")
        dim = tables.embedding_dim(SF)
        ppb = similarity.planes_for_corpus(n)
        run(spark, "emb:signatures", lambda: similarity.banded_signatures(
            emb, "vec_id", "embedding", ppb, 12, dim))
        run(spark, "emb:candidates", lambda: dedup.embedding_candidates(
            emb, "vec_id", "embedding", None, 12, n=n, dim=dim))
        run(spark, "emb:pairs(full)", lambda: dedup.embedding_cosine_pairs(
            emb, threshold=0.45, n=n, dim=dim))
        print("candidate count:", dedup.embedding_candidates(
            emb, "vec_id", "embedding", None, 12, n=n, dim=dim).count())

    if want("grid"):
        d = tables.load_detections(spark, SF)
        run(spark, "grid:detections-scan", lambda: d)
        run(spark, "grid:band_arrays", lambda: grid.band_arrays(d))
        run(spark, "grid:assigned", lambda: entry._grid_assigned(spark, SF)[0])
        run(spark, "grid:final(spanning)", lambda: entry._grid_final(spark, SF))
        run(spark, "grid:row_maps(full)", lambda: entry.q_grid_row_maps(spark, SF))

    if want("link"):
        t = entry._triples_stage(spark, SF)
        run(spark, "link:triples-stage", lambda: t)
        # mirror canonicalize(): surf CACHED, reps via one groupBy-min —
        # an uncached surf + distinct-based reps expands the upstream
        # plan 4x inside candidate_pairs and times a composition the
        # production path never runs (measured 32s vs 0.8s for the full
        # query)
        surf = linking.exact_contract(linking.surfaces(t)).cache()
        run(spark, "link:surfaces+contract", lambda: surf)
        reps = surf.groupBy("key", "entity_type").agg(
            F.min("surface_id").alias("surface_id")
        ).select("surface_id", "entity_type", "key")
        run(spark, "link:candidate_pairs", lambda: linking.candidate_pairs(reps))
        surf.unpersist()
        run(spark, "link:canonical_nodes(full)", lambda: entry.q_canonical_nodes_lsh(spark, SF))

    if want("media"):
        run(spark, "media:preprocessed(full)", lambda: entry.q_preprocessed_media(spark, SF))
        run(spark, "media:assess_media(jvm)", lambda: entry.q_assess_media(spark, SF))
        from pdf2ontology_spark.operators import condition, media
        sp = entry._spans(spark, SF)
        bl = entry._blobs(spark, SF)
        run(spark, "media:blob-join-only", lambda: media._media_base(sp, bl))
        run(spark, "media:quality(full)", lambda: media.media_quality(sp, bl))
        run(spark, "media:skew(full)", lambda: media.assess_media_full(sp, bl))

    if want("entries"):
        run(spark, "entries:relationship(full)", lambda: entry.q_relationship_entries(spark, SF))
        run(spark, "entries:table_cells", lambda: entry.q_table_cells(spark, SF))
        run(spark, "entries:triples_all", lambda: entry.q_triples_all(spark, SF))

    if want("graph"):
        run(spark, "graph:edges(full)", lambda: entry.q_edges(spark, SF))
        run(spark, "graph:nodes(full)", lambda: entry.q_nodes(spark, SF))

    if want("text"):
        run(spark, "text:reassemble(full)", lambda: entry.q_reassemble_text(spark, SF))
        run(spark, "text:doc_stats(full)", lambda: entry.q_doc_stats(spark, SF))
        run(spark, "text:simhash(full)", lambda: entry.q_simhash(spark, SF))
        run(spark, "text:minhash_pairs(full)", lambda: entry.q_minhash_pairs(spark, SF))

    spark.stop()


if __name__ == "__main__":
    main()
