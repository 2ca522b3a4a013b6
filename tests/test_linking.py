"""Entity linking + canonicalization vs the golden alias clusters
(FIXTURES.md F4: pairwise precision/recall must be 1.0 at small scale).
The typo variants (e.g. "Samsonn AG") are reachable ONLY through the
MinHash-LSH + Jaccard path, so this also proves the fuzzy blocking is
load-bearing."""

from itertools import combinations

from pdf2ontology_spark.operators import components, linking
from pdf2ontology_spark.plans.pipeline import run_kg_pipeline
from pdf2ontology_spark.sources import tables
from pdf2ontology_spark import synth


def _pairs(groups: dict) -> set:
    out = set()
    for members in groups.values():
        out |= {tuple(sorted(p)) for p in combinations(set(members), 2)}
    return out


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")], "src string, dst string"
    )
    got = {r.node: r.component for r in components.connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_org_clusters_pairwise_exact(spark):
    trips = run_kg_pipeline(spark, "/root/testdata/sf0.001")["triples"]
    out = linking.canonicalize(trips)
    mapping = (
        out["mapping"].filter("entity_type = 'organization'").select("name", "canonical_id")
    ).collect()
    pred_groups: dict = {}
    for r in mapping:
        pred_groups.setdefault(r.canonical_id, []).append(r.name)

    # golden: cluster_id per surface form, restricted to names that occur
    golden = {
        v: i for i, cluster in enumerate(synth.ORG_CLUSTERS) for v in cluster
    }
    present = {r.name for r in mapping}
    gold_groups: dict = {}
    for name in present:
        gold_groups.setdefault(golden[name], []).append(name)

    pred_pairs, gold_pairs = _pairs(pred_groups), _pairs(gold_groups)
    assert pred_pairs == gold_pairs, (
        pred_pairs - gold_pairs,
        gold_pairs - pred_pairs,
    )
    # the typo variant must be present and linked (fuzzy path load-bearing)
    typo_present = [n for n in present if n in ("Samsonn AG", "Acmee GmbH", "TechCorpp Ltd")]
    assert typo_present, "generator should emit typo variants at sf0.001"


def test_canonical_graph_integrity(spark):
    trips = run_kg_pipeline(spark, "/root/testdata/sf0.001")["triples"]
    out = linking.canonicalize(trips)
    nodes, edges = out["nodes"], out["edges"]
    node_ids = {r.canonical_id for r in nodes.select("canonical_id").collect()}
    for col in ("subject_id", "object_id"):
        missing = {r[0] for r in edges.select(col).distinct().collect()} - node_ids
        assert not missing
