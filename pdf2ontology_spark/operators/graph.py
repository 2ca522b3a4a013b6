"""Entity tables + graph materialization (FIXTURES.md F4).

- ``entities_distinct`` / ``entity_type_histogram``: the reference's
  entity set + type rollups (triplet_extractor.py:520-533, 649-670).
- ``auto_create_entities``: the J1 left-join + anti-join-fill idiom — for
  relations whose subject/object has no entity row, synthesize one with
  type "other" and confidence 0.7
  (/root/reference/src/knowledge_extractor/triplet_extractor.py:282-314).
- ``nodes``/``edges``: canonicalized graph, exact-normalization blocking.
  The canonical id is sha2(normalized_name, entity_type) — a PURE
  EXPRESSION of the row, so edge endpoints need NO join at all: at 10^12
  scale the only shuffles are the final groupBys. (The MinHash-LSH +
  connected-components path, which does need iterative self-joins, lives
  in operators/linking.py.)

``canonical_form`` populates the reference's declared-but-never-written
Entity.canonical_form field (knowledge_models.py:43-46).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf2ontology_spark import rules

SEP = "\x1f"


def normalize_name_col(c: Column) -> Column:
    """JVM-side twin of rules.normalize_name (lower, strip legal
    suffixes, punctuation -> space, collapse whitespace)."""
    s = F.trim(F.lower(c))
    s = F.regexp_replace(s, rules.LEGAL_SUFFIX_RE, "")
    return F.trim(F.regexp_replace(s, rules.PUNCT_RE, " "))


def mentions(triples: DataFrame) -> DataFrame:
    """All entity mentions = subjects ++ objects of the triple stream.

    Implemented as explode(array(subj_struct, obj_struct)) rather than a
    union of two selects: a union would duplicate the whole upstream
    subtree (scan + windows run twice); the explode is one pass.
    """
    return triples.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("subj_name").alias("name"),
                    F.col("subj_type").alias("entity_type"),
                    F.col("confidence"),
                    F.col("source_sentence"),
                ),
                F.struct(
                    F.col("obj_name").alias("name"),
                    F.col("obj_type").alias("entity_type"),
                    F.col("confidence"),
                    F.col("source_sentence"),
                ),
            )
        ).alias("m")
    ).select("m.name", "m.entity_type", "m.confidence", "m.source_sentence")


def entities_distinct(triples: DataFrame) -> DataFrame:
    """Unique (name, entity_type) pairs (triplet_extractor.py:520-523)."""
    return mentions(triples).select("name", "entity_type").distinct()


def entity_type_histogram(triples: DataFrame) -> DataFrame:
    """Counts per entity_type, desc (triplet_extractor.py:528-533)."""
    return (
        mentions(triples)
        .groupBy("entity_type")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "entity_type")
    )


def auto_create_entities(entities: DataFrame, relations: DataFrame) -> DataFrame:
    """J1: entities ∪ {names referenced by relations but missing}.

    ``relations`` needs columns (subj_name, obj_name); missing names get
    entity_type "other", confidence 0.7, auto_created=true
    (triplet_extractor.py:282-314). Existing rows pass through.
    """
    referenced = (
        relations.select(F.col("subj_name").alias("name"))
        .unionByName(relations.select(F.col("obj_name").alias("name")))
        .distinct()
    )
    missing = referenced.join(entities, "name", "left_anti").select(
        "name",
        F.lit("other").alias("entity_type"),
        F.lit(0.7).alias("confidence"),
        F.lit(True).alias("auto_created"),
    )
    return entities.select(
        "name", "entity_type", "confidence", F.lit(False).alias("auto_created")
    ).unionByName(missing)


# types whose surface forms are value-like: normalization would merge
# distinct values ("417 kg" vs "417 %"), so they link by exact trimmed name
VALUE_TYPES = ["numeric", "date"]


def canonical_key_col(name: Column, entity_type: Column) -> Column:
    return F.when(entity_type.isin(VALUE_TYPES), F.trim(name)).otherwise(
        normalize_name_col(name)
    )


def entity_id_col(name: Column, entity_type: Column) -> Column:
    """Deterministic canonical id: sha2 over (canonical key, type).
    Content-derived ids are required for idempotent resume (SURVEY §1.2;
    the reference's uuid4 at knowledge_models.py:20 is replaced)."""
    return F.sha2(F.concat_ws(SEP, canonical_key_col(name, entity_type), entity_type), 256)


def per_surface(triples: DataFrame) -> DataFrame:
    """Per-surface-form statistics — the MERGEABLE node stage: every
    column combines additively across document subsets (n sums,
    max_conf maxes, mention_ex is a distributive top-3), so the
    streaming path can upsert batch-local rows into a surfaces stage
    table and derive identical nodes (tests/test_stream_graph.py)."""
    # aggregate FIRST on the raw surface form, then derive the canonical id
    # on the (tiny) distinct set — sha2+normalization run per distinct name,
    # not per mention (60k vs 1.35M evaluations at sf0.1)
    return (
        mentions(triples)
        .groupBy("name", "entity_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("confidence").alias("max_conf"),
            # top-3 example mentions; per-surface top-k then re-merge is
            # distributive, so the two-level aggregation stays exact
            F.slice(F.array_sort(F.collect_set("source_sentence")), 1, 3).alias(
                "mention_ex"
            ),
        )
        .withColumn("entity_id", entity_id_col(F.col("name"), F.col("entity_type")))
    )


def combine_surfaces(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two per_surface tables over the SAME key space exactly:
    counts add, confidences max, example mentions re-take the top-3 of
    the union (distributive, so combine(per_surface(X), per_surface(Y))
    == per_surface(X ++ Y))."""
    return (
        a.unionByName(b)
        .groupBy("name", "entity_type", "entity_id")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.max("max_conf").alias("max_conf"),
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("mention_ex")))),
                1,
                3,
            ).alias("mention_ex"),
        )
    )


def nodes_from_surfaces(per_surface_df: DataFrame) -> DataFrame:
    """Second-level node aggregation over a per_surface stage table.

    canonical_form = most frequent surface form (tie -> lexicographically
    smallest), computed deterministically with min_by over (-count, name).
    """
    out = per_surface_df.groupBy("entity_id", "entity_type").agg(
        F.min_by("name", F.struct((-F.col("n")).alias("nn"), F.col("name"))).alias(
            "canonical_form"
        ),
        F.array_sort(F.collect_set("name")).alias("aliases"),
        F.sum("n").cast("long").alias("mention_count"),
        F.max("n").cast("long").alias("top_surface_count"),
        F.max("max_conf").alias("confidence"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mention_ex")))), 1, 3
        ).alias("mentions"),
    )
    # uri / external_ids populate the reference's declared-but-never-set
    # Entity.uri / Entity.external_ids (knowledge_models.py:47-55) with
    # real content: a deterministic URN derived from the canonical id
    uri = F.concat_ws(":", F.lit("urn"), F.lit("entity"), "entity_type", "entity_id")
    # properties fills Entity.properties (knowledge_models.py:37-40,
    # LLM-populated Dict in the reference) with real surface statistics
    properties = F.create_map(
        F.lit("n_surfaces"),
        F.size("aliases").cast("string"),
        F.lit("top_surface_count"),
        F.col("top_surface_count").cast("string"),
    )
    return out.select(
        "entity_id",
        F.col("canonical_form").alias("name"),
        "canonical_form",
        "entity_type",
        "aliases",
        "mention_count",
        "confidence",
        "mentions",
        uri.alias("uri"),
        F.create_map(F.lit("urn"), uri).alias("external_ids"),
        properties.alias("properties"),
    )


def nodes(triples: DataFrame) -> DataFrame:
    """Canonicalized node table (schemas.NODES), exact blocking.
    Two hash aggregations, no joins."""
    return nodes_from_surfaces(per_surface(triples))


def surface_ids(triples: DataFrame) -> DataFrame:
    """(name, entity_type, entity_id) for every DISTINCT mention surface.

    The id expression (normalize regexes + sha2) runs once per distinct
    surface instead of once per triple row — at 8M triples/600k docs
    that is ~60k evaluations instead of 16M, and the triple-side lookup
    becomes a join that AQE broadcasts (the surface dim is tiny relative
    to the fact stream at every scale)."""
    return (
        mentions(triples)
        .select("name", "entity_type")
        .distinct()
        .withColumn("entity_id", entity_id_col(F.col("name"), F.col("entity_type")))
    )


def edge_aggs(triples: DataFrame) -> DataFrame:
    """Keyed edge aggregates — the MERGEABLE edge stage: weight sums,
    confidence maxes, evidence is a distributive top-3 and _methods a
    distinct union, so batch-local rows upsert additively into an
    edge-aggs stage table (streaming graph materialization).

    weight = co-occurrence count (Relation.weight semantics,
    knowledge_models.py:77-81); confidence = max over merged triples.
    """
    # PHASE 1 — aggregate on the RAW surface keys: the fact-stream
    # shuffle carries names/predicate (tens of bytes), not two 64-char
    # sha2 hex ids (128 bytes/row). This was a measured 1.38-1.58x
    # CPU-seconds inflation lever at rising thread counts — the
    # aggregation is DRAM-bound and row width is the knob.
    by_surface = triples.groupBy(
        "subj_name", "subj_type", "predicate", "obj_name", "obj_type"
    ).agg(
        F.count("*").cast("double").alias("weight"),
        F.max("confidence").alias("confidence"),
        # Relation.evidence (knowledge_models.py:94-97): top-3 distinct
        # supporting sentences, deterministic (sorted) and size-capped
        F.slice(F.array_sort(F.collect_set("source_sentence")), 1, 3).alias("evidence"),
        F.array_sort(F.collect_set("extraction_method")).alias("_methods"),
    )
    # endpoint ids computed DIRECTLY on the collapsed rows (round 7):
    # the round-6 surface-id dimension join ran sha2 once per distinct
    # surface, but paid a second full pass over the triples stage, a 2x
    # mention explode, a distinct exchange and two join builds for it —
    # measured 1.39 -> 0.87s at sf0.1. The ids are pure expressions of
    # the group keys, and the hash now runs at edge-surface cardinality
    # (the same row count the joins would have streamed anyway).
    e = by_surface.withColumn(
        "subject_id", entity_id_col(F.col("subj_name"), F.col("subj_type"))
    ).withColumn(
        "object_id", entity_id_col(F.col("obj_name"), F.col("obj_type"))
    )
    # PHASE 2 — re-aggregate by canonical id: distinct surfaces can
    # normalize to the SAME entity_id, so the surface-keyed groups are
    # finer than the id-keyed edges. Every column's merge is the exact
    # distributive combine (combine_edge_aggs' rules), and this second
    # aggregation runs at (tiny) edge x surface-variant cardinality.
    return e.groupBy("subject_id", "predicate", "object_id").agg(
        F.sum("weight").alias("weight"),
        F.max("confidence").alias("confidence"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("evidence")))), 1, 3
        ).alias("evidence"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_methods")))
        ).alias("_methods"),
    )


def combine_edge_aggs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two edge_aggs tables exactly: combine(edge_aggs(X),
    edge_aggs(Y)) == edge_aggs(X ++ Y)."""
    return (
        a.unionByName(b)
        .groupBy("subject_id", "predicate", "object_id")
        .agg(
            F.sum("weight").alias("weight"),
            F.max("confidence").alias("confidence"),
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("evidence")))),
                1,
                3,
            ).alias("evidence"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_methods")))
            ).alias("_methods"),
        )
    )


def edges_from_aggs(agg: DataFrame) -> DataFrame:
    """Final edge table from an edge_aggs stage table."""
    # metadata fills Relation.metadata (knowledge_models.py:59-62) with
    # real provenance: evidence count + contributing extraction methods
    metadata = F.create_map(
        F.lit("n_evidence"),
        F.size("evidence").cast("string"),
        F.lit("methods"),
        F.array_join("_methods", ","),
    )
    return agg.select(
        F.sha2(F.concat_ws(SEP, "subject_id", "predicate", "object_id"), 256).alias(
            "edge_id"
        ),
        "subject_id",
        "predicate",
        "object_id",
        "weight",
        "confidence",
        # negated/modality are declared on the reference Relation model
        # (knowledge_models.py:86-93) but never set by its extractor; the
        # schema carries them with the reference defaults
        F.lit(False).alias("negated"),
        F.lit(None).cast("string").alias("modality"),
        "evidence",
        metadata.alias("metadata"),
    )


def edges(triples: DataFrame) -> DataFrame:
    """Canonicalized edge table (schemas.EDGES), exact blocking."""
    return edges_from_aggs(edge_aggs(triples))


# --------------------------------------------------------------- ontology
# The reference declares an OntologyClass model (knowledge_models.py:
# 148-170: name/label/parent_classes/instances) and a KnowledgeGraph.
# ontology_classes list but never constructs them; the engine
# materializes the dimension: one class per reference EntityType
# (enums.py:28-40), value-like types under a 'value' superclass, all
# under the 'entity' root. Full per-class instance LISTS would be a
# scale-killer (millions of ids per class at corpus scale), so the
# table carries exact counts + top-5 example ids.
ENTITY_CLASS_PARENTS = {
    "person": "entity",
    "organization": "entity",
    "location": "entity",
    "date": "value",
    "product": "entity",
    "concept": "entity",
    "numeric": "value",
    "event": "entity",
    "technology": "entity",
    "document": "entity",
    "other": "entity",
    "value": "entity",
    "entity": "",
}


def ontology_class_dim(spark) -> DataFrame:
    """The (tiny, broadcastable) ontology class dimension."""
    rows = [
        (name, name.capitalize(), parent)
        for name, parent in sorted(ENTITY_CLASS_PARENTS.items())
    ]
    dim = spark.createDataFrame(rows, "name string, label string, parent_class string")
    return dim.withColumn("class_id", F.sha2(F.concat(F.lit("class:"), "name"), 256))


def ontology_classes(spark, nodes_df: DataFrame) -> DataFrame:
    """Class dimension + entity->class inversion stats: exact instance
    counts and top-5 example entity ids per class. One groupBy over the
    node table; the class dim joins broadcast."""
    stats = nodes_df.groupBy("entity_type").agg(
        F.count("*").cast("long").alias("n_instances"),
        F.slice(F.array_sort(F.collect_set("entity_id")), 1, 5).alias("instance_examples"),
    )
    # broadcast must hint the RIGHT (non-preserved) side of a left join —
    # hinting the preserved side is a silent no-op
    return (
        ontology_class_dim(spark)
        .join(F.broadcast(stats.withColumnRenamed("entity_type", "name")), "name", "left")
        .select(
            "class_id",
            "name",
            "label",
            "parent_class",
            F.coalesce("n_instances", F.lit(0).cast("long")).alias("n_instances"),
            F.coalesce("instance_examples", F.array().cast("array<string>")).alias(
                "instance_examples"
            ),
        )
    )


def nodes_with_class(nodes_df: DataFrame) -> DataFrame:
    """entity->class column on the node table via a broadcast dim join
    (the Entity -> OntologyClass.instances inversion, row-wise)."""
    spark = nodes_df.sparkSession
    dim = ontology_class_dim(spark).select(
        F.col("name").alias("entity_type"), "class_id", "parent_class"
    )
    return nodes_df.join(F.broadcast(dim), "entity_type", "left")


def graph_stats(
    triples: DataFrame, nodes_df: DataFrame, edges_df: DataFrame
) -> DataFrame:
    """The ``KnowledgeGraph.statistics`` / ``quality_metrics`` rollup
    (knowledge_models.py:190-198 — declared dicts the reference never
    fills) materialized as one (stat, value) key/value table:
    triple/entity/edge/predicate/doc counts, confidence
    mean (floor-1e-4, the established float-compare contract) and max,
    per-extraction-method triple counts (``n_method_<m>``), and the
    relation-derived fraction — entities that appear ONLY as objects,
    the exact set the reference auto-creates with entity_type=other
    (triplet_extractor.py:282-314).

    Scale shape: every branch is a tiny aggregate over the checkpointed
    triples stage or the already-derived node/edge tables — no corpus
    rescans, each union leg collapses to a handful of rows."""
    f4 = lambda c: F.floor(c * 10000.0) / 10000.0  # noqa: E731

    def kv(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("stat").cast("string"), F.col("value").cast("double")
        )

    t = triples.agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("predicate").alias("n_predicates"),
        f4(F.avg("confidence")).alias("mean_confidence"),
        F.max("confidence").alias("max_confidence"),
    )
    t_kv = kv(
        t.selectExpr(
            "stack(5, 'n_triples', double(n_triples), 'n_docs', double(n_docs), "
            "'n_predicates', double(n_predicates), "
            "'mean_confidence', mean_confidence, "
            "'max_confidence', max_confidence) AS (stat, value)"
        )
    )
    methods = kv(
        triples.groupBy("extraction_method")
        .count()
        .select(
            F.concat(F.lit("n_method_"), "extraction_method").alias("stat"),
            F.col("count").alias("value"),
        )
    )
    subj = triples.select(
        F.col("subj_name").alias("name"), F.col("subj_type").alias("entity_type")
    ).distinct()
    obj = triples.select(
        F.col("obj_name").alias("name"), F.col("obj_type").alias("entity_type")
    ).distinct()
    auto = kv(
        obj.join(subj, ["name", "entity_type"], "left_anti")
        .agg(F.count("*").alias("n_obj_only"))
        .crossJoin(obj.unionByName(subj).distinct().agg(F.count("*").alias("n_ent")))
        .select(
            F.lit("auto_created_fraction").alias("stat"),
            f4(F.col("n_obj_only") / F.col("n_ent")).alias("value"),
        )
    )
    n_nodes = kv(
        nodes_df.agg(F.count("*").alias("value")).select(
            F.lit("n_entities").alias("stat"), "value"
        )
    )
    n_edges = kv(
        edges_df.agg(F.count("*").alias("value")).select(
            F.lit("n_edges").alias("stat"), "value"
        )
    )
    return t_kv.unionByName(methods).unionByName(auto).unionByName(n_nodes).unionByName(
        n_edges
    )


def integrity_violations(nodes_df: DataFrame, edges_df: DataFrame) -> DataFrame:
    """Prompt-contract invariant (triplet_extractor.py:205-209): every
    edge endpoint exists in nodes. Returns the violating endpoint ids
    (must be empty)."""
    ids = nodes_df.select("entity_id")
    subj_missing = edges_df.select(F.col("subject_id").alias("entity_id")).join(
        ids, "entity_id", "left_anti"
    )
    obj_missing = edges_df.select(F.col("object_id").alias("entity_id")).join(
        ids, "entity_id", "left_anti"
    )
    return subj_missing.unionByName(obj_missing).distinct()
