"""The driver-facing streaming queries (q_streaming_triples /
q_streaming_nodes) must equal their batch twins row-for-row — the same
claim their shared DuckDB oracles check at sf0.01, pinned here at
sf0.001 inside pytest."""

from pyspark.sql import functions as F

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"


def _comparable(df):
    # set operations reject MAP columns: serialize them
    return df.select(
        *[
            F.to_json(c).alias(c) if t.startswith("map") else F.col(c)
            for c, t in df.dtypes
        ]
    )


def _assert_equal(streamed, batch):
    s = _comparable(streamed.select(*batch.columns))
    b = _comparable(batch)
    assert s.exceptAll(b).count() == 0, "extra rows in stream result"
    assert b.exceptAll(s).count() == 0, "missing rows in stream result"


def test_streaming_triples_query_equals_batch(spark):
    _assert_equal(e.q_streaming_triples(spark, SF), e.q_triples_all(spark, SF))


def test_streaming_nodes_query_equals_batch(spark):
    _assert_equal(e.q_streaming_nodes(spark, SF), e.q_nodes(spark, SF))
