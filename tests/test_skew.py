"""Skew operators: salted turn ranking and two-level aggregation must
be exactly equivalent to their single-phase forms."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from logshipper_spark import gen, pipeline, route, skew


def test_turn_rank_salted_matches_window(spark):
    tr = gen.transcripts(spark, 5000).cache()
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    expected = tr.withColumn("turn_rank", F.row_number().over(w))
    got = skew.turn_rank_salted(tr, block_size=64)
    diff = (
        got.select("conv_id", "turn_idx", "turn_rank")
        .exceptAll(expected.select("conv_id", "turn_idx", "turn_rank"))
        .count()
    )
    assert diff == 0
    assert got.count() == expected.count()


def test_turn_rank_salted_sparse_turn_idx(spark):
    # non-dense ordering keys: ranks must still be 1..n per conv
    tr = gen.transcripts(spark, 2000).filter("turn_idx % 3 <> 1").cache()
    got = skew.turn_rank_salted(tr, block_size=7)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    expected = tr.withColumn("turn_rank", F.row_number().over(w))
    assert (
        got.select("conv_id", "turn_idx", "turn_rank")
        .exceptAll(expected.select("conv_id", "turn_idx", "turn_rank"))
        .count()
        == 0
    )


def test_salted_sink_counts_matches_plain(spark):
    tr = gen.transcripts(spark, 5000)
    enr = pipeline.normalize_and_enrich(spark, tr)
    routed = route.routed_rows(enr, gen.routing_rules())
    plain = route.sink_counts(routed, ts_col="ts")
    salted = skew.salted_sink_counts(routed, ts_col="ts", salt_buckets=8)
    assert salted.exceptAll(plain.select(*salted.columns)).count() == 0
    assert plain.count() == salted.count()


def test_turn_rank_salted_null_conv_and_turn(spark):
    # a NULL conv (and a NULL turn_idx) must rank like the plain
    # window (NULLs first), not vanish through the offset equi-join
    rows = [(None, i) for i in range(10)] + [("c", i) for i in range(5)]
    rows += [("c", None), (None, None)]
    # ids below -block_size: their block (-1250) must still sort AFTER
    # the NULL sentinel block (-2^62), keeping NULLs-first parity
    rows += [("c", -5000), (None, -5000)]
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    got = skew.turn_rank_salted(tr, block_size=4)
    assert got.count() == len(rows)  # nothing dropped
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    expected = tr.withColumn("turn_rank", F.row_number().over(w))
    assert (
        got.exceptAll(expected).count() == 0
        and expected.exceptAll(got).count() == 0
    )
