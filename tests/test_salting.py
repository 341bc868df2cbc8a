"""Salted two-phase operators must equal their unsalted forms on
skewed data (one key holding ~90% of rows)."""

import pytest
from pyspark.sql import Window, functions as F

from go_whisper_spark.functions.salting import salted_join


def _skewed_df(spark):
    hot = [("hot", i, float(i % 97)) for i in range(9000)]
    cold = [(f"k{i % 50}", i, float(i % 89)) for i in range(1000)]
    return spark.createDataFrame(hot + cold, "key string, id long, v double")


def test_salted_window_topk_equals_plain(spark):
    from go_whisper_spark.functions.salting import salted_window_topk

    df = _skewed_df(spark)
    order = [F.desc("v"), F.asc("id")]
    plain = (
        df.withColumn("rn", F.row_number().over(Window.partitionBy("key").orderBy(*order)))
        .where(F.col("rn") <= 5)
    )
    salted = salted_window_topk(df, ["key"], order, k=5, n_salts=8)
    a = {(r["key"], r["rn"], r["id"]) for r in plain.collect()}
    b = {(r["key"], r["rn"], r["id"]) for r in salted.collect()}
    assert a == b


def test_salted_join_equals_plain(spark):
    df = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, tag string"
    )
    plain = df.join(dim, "key").groupBy("key", "tag").agg(F.count("*").alias("n"))
    salted = (
        salted_join(df, dim, "key", n_salts=8)
        .groupBy("key", "tag")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
