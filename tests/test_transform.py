"""Transform tests (reference: internal/transform/remap_test.go:9-49)."""

from __future__ import annotations

import pandas as pd

from logshipper_spark.transform import (
    apply_case,
    camel_case_series,
    remap,
    snake_case_series,
)
from pyspark.sql import functions as F

# exact expected values from remap_test.go:9-49 plus edge cases derived
# by running the Go algorithm by hand
SNAKE_CASES = [
    ("Hello World Test", "hello_world_test"),
    ("alreadysnake", "alreadysnake"),
    ("hello_world", "hello_world"),
    ("HelloWorld", "hello_world"),
    ("hello-world", "hello_world"),
    ("FOO", "f_o_o"),
    ("a _ b", "a__b"),
    ("a_ b", "a_b"),
    ("a_B", "a_b"),
    ("-x", "x"),
    ("x-", "x_"),
    ("  trimmed  ", "trimmed"),
    ("", ""),
]

CAMEL_CASES = [
    ("hello_world_test", "helloWorldTest"),
    ("Hello World", "helloWorld"),
    ("single", "single"),
    ("_leading", "leading"),
    ("trailing_", "trailing"),
    ("a__b", "aB"),
    ("___", "___"),  # zero words → lowered input returned (remap.go:76-78)
    ("", ""),
]


def test_snake_case_series():
    s = pd.Series([c[0] for c in SNAKE_CASES])
    got = snake_case_series(s).tolist()
    for (inp, want), g in zip(SNAKE_CASES, got):
        assert g == want, (inp, g, want)


def test_camel_case_series():
    s = pd.Series([c[0] for c in CAMEL_CASES])
    got = camel_case_series(s).tolist()
    for (inp, want), g in zip(CAMEL_CASES, got):
        assert g == want, (inp, g, want)


def test_case_udfs_on_spark(spark):
    df = spark.createDataFrame([(c[0],) for c in SNAKE_CASES], ["text"])
    got = [r[0] for r in df.select(apply_case(F.col("text"), "snake")).collect()]
    assert got == [c[1] for c in SNAKE_CASES]

    df2 = spark.createDataFrame([(c[0],) for c in CAMEL_CASES], ["text"])
    got2 = [r[0] for r in df2.select(apply_case(F.col("text"), "camel")).collect()]
    assert got2 == [c[1] for c in CAMEL_CASES]


def test_upper_lower(spark):
    df = spark.createDataFrame([("MiXeD",)], ["text"])
    assert df.select(apply_case(F.col("text"), "upper")).first()[0] == "MIXED"
    assert df.select(apply_case(F.col("text"), "lower")).first()[0] == "mixed"


def test_add_fields(spark):
    df = spark.createDataFrame([({"a": "1"},)], "raw map<string,string>")
    out = remap(df, add={"env": "prod"}, message_col="missing_ok")
    assert out.first()["raw"] == {"a": "1", "env": "prod"}


def test_add_fields_overwrites_existing_key(spark):
    """Go map assignment overwrites (remap.go:23-25): a static field
    replaces an existing raw key instead of aborting the job under the
    session's EXCEPTION map-dedup policy."""
    df = spark.createDataFrame(
        [({"a": "1", "env": "staging"},)], "raw map<string,string>"
    )
    out = remap(df, add={"env": "prod"}, message_col="missing_ok")
    assert out.first()["raw"] == {"a": "1", "env": "prod"}
