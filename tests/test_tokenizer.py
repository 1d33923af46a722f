import pandas as pd
from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.webtext import generate_webtext
from semantic_search_engine_spark.functions.tokenizer import (
    tokenize,
    tokenize_series,
    tokens_col,
)

GOLDENS = [
    ("Hello, World!", ["hello", "world"]),
    ("a  b\tc\nd", ["a", "b", "c", "d"]),
    ("x9y 42", ["x9y", "42"]),
    ("", []),
    ("---", []),
    ("MiXeD-CaSe_under", ["mixed", "case", "under"]),
]


def test_goldens():
    for text, want in GOLDENS:
        assert tokenize(text) == want


def test_series_matches_scalar():
    s = pd.Series([t for t, _ in GOLDENS])
    got = tokenize_series(s)
    for g, (_, want) in zip(got, GOLDENS):
        assert list(g) == want


def test_jvm_matches_python(spark):
    docs = generate_webtext(spark, 200)
    pdf = docs.select("url", "text", tokens_col(F.col("text")).alias("toks")).toPandas()
    for _, r in pdf.iterrows():
        assert list(r["toks"]) == tokenize(r["text"])


def test_jvm_goldens(spark):
    df = spark.createDataFrame([(t,) for t, _ in GOLDENS], "text string")
    got = df.select(tokens_col(F.col("text")).alias("toks")).toPandas()
    for g, (_, want) in zip(got["toks"], GOLDENS):
        assert list(g) == want
