"""Byte-identity contract for the pinned extractor (input_hint)."""

import hashlib

from pyspark.sql import functions as F

from semantic_search_engine_spark.fixtures.extractor import (
    extract_text,
    extract_text_col,
    extract_text_series,
)
from semantic_search_engine_spark.fixtures.webtext import generate_webtext


def test_scalar_golden():
    html = b"<html><head><title>a b</title></head><body><p>c d</p><p>e</p></body></html>"
    assert extract_text(html) == "a b\nc d\ne"


def test_no_title_no_paras():
    assert extract_text(b"<html><body><p>x</p></body></html>") == "\nx"
    assert extract_text(b"<html><head><title>t</title></head><body></body></html>") == "t"


def test_text_column_byte_identical_per_url(spark):
    """Generator's text column == re-extraction from html, per url,
    via both the pandas path and the pure-JVM column path."""
    docs = generate_webtext(spark, 300).cache()
    pdf = docs.select("url", "html", "text").toPandas()
    # pandas path
    re_ext = extract_text_series(pdf["html"].map(bytes))
    assert (re_ext == pdf["text"]).all()
    # byte-level check via sha256
    for h, t in zip(pdf["html"], pdf["text"]):
        assert hashlib.sha256(extract_text(bytes(h)).encode()).hexdigest() == hashlib.sha256(t.encode()).hexdigest()
    # JVM column path
    mism = (
        docs.withColumn("re_text", extract_text_col(F.col("html")))
        .filter(F.col("re_text") != F.col("text"))
        .count()
    )
    assert mism == 0
    docs.unpersist()


def test_generation_is_deterministic_across_partitioning(spark):
    a = generate_webtext(spark, 120, num_partitions=2).orderBy("url").toPandas()
    b = generate_webtext(spark, 120, num_partitions=7).orderBy("url").toPandas()
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()
    assert (a["lang"] == b["lang"]).all()
    assert a["url"].is_unique
