from semantic_search_engine_spark.fixtures.webtext import generate_webtext
from semantic_search_engine_spark.operators.docids import BUCKET_COL, mint_docids


def test_docids_dense_unique_deterministic(spark):
    docs = generate_webtext(spark, 500, num_partitions=3)
    a = mint_docids(docs, num_buckets=8).select("url", "docid", BUCKET_COL).toPandas()
    assert sorted(a["docid"]) == list(range(500))
    # deterministic under different input partitioning
    docs2 = generate_webtext(spark, 500, num_partitions=11)
    b = mint_docids(docs2, num_buckets=8).select("url", "docid").toPandas()
    m = a.merge(b, on="url", suffixes=("_a", "_b"))
    assert (m["docid_a"] == m["docid_b"]).all()


def test_docid_ranges_contiguous_per_bucket(spark):
    docs = generate_webtext(spark, 400, num_partitions=4)
    pdf = mint_docids(docs, num_buckets=6).select(BUCKET_COL, "docid", "url").toPandas()
    g = pdf.groupby(BUCKET_COL)["docid"]
    lo, hi, n = g.min(), g.max(), g.count()
    assert ((hi - lo + 1) == n).all()  # contiguous range per bucket
    # within bucket, docid order == url order
    for _, grp in pdf.groupby(BUCKET_COL):
        srt = grp.sort_values("url")
        assert srt["docid"].is_monotonic_increasing
