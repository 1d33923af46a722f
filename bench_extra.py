"""Round-8 optimization isolation benchmarks (guide §1.4) — the
measurements OPTIMIZATION_r08.md cites, reproducible in one run.
`bench.py` is frozen for driver measurement; everything extra lives
here. Prints one labelled JSON line per probe.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measurement SF), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def emit(name: str, **kv) -> None:
    print(json.dumps({"probe": name, **kv}), flush=True)


def timed(fn, reps: int = 3) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from semantic_search_engine_spark.session import get_spark
    from semantic_search_engine_spark.sources.index_store import MANIFEST_SCHEMA

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="ssse-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.executor.memory": os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g")},
    )
    spark.range(10).count()  # session warm

    # ---- probe 1: local-relation cost — pickled-RDD path vs Arrow path
    rows = [(s, 1, 1, 1, 1, 1, 1, 0, 0, "x") for s in range(32)]
    rdd_df = spark.createDataFrame(rows, schema=MANIFEST_SCHEMA)
    from semantic_search_engine_spark.functions.localdf import local_df

    arrow_df = local_df(spark, rows, MANIFEST_SCHEMA)
    emit(
        "local_relation_collect_sec",
        pickled_rdd_path=timed(lambda: rdd_df.collect()),
        arrow_path=timed(lambda: arrow_df.collect()),
    )

    def w(df):
        df.coalesce(1).write.mode("overwrite").parquet(tempfile.mkdtemp() + "/m")

    emit(
        "local_relation_parquet_write_sec",
        pickled_rdd_path=timed(lambda: w(rdd_df)),
        arrow_path=timed(lambda: w(arrow_df)),
    )

    # ---- probe 2: AQE coalescing vs pinned kernel exchange (WAND batch)
    from semantic_search_engine_spark.fixtures.webtext import generate_queries, generate_webtext
    from semantic_search_engine_spark.operators.build import build_index
    from semantic_search_engine_spark.operators.query import IndexReader, search_index_wand

    work = tempfile.mkdtemp(prefix="ssse_bx_")
    corpus = os.path.join(work, "corpus")
    generate_webtext(spark, 20000).write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)
    idx = os.path.join(work, "idx")
    t0 = time.perf_counter()
    build_index(docs, idx)
    emit("build_20k_sec", sec=round(time.perf_counter() - t0, 3))
    reader = IndexReader(spark, idx)
    queries = generate_queries(n_queries=50)
    search_index_wand(reader, queries[:5]).collect()  # warm
    emit("wand_batch_sec_aqe_on_pinned", secs=timed(lambda: search_index_wand(reader, queries).collect()))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    emit("wand_batch_sec_aqe_off", secs=timed(lambda: search_index_wand(reader, queries).collect()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # ---- probe 3: neardup stage split + verification-expression A/B
    from semantic_search_engine_spark.operators.similarity import (
        CosineLSH, cosine_expr, norm_expr,
    )

    emb = e._read(spark, sf_dir, "embeddings")
    emb_n = emb.count()
    lsh = CosineLSH.build(emb, num_tables=8, hash_bits=8)
    a = lsh.hashed.select(F.col("vid").alias("id_a"), "table", "bucket")
    b = lsh.hashed.select(F.col("vid").alias("id_b"), "table", "bucket")
    cand = (
        a.join(F.broadcast(b), ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    ).localCheckpoint()
    n_pairs = cand.count()
    prep = emb.select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_v"),
        norm_expr(F.col("embedding")).alias("_n"),
    )
    ea = prep.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    eb = prep.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    zipdot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    # the negative-result experiment: unrolled getItem chain
    unrolled = None
    for i in range(64):
        term = F.get(F.col("va"), i).cast("double") * F.get(F.col("vb"), i).cast("double")
        unrolled = term if unrolled is None else unrolled + term
    unrolled = unrolled + F.lit(0.0)

    def verify(cos_expr_):
        base = cand.join(F.broadcast(ea), "id_a").join(F.broadcast(eb), "id_b")
        (
            base.withColumn("cos", cos_expr_)
            .filter(F.col("cos") >= 0.9)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
            .write.format("noop").mode("overwrite").save()
        )

    emit(
        "neardup_verify_expr_ab_sec",
        n_pairs=int(n_pairs),
        cosine_expr_3_folds=timed(lambda: verify(cosine_expr(F.col("va"), F.col("vb"))), 2),
        hoisted_norm_1_fold=timed(lambda: verify(zipdot / (F.col("na") * F.col("nb"))), 2),
        unrolled_getitem_chain=timed(lambda: verify(unrolled / (F.col("na") * F.col("nb"))), 1),
    )
    from semantic_search_engine_spark.operators import dedup

    emit(
        "neardup_full_sec",
        lsh_cfg=timed(lambda: dedup.embedding_neardup_pairs(
            emb, threshold=0.9, num_tables=8, hash_bits=8, n_rows=emb_n).collect()),
        auto_cfg=timed(lambda: dedup.embedding_neardup_pairs(
            emb, threshold=0.9, num_tables=8, n_rows=emb_n).collect()),
    )

    # ---- probe 4: minhash shuffle removal
    docs_t = e._docs(spark, sf_dir)
    emit("dedup_minhash_sec", secs=timed(lambda: dedup.minhash_band_pairs(docs_t).collect()))

    # ---- probe 5 (r8 leftovers): semantic_dedup norm-hoist A/B + ANN
    # build sizing (n_rows from parquet footers + Arrow sample collect)
    def old_semantic_dedup():
        """The pre-r8 semantic_dedup body — cosine_expr per centroid
        and per pair, no hoisting (the A side; the B side is the
        shipped dedup.semantic_dedup)."""
        rows_ = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
        cents = [list(r["embedding"]) for r in rows_]
        cos_cols = [
            cosine_expr(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c]))
            for c in cents
        ]
        arr = F.array(*cos_cols)
        assigned = emb.select(
            F.col("vec_id"), F.col("embedding"),
            (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("cluster"),
        )
        a_ = assigned.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "cluster")
        b_ = assigned.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "cluster")
        (
            a_.join(b_, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= 0.45)
            .groupBy("id_b", "cluster")
            .agg(F.min("id_a").alias("dup_of"), F.min_by("cos", "id_a").alias("cos"))
            .select(F.col("id_b").alias("vec_id"), "cluster", "dup_of", F.round("cos", 6).alias("cos"))
            .collect()
        )

    emit(
        "semantic_dedup_ab_sec",
        unhoisted=timed(old_semantic_dedup),
        hoisted=timed(lambda: dedup.semantic_dedup(emb, tau=0.45, n_clusters=8).collect()),
    )

    from semantic_search_engine_spark.operators.similarity import PQIndex

    def pq_build(n_rows=None):
        idx_ = PQIndex.build(emb, n_segments=8, n_codes=16, sample_cap=2000, n_rows=n_rows)
        idx_.codes.unpersist()

    emit(
        "pq_build_sizing_sec",
        counted=timed(lambda: pq_build()),
        footer_n_rows=timed(lambda: pq_build(e._nrows(sf_dir, "embeddings"))),
    )
    emit(
        "ann_pq_entry_e2e_sec",
        secs=timed(lambda: e.q_ann_pq_fullprobe(spark, sf_dir).collect()),
    )
    # probe-vector fetch: one-row cluster job vs pyarrow footer predicate
    emit(
        "query_vec_ab_sec",
        spark_filter_first=timed(
            lambda: [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
        ),
        pyarrow_footer=timed(lambda: e._query_vec(spark, sf_dir)),
    )


if __name__ == "__main__":
    main()
