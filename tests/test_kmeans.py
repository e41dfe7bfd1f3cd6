"""Determinism of the IVF coarse-quantizer training: identical
centroids across independent runs (retry/recompute safety — a Spark
stage retry must not change the index), and the documented handling of
corpora smaller than IVF_K."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiesec_guc_spark.catalog import load_table
from aiesec_guc_spark.queries.similarity import IVF_K, _kmeans_centroids


def _embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )


def test_training_is_bitwise_deterministic_across_runs(spark, sf_dir):
    e = _embeddings(spark, sf_dir)
    run1 = {r["cid"]: r["cvec"] for r in _kmeans_centroids(e).collect()}
    run2 = {r["cid"]: r["cvec"] for r in _kmeans_centroids(e).collect()}
    assert run1.keys() == run2.keys()
    assert len(run1) == IVF_K
    for cid in run1:
        # Exact equality, not approx: the decimal-sum mean is defined
        # to be bit-identical across runs and engines.
        assert run1[cid] == run2[cid], f"centroid {cid} drifted between runs"


def test_training_moves_centroids_off_seed(spark, sf_dir):
    # Lloyd refinement must actually update (a mean of >1 members is
    # almost surely not the seed vector); a no-op training would make
    # the 'trained' claim false.
    e = _embeddings(spark, sf_dir)
    seeds = {
        r["cid"]: r["cvec"]
        for r in (
            e.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
            .limit(IVF_K)
            .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cvec"))
            .collect()
        )
    }
    trained = {r["cid"]: r["cvec"] for r in _kmeans_centroids(e).collect()}
    assert trained.keys() == seeds.keys()
    moved = sum(1 for cid in seeds if trained[cid] != seeds[cid])
    assert moved > IVF_K // 2, f"only {moved}/{IVF_K} centroids moved off their seed"


def test_tiny_corpus_trains_at_most_n_centroids(spark):
    rows = [(i, 0, [float(i), 1.0, 0.0, float(i % 2)]) for i in range(5)]
    e = spark.createDataFrame(rows, "vec_id long, label int, emb array<double>")
    cents = _kmeans_centroids(e, dim=4).collect()
    assert 1 <= len(cents) <= 5
