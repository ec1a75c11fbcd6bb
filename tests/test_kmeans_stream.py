"""Streaming mini-batch k-means: Lloyd-sweep equivalence on a covering
first batch, inertia improvement over the stream, replay idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import clustering as KM
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import kmeans_stream as KS

K = 10


@pytest.fixture()
def vectors(spark):
    return load_table(spark, "embeddings", "/root/testdata/sf0.001").select(
        "vec_id", "embedding")


def _inertia(vectors, centroids):
    return KM.assign_clusters(vectors, centroids).agg(
        F.sum("dist_sq")).first()[0]


def test_first_covering_batch_is_one_lloyd_sweep(spark, vectors, tmp_path):
    state_dir = str(tmp_path / "state")
    init = KS.bootstrap(vectors, K, state_dir)["centroids"]
    KS.process_batch(vectors, state_dir, epoch=0)
    got = KS.load_state(state_dir)["centroids"]

    assigned = KM.assign_clusters(vectors, init)
    cmap = KM.recompute_centroids(assigned, 64)
    want = [cmap.get(i, init[i]) for i in range(K)]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)


def test_stream_improves_inertia_and_replay_is_noop(spark, vectors, tmp_path):
    state_dir = str(tmp_path / "state")
    src = str(tmp_path / "landing")
    vectors.repartition(2).write.parquet(src)

    init = KS.bootstrap(vectors, K, state_dir)["centroids"]
    q = KS.start_kmeans_stream(spark, src, vectors.schema, state_dir,
                               str(tmp_path / "ckpt"), k=K)
    q.awaitTermination(120)
    state = KS.load_state(state_dir)
    assert state["last_epoch"] >= 1          # >= 2 microbatches ran
    assert sum(state["counts"]) == vectors.count()
    assert _inertia(vectors, state["centroids"]) <= _inertia(vectors, init)

    # replayed epoch: exactly-once guard makes it a no-op
    before = state["centroids"]
    KS.process_batch(vectors, state_dir, epoch=state["last_epoch"])
    assert KS.load_state(state_dir)["centroids"] == before
