"""Connected-components + k-means IVF unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from frontier_engine.dedup_cluster import connected_components, lsh_star_edges
from frontier_engine.simsearch import ivf_probe_cluster, kmeans_lloyd


def test_connected_components_chain_and_isolate(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    # chain 1-2-3-4, pair 5-6, isolated 7 (edges given once, arbitrary order)
    edges = spark.createDataFrame([(2, 1), (3, 2), (3, 4), (6, 5)], "a long, b long")
    got = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_respects_max_iter_bound(spark):
    # a 6-chain needs ~5 propagation rounds; max_iter=2 must fail LOUDLY
    # (a silently partial labeling is wrong data), never hang
    import pytest

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(5)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=2)
    full = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert set(full.values()) == {0}


def test_lsh_star_edges_linear_in_bucket(spark):
    bands = spark.createDataFrame(
        [(d, 0, "x") for d in (10, 11, 12, 13)] + [(20, 0, "y")],
        "doc_id long, band int, bucket string",
    )
    edges = lsh_star_edges(bands).collect()
    # k-doc bucket → k-1 star edges to the min member; singleton bucket → none
    assert sorted((e.a, e.b) for e in edges) == [(11, 10), (12, 10), (13, 10)]


def test_kmeans_recovers_separated_clusters(spark):
    # 3 tight blobs in 4-d; seeds (vec_ids 1..3) land one in each blob
    rows = []
    blobs = {0: [10.0, 0, 0, 0], 1: [0, 10.0, 0, 0], 2: [0, 0, 10.0, 0]}
    for j in range(5):
        for b in range(3):
            vid = 1 + j * 3 + b  # blob = (vid-1) % 3 → seeds 1,2,3 hit distinct blobs
            rows.append((vid, [v + 0.01 * j for v in blobs[b]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, cent = kmeans_lloyd(emb, k=3, iters=2)
    got = assign.groupBy("cluster").count().collect()
    assert sorted(r["count"] for r in got) == [5, 5, 5]
    # probe: a query near blob 0 must select seed-1's cluster
    q = spark.createDataFrame([([9.5, 0.0, 0.0, 0.0],)], "qv array<double>")
    probe = ivf_probe_cluster(q, cent).collect()
    assert len(probe) == 1
    members = {r.vec_id for r in assign.where(F.col("cluster") == probe[0].cluster).collect()}
    assert members == {1, 4, 7, 10, 13}
