"""Clustering tests (mirrors the reference's tests/test_clustering.py)."""

import numpy as np

from faiss_tpu.clustering import (
    Clustering,
    ClusteringParameters,
    Kmeans,
    kmeans_clustering,
)


def make_blobs(n=2000, d=16, k=8, seed=0):
    rs = np.random.RandomState(seed)
    centers = rs.rand(k, d).astype(np.float32) * 10
    assign = rs.randint(k, size=n)
    x = centers[assign] + rs.randn(n, d).astype(np.float32) * 0.1
    return x, centers


def test_kmeans_converges_to_blobs():
    x, centers = make_blobs()
    km = Kmeans(16, 8, niter=20, seed=123, init_method="kmeans++", nredo=3)
    km.train(x)
    # every true center must have a learned centroid within noise distance
    d2 = ((centers[:, None, :] - km.centroids[None]) ** 2).sum(-1)
    assert (d2.min(axis=1) < 0.5).all()
    # objective decreases monotonically (Lloyd's guarantee)
    obj = km.obj
    assert (np.diff(obj) <= 1e-3 * obj[0]).all()


def test_objective_reasonable():
    x, _ = make_blobs(n=3000, d=8, k=4)
    obj = Clustering(8, 4).train(x)
    # after convergence, avg per-point distance ~ noise level (0.1^2 * d)
    assert obj / len(x) < 0.5


def test_nredo_improves_or_equal():
    x, _ = make_blobs(n=1000, d=8, k=16, seed=3)
    o1 = Clustering(8, 16, ClusteringParameters(niter=5, nredo=1, seed=7)).train(x)
    o3 = Clustering(8, 16, ClusteringParameters(niter=5, nredo=3, seed=7)).train(x)
    assert o3 <= o1 + 1e-3


def test_subsampling():
    x, _ = make_blobs(n=5000, d=8, k=4)
    cp = ClusteringParameters(niter=4, max_points_per_centroid=100)
    clus = Clustering(8, 4, cp)
    clus.train(x)  # only 400 points used
    assert clus.centroids.shape == (4, 8)


def test_spherical():
    x, _ = make_blobs(n=1000, d=16, k=8)
    cp = ClusteringParameters(niter=5, spherical=True)
    clus = Clustering(16, 8, cp)
    clus.train(x)
    norms = np.linalg.norm(clus.centroids, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_empty_cluster_split():
    # k larger than natural cluster count forces empties -> splits
    rs = np.random.RandomState(0)
    x = np.zeros((500, 4), np.float32)
    x[:250] = rs.randn(250, 4) * 0.01
    x[250:] = 5 + rs.randn(250, 4) * 0.01
    clus = Clustering(4, 10, ClusteringParameters(niter=10))
    clus.train(x)
    # all clusters must end up non-degenerate (no NaN / no duplicates at inf)
    assert np.isfinite(clus.centroids).all()


def test_weights():
    rs = np.random.RandomState(1)
    x = np.concatenate(
        [rs.randn(100, 4) * 0.01, 10 + rs.randn(100, 4) * 0.01]
    ).astype(np.float32)
    w = np.concatenate([np.full(100, 100.0), np.full(100, 1e-6)]).astype(
        np.float32
    )
    clus = Clustering(4, 1, ClusteringParameters(niter=5))
    clus.train(x, weights=w)
    # centroid pulled almost entirely to the heavy cluster
    assert np.abs(clus.centroids[0]).max() < 1.0


def test_kmeans_pp_init():
    x, _ = make_blobs(n=1000, d=8, k=8)
    cp = ClusteringParameters(niter=5, init_method="kmeans++")
    clus = Clustering(8, 8, cp)
    obj = clus.train(x)
    assert obj / len(x) < 1.0


def test_kmeans_clustering_fn():
    x, _ = make_blobs(n=800, d=8, k=4)
    c = kmeans_clustering(8, 4, x, niter=5)
    assert c.shape == (4, 8)


def test_kmeans_assign():
    x, _ = make_blobs(n=500, d=8, k=4)
    km = Kmeans(8, 4, niter=8)
    km.train(x)
    D, I = km.assign(x)
    assert I.shape == (500,)
    assert I.min() >= 0 and I.max() < 4
    # assignment must be argmin over centroids
    d2 = ((x[:, None] - km.centroids[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(I, d2.argmin(1))


def test_afkmc2_init():
    x, _ = make_blobs(n=1000, d=8, k=8)
    cp = ClusteringParameters(niter=5, init_method="afkmc2")
    clus = Clustering(8, 8, cp)
    obj = clus.train(x)
    assert obj / len(x) < 1.0


def test_superkmeans_matches_exact():
    """SuperKMeans (ADSampling-pruned assignment, SuperKMeans.cpp analogue)
    must reach an objective close to exact Lloyd on the same data, report
    pruning fractions, and adapt d_prime."""
    from faiss_tpu.clustering import SuperKMeans, SuperKMeansParameters

    x, centers = make_blobs(n=4000, d=32, k=16, seed=5)
    cp = SuperKMeansParameters(niter=8, seed=3)
    skm = SuperKMeans(32, 16, cp)
    obj_s = skm.train(x)
    obj_e = Clustering(32, 16, ClusteringParameters(niter=8, seed=3)).train(x)
    # the pruned assignment tracks exact Lloyd closely (measured: within
    # 1e-5 relative on this data) and prunes the bulk of the pairs
    assert obj_s <= obj_e * 1.05 + 1e-6, (obj_s, obj_e)
    assert len(skm.pruning_fractions) == 7
    assert all(0.0 <= f <= 1.0 for f in skm.pruning_fractions)
    assert skm.pruning_fractions[-1] > 0.5  # screen actually prunes
    # covers true centers at least as well as exact Lloyd does
    cov_s = (((centers[:, None, :] - skm.centroids[None]) ** 2).sum(-1)
             .min(1) < 1.0).sum()
    ce = Clustering(32, 16, ClusteringParameters(niter=8, seed=3))
    ce.train(x)
    cov_e = (((centers[:, None, :] - ce.centroids[None]) ** 2).sum(-1)
             .min(1) < 1.0).sum()
    assert cov_s >= cov_e - 1


def test_superkm_assign_update_exactness():
    """With keep == k the SuperKMeans iteration must reproduce exact
    argmin assignment (screen is a no-op at full width)."""
    import jax.numpy as jnp

    from faiss_tpu.ops.kmeans_ops import superkm_assign_update

    rs = np.random.RandomState(2)
    x = rs.randn(500, 32).astype(np.float32)
    c = rs.randn(16, 32).astype(np.float32)
    import jax

    new_c, tau, obj, _, tot, frac = superkm_assign_update(
        jnp.asarray(x), jnp.asarray(c), 0.5, jax.random.PRNGKey(0), 16, 16
    )
    d2 = ((x[:, None] - c[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(tau), d2.min(1), rtol=1e-4, atol=1e-4)
    assert abs(float(obj) - d2.min(1).sum()) / d2.min(1).sum() < 1e-4
    assert int(tot) == 500


def test_uint8_path_matches_f32():
    """uint8 training data stays uint8 on device (the MNIST8m-scale HBM
    path); assignments and objective must match the f32 path — every
    uint8 value is exact in bf16, so the only difference is f32
    accumulation order."""
    rs = np.random.RandomState(3)
    n, d, k = 4000, 24, 8
    protos = rs.randint(0, 256, size=(k, d))
    xi = np.clip(
        protos[rs.randint(k, size=n)] + rs.randint(-20, 21, size=(n, d)),
        0, 255,
    ).astype(np.uint8)
    km8 = Kmeans(d, k, niter=12, seed=5, max_points_per_centroid=10**9)
    obj8 = km8.train(xi)
    km32 = Kmeans(d, k, niter=12, seed=5, max_points_per_centroid=10**9)
    obj32 = km32.train(xi.astype(np.float32))
    assert abs(obj8 - obj32) <= 1e-4 * obj32
    np.testing.assert_allclose(km8.centroids, km32.centroids,
                               rtol=1e-4, atol=1e-3)


def test_uint8_path_weighted_falls_back():
    """weights force the f32 path (the uint8 loop is unweighted)."""
    rs = np.random.RandomState(4)
    xi = rs.randint(0, 256, size=(500, 8)).astype(np.uint8)
    w = rs.rand(500).astype(np.float32) + 0.5
    km = Kmeans(8, 4, niter=5, seed=5, max_points_per_centroid=10**9)
    obj = km.train(xi, weights=w)
    assert np.isfinite(obj)
