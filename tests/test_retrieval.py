"""Exact top-k retrieval: single-shard and sharded paths must match a numpy
brute-force ranking (faiss Flat parity contract)."""

import numpy as np

import jax.numpy as jnp

from visiondk_tpu.ops import retrieval


def _data(Q=20, G=64, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(Q, D)).astype(np.float32)
    g = rng.normal(size=(G, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    return q, g


def _brute(q, g, k):
    sim = q @ g.T
    idx = np.argsort(-sim, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(sim, idx, axis=1), idx


def test_single_device_topk_matches_bruteforce():
    q, g, k = *_data(), 5
    s, i = retrieval.topk_ip(jnp.asarray(q), jnp.asarray(g), k, compute_dtype=jnp.float32)
    rs, ri = _brute(q, g, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=1e-5)


def test_sharded_search_matches_bruteforce(mesh8):
    q, g = _data(Q=33, G=100, D=32, seed=1)
    k = 7
    s, i = retrieval.search(q, g, k=k, mesh=mesh8.mesh, query_chunk=16, compute_dtype=jnp.float32)
    rs, ri = _brute(q, g, k)
    np.testing.assert_allclose(s, rs, rtol=1e-5)
    # rankings identical (score ties are practically impossible with random data)
    np.testing.assert_array_equal(i, ri)


def test_search_handles_small_gallery():
    q, g = _data(Q=4, G=3, D=8, seed=2)
    s, i = retrieval.search(q, g, k=10, query_chunk=4, compute_dtype=jnp.float32)
    assert s.shape == (4, 3) and i.shape == (4, 3)
    rs, ri = _brute(q, g, 3)
    np.testing.assert_array_equal(i, ri)


def test_approx_mode_high_recall():
    """recall_target mode returns ≥95% of the exact top-k on CPU too."""
    import jax.numpy as jnp

    from visiondk_tpu.ops import retrieval

    rng = np.random.default_rng(0)
    gallery = rng.normal(size=(2048, 32)).astype(np.float32)
    queries = rng.normal(size=(64, 32)).astype(np.float32)
    k = 10
    se, ie = retrieval.search(queries, gallery, k=k)
    sa, ia = retrieval.search(queries, gallery, k=k, recall_target=0.95)
    recall = np.mean([len(set(ie[i]) & set(ia[i])) / k for i in range(len(ie))])
    assert recall >= 0.9, recall


def test_sharded_pad_with_negative_similarities(mesh8):
    """Padded-shard exactness (round-2 review weak #5): real matches with
    NEGATIVE inner product must not be displaced by zero-scoring pad rows.
    G=101 → padded to 104 on 8 shards; anti-correlated gallery makes every
    similarity negative."""
    rng = np.random.default_rng(7)
    # dominant opposing component in dim 0 ⇒ every similarity negative
    q = np.concatenate(
        [3 * np.ones((16, 1)), 0.5 * rng.normal(size=(16, 7))], axis=1
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g = np.concatenate(
        [-3 * np.ones((101, 1)), 0.5 * rng.normal(size=(101, 7))], axis=1
    ).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    sim = q @ g.T
    assert (sim < 0).all(), "test setup: all similarities must be negative"
    k = 9
    s, i = retrieval.search(q, g, k=k, mesh=mesh8.mesh, query_chunk=16, compute_dtype=jnp.float32)
    rs, ri = _brute(q, g, k)
    assert (i < 101).all(), "pad indices leaked into the top-k"
    np.testing.assert_array_equal(i, ri)
    np.testing.assert_allclose(s, rs, rtol=1e-5)


def test_sharded_approx_recall(mesh8):
    """recall_target now reaches the sharded branch (was silently dropped)."""
    rng = np.random.default_rng(3)
    gallery = rng.normal(size=(2048, 32)).astype(np.float32)
    queries = rng.normal(size=(64, 32)).astype(np.float32)
    k = 10
    se, ie = retrieval.search(queries, gallery, k=k, mesh=mesh8.mesh)
    sa, ia = retrieval.search(queries, gallery, k=k, mesh=mesh8.mesh, recall_target=0.95)
    recall = np.mean([len(set(ie[i]) & set(ia[i])) / k for i in range(len(ie))])
    assert recall >= 0.9, recall
