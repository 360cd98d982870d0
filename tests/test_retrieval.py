"""faiss index IO round-trip and retrieval-blend math tests."""

import os

import numpy as np

import jax.numpy as jnp

from aicovergen_tpu.retrieval import FaissIndex, Retriever, read_faiss_index, write_ivf_flat_index


def _make_index(tmp_path, n=500, d=32, nlist=8, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    centroids = rng.standard_normal((nlist, d)).astype(np.float32)
    d2 = ((vecs[:, None] - centroids[None]) ** 2).sum(-1)
    assignment = d2.argmin(1).astype(np.int32)
    path = os.path.join(tmp_path, "test.index")
    write_ivf_flat_index(path, vecs, centroids, assignment, nprobe=2)
    return path, vecs, centroids, assignment


def test_roundtrip(tmp_path):
    path, vecs, centroids, assignment = _make_index(str(tmp_path))
    idx = read_faiss_index(path)
    assert idx.d == 32 and idx.ntotal == 500 and idx.nlist == 8 and idx.nprobe == 2
    np.testing.assert_array_equal(idx.vectors, vecs)  # reconstruct_n contract
    np.testing.assert_array_equal(idx.centroids, centroids)
    np.testing.assert_array_equal(idx.list_assignment, assignment)


def test_roundtrip_matches_faiss_if_available(tmp_path):
    """If faiss were installed, verify byte-compat; otherwise skip."""
    import pytest

    faiss = pytest.importorskip("faiss")
    path, vecs, _, _ = _make_index(str(tmp_path))
    idx = faiss.read_index(path)
    big = idx.reconstruct_n(0, idx.ntotal)
    np.testing.assert_allclose(big, vecs)


def test_exact_search_is_true_knn(tmp_path):
    path, vecs, _, _ = _make_index(str(tmp_path))
    idx = read_faiss_index(path)
    retr = Retriever(idx, exact=True)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    scores, ix = retr.search(jnp.asarray(q), k=8)
    d2 = ((q[:, None] - vecs[None]) ** 2).sum(-1)
    ref_ix = np.argsort(d2, axis=1)[:, :8]
    np.testing.assert_array_equal(np.sort(np.asarray(ix), 1), np.sort(ref_ix, 1))
    np.testing.assert_allclose(
        np.sort(np.asarray(scores), 1), np.sort(np.take_along_axis(d2, ref_ix, 1), 1),
        rtol=1e-4, atol=1e-4,
    )


def test_ivf_search_respects_nprobe(tmp_path):
    path, vecs, centroids, assignment = _make_index(str(tmp_path))
    idx = read_faiss_index(path)
    retr = Retriever(idx, exact=False)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    _, ix = retr.search(jnp.asarray(q), k=8)
    cd = ((q[:, None] - centroids[None]) ** 2).sum(-1)
    probe = np.argsort(cd, 1)[:, :2]
    for qi in range(4):
        got_lists = assignment[np.asarray(ix)[qi]]
        assert set(got_lists).issubset(set(probe[qi]))


def test_blend_matches_reference_math(tmp_path):
    """index_rate blend (reference vc_infer_pipeline.py:421-431)."""
    path, vecs, _, _ = _make_index(str(tmp_path))
    idx = read_faiss_index(path)
    retr = Retriever(idx, exact=True)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    out = np.asarray(retr.blend(jnp.asarray(q), index_rate=0.5, k=8))

    d2 = ((q[:, None] - vecs[None]) ** 2).sum(-1)
    ref_ix = np.argsort(d2, 1)[:, :8]
    score = np.take_along_axis(d2, ref_ix, 1)
    weight = np.square(1 / np.maximum(score, 1e-12))
    weight /= weight.sum(1, keepdims=True)
    npy = np.sum(vecs[ref_ix] * weight[:, :, None], axis=1)
    ref = npy * 0.5 + q * 0.5
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    # index_rate 0 is a no-op passthrough
    np.testing.assert_array_equal(np.asarray(retr.blend(jnp.asarray(q), 0.0)), q)
