"""KNN recall vs exact (scipy), density/SDF field parity vs a direct dense
computation, SuGaR loss sanity."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from frosting_tpu.models import fields, sugar
from frosting_tpu.ops import knn as knn_lib
from frosting_tpu.ops import quat as quat_ops


def _cloud(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return pts


def test_knn_recall():
    pts = _cloud()
    idx, d2 = knn_lib.knn(jnp.asarray(pts), k=8, window=48, n_grids=2)
    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(pts, k=9)
    i_ref = i_ref[:, 1:]  # drop self
    recall = np.mean(
        [len(set(a) & set(b)) / 8 for a, b in zip(np.asarray(idx), i_ref)]
    )
    # NN-descent refinement (default refine_rounds=1) lifts window recall
    # from ~0.9 to ~0.99+
    assert recall > 0.97, recall
    # distances of found neighbors must be exact
    n = pts.shape[0]
    d_check = np.sum(
        (pts[np.asarray(idx)] - pts[:, None]) ** 2, -1
    )
    np.testing.assert_allclose(np.asarray(d2), d_check, rtol=1e-4, atol=1e-6)


def test_knn_ignores_dead_arena_slots():
    """Dead slots parked at 1e6 must not distort the Morton bbox (recall
    collapsed to 0.05 before the mask) nor appear as neighbors."""
    rng = np.random.default_rng(3)
    live = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    dead = np.full((1000, 3), 1e6, np.float32)
    pts = np.concatenate([live, dead])
    valid = np.concatenate([np.ones(2000, bool), np.zeros(1000, bool)])
    idx, _ = knn_lib.knn(
        jnp.asarray(pts), k=8, window=48, valid=jnp.asarray(valid)
    )
    tree = cKDTree(live)
    _, ref = tree.query(live, k=9)
    recall = np.mean(
        [len(set(a) & set(b)) / 8 for a, b in zip(np.asarray(idx)[:2000], ref[:, 1:])]
    )
    assert recall > 0.97, recall
    assert (np.asarray(idx)[:2000] < 2000).all()


def test_density_field_matches_dense():
    rng = np.random.default_rng(1)
    n, m, k = 200, 64, 16
    centers = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.05), np.log(0.2), (n, 3))).astype(
        np.float32
    )
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    strengths = rng.uniform(0.2, 1.0, n).astype(np.float32)
    x = rng.uniform(-1, 1, (m, 3)).astype(np.float32)

    # exact KNN sets
    tree = cKDTree(centers)
    _, knn_idx = tree.query(x, k=k)

    fv = fields.field_values(
        jnp.asarray(x), jnp.asarray(knn_idx), jnp.asarray(centers),
        jnp.asarray(strengths), jnp.asarray(scales), jnp.asarray(quats),
        beta_mode="average",
    )

    # dense numpy reference over exactly the same neighbor sets
    R = np.asarray(quat_ops.to_matrix(jnp.asarray(quats)))
    dens = np.zeros(m)
    for i in range(m):
        for j in knn_idx[i]:
            shift = x[i] - centers[j]
            w = (R[j].T @ shift) / scales[j]
            dens[i] += strengths[j] * np.exp(-0.5 * np.dot(w, w))
    np.testing.assert_allclose(np.asarray(fv.density), dens, rtol=2e-4)
    # sdf: positive outside (low density), ~0 at density 1
    assert np.all(np.asarray(fv.sdf)[dens < 0.99] > 0)


def test_sugar_losses_finite_and_meaningful():
    rng = np.random.default_rng(2)
    n = 500
    centers = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.1), (n, 3))).astype(
        np.float32
    )
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.1, 0.9, n).astype(np.float32)
    knn_idx, _ = knn_lib.knn(jnp.asarray(centers), k=8)

    ent = sugar.entropy_loss(
        jnp.asarray(opac), jnp.ones(n, bool)
    )
    assert 0.0 < float(ent) < 0.7

    # saturated-opacity regression (the entropy->sdf collapse root cause):
    # with f32 sigmoid saturation (logit > ~16.6 -> o == 1.0 exactly) the
    # fused XLA gradient of the probability-space entropy was NaN, which
    # silently culled gaussians every entropy step. BOTH forms must give
    # finite grads at any saturation under jit.
    logits = jnp.asarray(
        rng.uniform(-30, 30, n).astype(np.float32)
    ).at[:16].set(jnp.asarray([18.7, 16.67, 25.0, -25.0, 16.6, 17.0,
                               30.0, -30.0, 0.0, 1.0, -1.0, 16.62,
                               16.63, 16.64, 16.65, 16.66]))
    vis = jnp.ones(n, bool)
    g_logit = jax.jit(
        jax.grad(lambda x: sugar.entropy_loss_from_logits(x, vis))
    )(logits)
    assert np.isfinite(np.asarray(g_logit)).all()
    g_prob = jax.jit(
        jax.grad(lambda x: sugar.entropy_loss(jax.nn.sigmoid(x), vis))
    )(logits)
    assert np.isfinite(np.asarray(g_prob)).all()
    # the two forms agree away from saturation
    mid = np.abs(np.asarray(logits)) < 8
    e1 = sugar.entropy_loss_from_logits(logits, vis)
    e2 = sugar.entropy_loss(jax.nn.sigmoid(logits), vis)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-4, atol=1e-6)
    g2 = np.asarray(
        jax.grad(lambda x: sugar.entropy_loss(jax.nn.sigmoid(x), vis))(logits)
    )
    np.testing.assert_allclose(
        np.asarray(g_logit)[mid], g2[mid], rtol=1e-3, atol=1e-6
    )

    inp = sugar.sample_sdf_points(
        jax.random.key(0), jnp.asarray(centers), jnp.asarray(scales),
        jnp.asarray(quats), knn_idx, jnp.ones(n, bool), 1024,
    )
    l_sdf = sugar.sdf_estimation_density_loss(
        inp, jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac),
    )
    l_nrm = sugar.better_normal_loss(
        inp, jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac),
    )
    assert np.isfinite(float(l_sdf)) and float(l_sdf) > 0
    assert np.isfinite(float(l_nrm)) and float(l_nrm) > 0

    # gradients flow and are finite
    def total(s):
        i2 = inp._replace(samples=inp.samples)
        return sugar.sdf_estimation_density_loss(
            i2, jnp.asarray(centers), s, jnp.asarray(quats), jnp.asarray(opac)
        )

    g = jax.grad(total)(jnp.asarray(scales))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_knn_query_indexed_matches_oneshot():
    """knn_prepare + knn_query_indexed must equal the one-shot knn_query
    on a reference cloud large enough to take the Morton-window path
    (> 16384 refs), for query blocks inside the prepared bbox."""
    rng = np.random.default_rng(3)
    refs = jnp.asarray(rng.uniform(-1, 1, (20000, 3)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-0.9, 0.9, (3000, 3)), jnp.float32)

    idx_ref, d2_ref = knn_lib.knn_query(queries, refs, k=8)
    index = knn_lib.knn_prepare(refs, queries)
    idx_pre, d2_pre = knn_lib.knn_query_indexed(index, queries, k=8)
    np.testing.assert_allclose(
        np.sort(np.asarray(d2_pre), axis=1),
        np.sort(np.asarray(d2_ref), axis=1),
        rtol=1e-5, atol=1e-7,
    )

    # block sweeps reuse the index: same result as querying all at once
    parts = [
        knn_lib.knn_query_indexed(index, queries[i : i + 1000], k=8)[1]
        for i in range(0, 3000, 1000)
    ]
    np.testing.assert_allclose(
        np.concatenate([np.asarray(p) for p in parts]),
        np.asarray(d2_pre),
        rtol=1e-5, atol=1e-7,
    )

    # recall vs exact stays high
    tree = cKDTree(np.asarray(refs))
    d_true, i_true = tree.query(np.asarray(queries), k=8, workers=-1)
    hits = np.mean(
        [
            len(set(a) & set(b)) / 8.0
            for a, b in zip(np.asarray(idx_pre), i_true)
        ]
    )
    assert hits > 0.95, hits
