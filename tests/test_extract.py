"""Extraction stack: marching tets, FFT Poisson, cleaning, and the full
shell pipeline on a synthetic sphere of Gaussians."""

import jax.numpy as jnp
import numpy as np

from frosting_tpu.extract import marching, meshclean, poisson
from frosting_tpu.raster import RasterConfig
from frosting_tpu.scene import synthetic
from frosting_tpu.extract.shell import ShellConfig, extract_shell


def test_marching_tets_sphere():
    n = 40
    xs = np.linspace(-1.2, 1.2, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)
    verts, faces = marching.marching_tets(
        field, 0.0, origin=(-1.2,) * 3, spacing=(2.4 / (n - 1),) * 3
    )
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 1.0) < 5e-3
    assert r.std() < 2e-3
    # watertight: every edge shared by exactly 2 faces
    e = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
        axis=1,
    )
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert (cnt == 2).all()


def test_marching_tets_slabbed_matches_full():
    """z-slab processing (the 1024^3 memory-bounding path) must produce
    EXACTLY the full-grid mesh: global ids + identical arithmetic make the
    weld keys and vertex positions bit-equal across slab boundaries."""
    n = 33
    rng = np.random.default_rng(5)
    xs = np.linspace(-1.3, 1.1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = (
        1.0
        - np.sqrt(X**2 + 1.3 * Y**2 + 0.8 * Z**2)
        + 0.05 * rng.normal(size=X.shape)
    )
    kw = dict(level=0.0, origin=(-1.3,) * 3, spacing=(2.4 / (n - 1),) * 3)
    v_full, f_full = marching.marching_tets(field, **kw)
    # tiny slab budget: forces many z-slabs (plus some skipped ones)
    v_slab, f_slab = marching.marching_tets(
        field, max_slab_cubes=3 * (n - 1) * (n - 1), **kw
    )
    assert v_full.shape == v_slab.shape
    # welded vertex ORDER is identical (np.unique sorts the global edge
    # keys); positions agree to FP epsilon — a shared edge may be welded
    # from either of its incident tets (t vs 1-t interpolation), and the
    # last-write-wins occurrence differs between slab and full emission
    np.testing.assert_allclose(v_full, v_slab, atol=1e-12)

    # triangles are emitted slab-by-slab, so rows are permuted; compare as
    # canonicalized sets (smallest vertex first, cyclic order preserved)
    def canon(f):
        roll = np.argmin(f, axis=1)
        rows = np.stack(
            [f[np.arange(len(f)), (roll + k) % 3] for k in range(3)], axis=1
        )
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_array_equal(canon(f_full), canon(f_slab))


def test_poisson_sphere_from_points():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * 1.0
    verts, faces = poisson.poisson_reconstruct(
        pts.astype(np.float32), d.astype(np.float32), resolution=96
    )
    assert len(verts) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 1.0) < 0.05, np.median(r)
    # orientation: outward
    from frosting_tpu.ops import mesh as mesh_ops

    fn = np.asarray(
        mesh_ops.face_normals(jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32))
    )
    c = verts[faces].mean(axis=1)
    assert (np.sum(fn * c, axis=1) > 0).mean() > 0.95


def test_decimation_and_components():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    verts, faces = poisson.poisson_reconstruct(
        d.astype(np.float32), d.astype(np.float32), resolution=64
    )
    v2, f2 = meshclean.decimate_vertex_clustering(verts, faces, 2000)
    assert len(v2) <= 2500
    assert len(f2) > 100
    v3, f3 = meshclean.largest_component(v2, f2)
    labels = meshclean.face_components(f3, len(v3))
    assert len(np.unique(labels)) == 1


def test_shell_extraction_on_gaussian_sphere():
    rng = np.random.default_rng(2)
    n = 4000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    means = jnp.asarray(d, jnp.float32)
    scales = jnp.full((n, 3), 0.05, jnp.float32)
    quats = jnp.concatenate(
        [jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1
    )
    opac = jnp.full((n,), 0.9, jnp.float32)

    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=16384, backend="jax"
    )
    cams = synthetic.camera_ring(n_cams=6, radius=3.5)
    cfg = ShellConfig(
        surface_level=0.3,
        poisson_resolution=80,
        target_vertices=5000,
        target_vertices_low=600,
        knn_k=8,
    )
    verts, faces, aux = extract_shell(
        means, scales, quats, opac, cams, rcfg, cfg
    )
    assert len(verts) > 500
    assert len(faces) > 500
    r = np.linalg.norm(verts, axis=1)
    # shell should wrap the gaussian sphere (radius 1 +/- a few sigma)
    assert 0.8 < np.median(r) < 1.35, np.median(r)
    sp = aux["surface_points"]
    assert len(sp) > 2000
    # dual decimation target (coarse_shell.py:105-108): the low-poly
    # variant comes from the SAME reconstruction at a smaller budget
    lv, lf = aux["low_poly"]
    assert 100 < len(lv) < len(verts)
    rl = np.linalg.norm(lv, axis=1)
    assert 0.8 < np.median(rl) < 1.35, np.median(rl)


def test_auto_poisson_resolution():
    """Auto depth heuristic (coarse_shell.py:17-49): denser clouds get
    finer grids, capped at max."""
    from frosting_tpu.extract.shell import auto_poisson_resolution

    rng = np.random.default_rng(0)
    d = rng.normal(size=(20_000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sparse = d[:500]
    res_sparse = auto_poisson_resolution(sparse, max_resolution=256)
    res_dense = auto_poisson_resolution(d, max_resolution=256)
    assert res_dense >= res_sparse
    assert 64 <= res_dense <= 256
    assert (res_dense & (res_dense - 1)) == 0  # power of two


def test_quantile_vertex_cleaning():
    """Vertices far from the support cloud (hallucinated geometry) are
    removed; well-supported vertices survive (coarse_shell.py:466-506)."""
    from frosting_tpu.extract import meshclean
    from tests.test_mesh import icosphere

    v, f = icosphere(3)
    # support: the sphere surface; append a far-away blob of mesh verts
    far = v[:30] * 3.0
    verts = np.concatenate([v, far])
    faces = np.concatenate(
        [f, np.arange(len(v), len(v) + 30).reshape(10, 3)]
    )
    v2, f2 = meshclean.remove_unsupported_vertices(
        verts, faces, v, quantile=30 / len(verts) + 0.01
    )
    r = np.linalg.norm(v2, axis=1)
    assert r.max() < 1.5  # far blob gone
    assert len(v2) >= len(v) * 0.95  # surface kept


def test_fg_bg_split_extraction():
    """fg_split extracts both a foreground object and distant background
    geometry as separate Poisson halves merged into one mesh
    (coarse_shell.py:382-524)."""
    import jax.numpy as jnp

    from frosting_tpu.extract.shell import ShellConfig, extract_shell
    from frosting_tpu.scene import synthetic

    rng = np.random.default_rng(0)
    # fg sphere at origin + bg wall far outside the camera bbox
    n1, n2 = 1200, 800
    d = rng.normal(size=(n1, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wall = np.stack(
        [rng.uniform(-6, 6, n2), rng.uniform(-6, 6, n2), np.full(n2, 7.0)], 1
    )
    means = jnp.asarray(np.concatenate([d, wall]), jnp.float32)
    scales = jnp.full((n1 + n2, 3), 0.09, jnp.float32)
    quats = jnp.asarray(
        np.concatenate([np.ones((n1 + n2, 1)), np.zeros((n1 + n2, 3))], 1),
        jnp.float32,
    )
    opac = jnp.full((n1 + n2,), 0.92, jnp.float32)
    cams = synthetic.camera_ring(n_cams=6, radius=3.0)
    from frosting_tpu.raster import RasterConfig

    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=16384, backend="jax"
    )
    verts, faces, _aux = extract_shell(
        means, scales, quats, opac, cams, rcfg,
        ShellConfig(
            poisson_resolution=48, target_vertices=4000, knn_k=8,
            fg_split=True, cleaning_quantile=0.05,
            visibility_threshold=None,  # keep both components
        ),
    )
    # both the near sphere and some distant geometry must be in the mesh...
    r = np.linalg.norm(np.asarray(verts), axis=1)
    assert (r < 1.5).sum() > 100  # fg sphere present


def _sphere_gaussians(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    means = jnp.asarray(d, jnp.float32)
    scales = jnp.full((n, 3), 0.06, jnp.float32)
    quats = jnp.concatenate([jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1)
    opac = jnp.full((n,), 0.9, jnp.float32)
    return means, scales, quats, opac


def test_centers_extraction_ablation():
    """method="centers": Poisson on the gaussian centers with
    density-gradient normals (coarse_shell.py:637-772)."""
    means, scales, quats, opac = _sphere_gaussians()
    cams = synthetic.camera_ring(n_cams=4, radius=3.5)
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=16384, backend="jax"
    )
    verts, faces, aux = extract_shell(
        means, scales, quats, opac, cams, rcfg,
        ShellConfig(
            method="centers", poisson_resolution=64, target_vertices=4000,
            knn_k=8, cleaning_quantile=0.0,
        ),
    )
    assert len(verts) > 300 and len(faces) > 300
    r = np.linalg.norm(verts, axis=1)
    assert 0.8 < np.median(r) < 1.25, np.median(r)
    # the ablation's surface points are the centers themselves
    assert len(aux["surface_points"]) == len(means)


def test_marching_extraction_ablation():
    """method="marching": marching-tets iso-surface of the density grid
    (coarse_shell.py:773-907)."""
    means, scales, quats, opac = _sphere_gaussians()
    cams = synthetic.camera_ring(n_cams=4, radius=3.5)
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=16384, backend="jax"
    )
    verts, faces, _aux = extract_shell(
        means, scales, quats, opac, cams, rcfg,
        ShellConfig(
            method="marching", marching_resolution=48,
            target_vertices=4000, knn_k=8,
        ),
    )
    assert len(verts) > 300 and len(faces) > 300
    r = np.linalg.norm(verts, axis=1)
    assert 0.75 < np.median(r) < 1.3, np.median(r)
