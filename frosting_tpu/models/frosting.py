"""Frosting model: Gaussians parameterized by softmax barycentric
coordinates inside the prismatic cells of an adaptive-thickness shell.

Functional re-design of the Frosting class (frosting_scene/frosting_model.py:
159-1744). The shell is two offset sheets of the base mesh along vertex
normals; each base face spans a 6-corner prismatic cell (3 inner + 3 outer
vertices); every frosting Gaussian lives in one cell with
point = softmax(bary_logits) . cell_corners (frosting_model.py:503-514,
712-726). Convention note: our vertex normals point OUTWARD, so
outer_dist >= 0 and inner_dist <= 0 (the reference stores the opposite
signs, frosting_model.py:375-377).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.models import fields
from frosting_tpu.ops import knn as knn_lib
from frosting_tpu.ops import mesh as mesh_ops
from frosting_tpu.ops import sh as sh_ops
from frosting_tpu.scene.gaussians import GaussianParams, inverse_sigmoid


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrostingParams:
    """Optimizable frosting state. Static mesh topology (faces) lives in
    FrostingMeta, not here.

    `bg` holds the background Gaussians (vanilla Gaussians outside the fg
    bbox) INSIDE the optimized pytree: the reference trains them with
    dedicated param groups during refinement (frosting_optimizer.py:85-91),
    so they must receive gradients, not sit frozen in metadata."""

    shell_verts: jnp.ndarray  # [V, 3] base mesh (fixed unless learn_shell)
    inner_dist: jnp.ndarray  # [V] <= 0
    outer_dist: jnp.ndarray  # [V] >= 0
    bary_logits: jnp.ndarray  # [N, 6]
    scales_log: jnp.ndarray  # [N, 3]
    quats_raw: jnp.ndarray  # [N, 4]
    opacities_raw: jnp.ndarray  # [N]
    sh_dc: jnp.ndarray  # [N, 1, 3]
    sh_rest: jnp.ndarray  # [N, K-1, 3]
    bg: Optional[GaussianParams] = None


class FrostingMeta(NamedTuple):
    faces: jnp.ndarray  # [F, 3] int32
    cell_idx: jnp.ndarray  # [N] int32 cell (face) of each frosting Gaussian
    # [F+1] prefix bounds into a SORTED cell_idx (bounds[f] = first row of
    # cell f). When present, gaussian_centers' backward reduces the corner
    # gradients as prefix-sum differences over the contiguous segments
    # instead of an N-row scatter-add (which runs at TPU scalar rate and
    # dominated the 2M refine step). None = unsorted cell_idx, gather path.
    cell_bounds: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class FrostingConfig:
    n_gaussians: int = 2_000_000  # train.py:71 default budget
    frosting_level: float = 0.01  # train.py:87
    n_samples_per_vertex: int = 21  # frosting_model.py:178
    proposal_std_range: float = 3.0  # initial_proposal_std_range
    min_frosting_size: float = 0.001
    knn_k: int = 16
    sh_degree: int = 3
    # limit offsets to this multiple of the local mean edge length (fast
    # pre-clamp; the true guard is the incremental-growth loop below)
    max_offset_edge_factor: float = 1.5
    # grow offsets in n increments, freezing vertices whose sheet point
    # lands inside another cell (frosting_model.py:398-435)
    avoid_self_intersections: bool = True
    self_intersection_iters: int = 20  # fm n_iterations default
    self_intersection_knn: int = 8  # is_inside_frosting k_neighbors_to_use


def contract(x: jnp.ndarray, c: jnp.ndarray, L: float) -> jnp.ndarray:
    """MipNeRF360-style contraction of points beyond distance L from center
    c (frosting_model.py:36-48); used to damp cell volumes of unbounded
    background geometry."""
    d = jnp.linalg.norm(x - c, axis=-1, keepdims=True)
    d = jnp.maximum(d, 1e-12)
    contracted = c + L * (2.0 - L / d) * (x - c) / d
    return jnp.where(d > L, contracted, x)


def shell_sheets(p: FrostingParams, faces: jnp.ndarray):
    normals = mesh_ops.vertex_normals(p.shell_verts, faces)
    inner = p.shell_verts + p.inner_dist[:, None] * normals
    outer = p.shell_verts + p.outer_dist[:, None] * normals
    return inner, outer, normals


def cell_corners(p: FrostingParams, faces: jnp.ndarray) -> jnp.ndarray:
    """[F, 6, 3]: inner triangle verts then outer triangle verts."""
    inner, outer, _ = shell_sheets(p, faces)
    tri_in = inner[faces]  # [F, 3, 3]
    tri_out = outer[faces]
    return jnp.concatenate([tri_in, tri_out], axis=1)


def _corner_blend_lanes(w, corners, cell_idx):
    """means [N, 3] = sum_k w[n,k] * corners[cell_idx[n], k] computed in
    LANE-major form: the corner table is transposed to [18, F] and
    gathered along lanes at cell_idx (a [N]-row gather of 18-value rows
    runs at TPU scalar rate ~7 ns/row — ~28 ms per pass at the 2M refine
    budget; the lane-layout gather of the same data is several times
    cheaper, scripts/perf_take_probe.py)."""
    f = corners.shape[0]
    ct = corners.reshape(f, 18).T  # [18, F], rows k*3+c
    g18 = jnp.take(ct, cell_idx, axis=1, mode="clip")  # [18, N]
    w_t = w.T  # [6, N]
    means_t = [
        sum(w_t[k] * g18[3 * k + c] for k in range(6)) for c in range(3)
    ]
    return jnp.stack(means_t, axis=-1), g18, w_t


@jax.custom_vjp
def _blend_corners_sorted(w, corners, cell_idx, cell_bounds):
    """means[n] = sum_k w[n,k] * corners[cell_idx[n], k] for a SORTED
    cell_idx. Same value as the plain gather+einsum; the custom backward
    replaces the corner-gradient scatter-add (an N-row scatter at TPU
    scalar rate — ~300 ms at the 2M refine budget) with one [18, N]
    cumsum + a boundary gather at the F+1 segment bounds, the same
    prefix-difference reduction the rasterizer backward uses
    (raster/render.py _blend_bwd_impl)."""
    return _corner_blend_lanes(w, corners, cell_idx)[0]


def _blend_corners_sorted_fwd(w, corners, cell_idx, cell_bounds):
    means, _g18, _wt = _corner_blend_lanes(w, corners, cell_idx)
    return means, (w, corners, cell_idx, cell_bounds)


def _blend_corners_sorted_bwd(res, g_means):
    w, corners, cell_idx, cell_bounds = res
    f = corners.shape[0]
    n = w.shape[0]
    # d w[n, k] = sum_c g[n, c] * corners[cell_idx[n], k, c] — lane-major
    # re-gather (cheaper than saving a 144 MB residual at the 2M budget)
    _means, g18, _wt = _corner_blend_lanes(w, corners, cell_idx)
    gm_t = g_means.T  # [3, N]
    d_w = jnp.stack(
        [
            sum(gm_t[c] * g18[3 * k + c] for c in range(3))
            for k in range(6)
        ],
        axis=-1,
    )  # [N, 6]
    # d corners[f, k, c] = sum over cell-f's contiguous segment of
    # w[n, k] * g[n, c]: [18, N] products, cumsum along N, prefix
    # difference at the segment bounds. Lane-major [18, N] keeps the
    # minor dim un-padded.
    prod = (
        w.T[:, None, :] * g_means.T[None, :, :]
    ).reshape(18, n)  # [6*3, N] with k-major rows (k*3 + c)
    prefix = jnp.concatenate(
        [jnp.zeros((18, 1), prod.dtype), jnp.cumsum(prod, axis=1)], axis=1
    )  # [18, N+1]
    pb = jnp.take(prefix, cell_bounds, axis=1, mode="clip")  # [18, F+1]
    d_corners = (pb[:, 1:] - pb[:, :-1]).T.reshape(f, 6, 3)
    return d_w, d_corners, None, None


_blend_corners_sorted.defvjp(
    _blend_corners_sorted_fwd, _blend_corners_sorted_bwd
)


def gaussian_centers(
    p: FrostingParams,
    faces: jnp.ndarray,
    cell_idx: jnp.ndarray,
    cell_bounds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[N, 3] differentiable through bary logits AND the shell. When
    cell_bounds is given (cell_idx sorted), the backward uses the
    prefix-difference segment reduction instead of a scatter-add."""
    corners = cell_corners(p, faces)  # [F, 6, 3]
    w = jax.nn.softmax(p.bary_logits, axis=-1)
    if cell_bounds is not None:
        return _blend_corners_sorted(w, corners, cell_idx, cell_bounds)
    return jnp.sum(w[..., None] * corners[cell_idx], axis=1)


def activate_frosting(
    p: FrostingParams, meta: FrostingMeta
) -> Tuple[jnp.ndarray, ...]:
    """-> (means, scales, quats, opacities, sh) of frosting (+ background)
    Gaussians, ready for the rasterizer."""
    from frosting_tpu.ops import quat as quat_ops
    from frosting_tpu.scene.gaussians import activate as activate_gs

    means = gaussian_centers(
        p, meta.faces, meta.cell_idx, meta.cell_bounds
    )
    scales = jnp.exp(p.scales_log)
    quats = quat_ops.normalize(p.quats_raw)
    opac = jax.nn.sigmoid(p.opacities_raw)
    sh = jnp.concatenate([p.sh_dc, p.sh_rest], axis=1)
    if p.bg is not None:
        bm, bs, bq, bo, bsh = activate_gs(p.bg)
        means = jnp.concatenate([means, bm])
        scales = jnp.concatenate([scales, bs])
        quats = jnp.concatenate([quats, bq])
        opac = jnp.concatenate([opac, bo])
        sh = jnp.concatenate([sh, bsh])
    return means, scales, quats, opac, sh


def level_dists_along_normals(
    shell_verts: jnp.ndarray,
    normals: jnp.ndarray,
    g_means: jnp.ndarray,
    g_scales: jnp.ndarray,
    g_quats: jnp.ndarray,
    g_opac: jnp.ndarray,
    cfg: FrostingConfig,
    range_per_vertex: jnp.ndarray,  # [V] search half-range
):
    """Find inner/outer crossings of the frosting-level density along each
    vertex normal (compute_level_points_along_normals,
    frosting_model.py:2016-2208). Returns (inner_dist <= 0, outer_dist >= 0)."""
    v = shell_verts.shape[0]
    s = cfg.n_samples_per_vertex
    ts = jnp.linspace(-1.0, 1.0, s)
    offsets = range_per_vertex[:, None] * ts[None, :]  # [V, S]
    pts = shell_verts[:, None, :] + normals[:, None, :] * offsets[..., None]
    flat = pts.reshape(-1, 3)
    knn_idx, _ = knn_lib.knn_query(flat, g_means, k=cfg.knn_k)
    # blocked + jitted: V*S reaches ~4.2M at the reference 200k-vertex /
    # 21-sample budget — eager per-op evaluation OOMs (see fields.py)
    dens = fields.field_values_blocked(
        flat, knn_idx, g_means, g_opac, g_scales, g_quats,
        beta_mode="average",
    ).density.reshape(v, s)

    above = dens > cfg.frosting_level
    any_above = jnp.any(above, axis=-1)
    first = jnp.argmax(above, axis=-1)
    last = s - 1 - jnp.argmax(above[:, ::-1], axis=-1)

    def interp(k_after, direction):
        k0 = jnp.clip(k_after - direction, 0, s - 1)
        d0 = jnp.take_along_axis(dens, k0[:, None], 1)[:, 0]
        d1 = jnp.take_along_axis(dens, k_after[:, None], 1)[:, 0]
        o0 = jnp.take_along_axis(offsets, k0[:, None], 1)[:, 0]
        o1 = jnp.take_along_axis(offsets, k_after[:, None], 1)[:, 0]
        a = jnp.clip(
            (cfg.frosting_level - d0)
            / jnp.where(jnp.abs(d1 - d0) < 1e-12, 1e-12, d1 - d0),
            0.0,
            1.0,
        )
        return o0 + a * (o1 - o0)

    inner_off = interp(first, 1)  # crossing entering the level from below
    outer_off = interp(last, -1)
    fallback = cfg.min_frosting_size * jnp.mean(range_per_vertex)
    inner = jnp.where(any_above, jnp.minimum(inner_off, 0.0), -fallback)
    outer = jnp.where(any_above, jnp.maximum(outer_off, 0.0), fallback)
    return inner, outer


def _cell_face_planes(inner_tri: jnp.ndarray, outer_tri: jnp.ndarray):
    """Per-cell 5-face plane set of the prismatic cells.

    inner_tri/outer_tri: [F, 3, 3]. Returns (normals [F, 5, 3] inward,
    points [F, 5, 3]), exactly the construction of is_inside_frosting
    (frosting_model.py:1680-1724): 3 side quads, inner cap, outer cap."""
    i0, i1, i2 = inner_tri[:, 0], inner_tri[:, 1], inner_tri[:, 2]
    o0, o1, o2 = outer_tri[:, 0], outer_tri[:, 1], outer_tri[:, 2]

    def nrm(a, b):
        c = jnp.cross(a, b)
        return c / jnp.maximum(
            jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12
        )

    normals = jnp.stack(
        [
            nrm(i1 - i0, o0 - i0),
            nrm(i2 - i1, o1 - i1),
            nrm(o0 - i0, i2 - i0),
            nrm(i2 - i0, i1 - i0),  # inner cap
            nrm(o1 - o0, o2 - o0),  # outer cap
        ],
        axis=1,
    )
    points = jnp.stack([i0, i1, i0, i0, o0], axis=1)
    # orient every plane normal INTO the cell (toward its centroid) so the
    # inside test is winding-independent (the reference relies on a fixed
    # winding convention instead, fm:1680-1724)
    center = jnp.concatenate([inner_tri, outer_tri], axis=1).mean(
        axis=1, keepdims=True
    )  # [F, 1, 3]
    sign = jnp.sign(
        jnp.sum((center - points) * normals, axis=-1, keepdims=True)
    )
    normals = normals * jnp.where(sign == 0.0, 1.0, sign)
    return normals, points


def is_inside_cells(
    points: jnp.ndarray,  # [P, 3]
    inner_verts: jnp.ndarray,  # [V, 3]
    outer_verts: jnp.ndarray,  # [V, 3]
    faces: jnp.ndarray,  # [F, 3]
    scene_scale: float,
    k: int = 8,
    proj_th: float = 1e-6,
    exclude_cells: Optional[jnp.ndarray] = None,  # [P] cell to skip per point
) -> jnp.ndarray:
    """True where a point lies inside one of the k nearest prismatic cells
    (is_inside_frosting, frosting_model.py:1675-1737): all 5 signed plane
    projections > scene_scale * proj_th."""
    inner_tri = inner_verts[faces]
    outer_tri = outer_verts[faces]
    normals, plane_pts = _cell_face_planes(inner_tri, outer_tri)
    centers = jnp.concatenate([inner_tri, outer_tri], axis=1).mean(axis=1)
    knn_idx, _ = knn_lib.knn_query(points, centers, k=k)  # [P, k]
    n_g = normals[knn_idx]  # [P, k, 5, 3]
    p_g = plane_pts[knn_idx]
    proj = jnp.sum((points[:, None, None] - p_g) * n_g, axis=-1)  # [P, k, 5]
    inside_cell = jnp.all(proj > scene_scale * proj_th, axis=-1)  # [P, k]
    if exclude_cells is not None:
        inside_cell = inside_cell & (knn_idx != exclude_cells[:, None])
    return jnp.any(inside_cell, axis=-1)


def avoid_self_intersections(
    shell_verts: jnp.ndarray,  # [V, 3]
    normals: jnp.ndarray,  # [V, 3] outward vertex normals
    faces: jnp.ndarray,  # [F, 3]
    inner_target: jnp.ndarray,  # [V] <= 0
    outer_target: jnp.ndarray,  # [V] >= 0
    scene_scale: float,
    n_iters: int = 20,
    k: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Incrementally grow the inner/outer offsets toward their targets,
    freezing any vertex whose sheet point falls inside another prismatic
    cell (the ctor loop, frosting_model.py:398-435). Functional re-design:
    instead of boolean-mask indexing, a fori_loop carries (dists, frozen)
    and reverts+freezes intersecting vertices each step."""
    v = shell_verts.shape[0]
    # NOTE: no own-cell exclusion needed — a sheet vertex lies ON the
    # boundary planes of its incident cells, and inside requires strict
    # proj > scene_scale * proj_th (same tolerance as the reference).

    def body(_i, carry):
        inner, outer, in_frozen, out_frozen = carry
        step_in = inner_target / n_iters
        step_out = outer_target / n_iters
        cand_in = jnp.where(in_frozen, inner, inner + step_in)
        cand_out = jnp.where(out_frozen, outer, outer + step_out)
        iv = shell_verts + cand_in[:, None] * normals
        ov = shell_verts + cand_out[:, None] * normals
        bad_in = is_inside_cells(iv, iv, ov, faces, scene_scale, k=k)
        bad_out = is_inside_cells(ov, iv, ov, faces, scene_scale, k=k)
        inner = jnp.where(bad_in, inner, cand_in)
        outer = jnp.where(bad_out, outer, cand_out)
        return inner, outer, in_frozen | bad_in, out_frozen | bad_out

    inner, outer, _fi, _fo = jax.lax.fori_loop(
        0,
        n_iters,
        body,
        (
            jnp.zeros((v,), jnp.float32),
            jnp.zeros((v,), jnp.float32),
            jnp.zeros((v,), bool),
            jnp.zeros((v,), bool),
        ),
    )
    return inner, outer


def init_frosting(
    key,
    shell_verts: np.ndarray,
    faces: np.ndarray,
    g_means: jnp.ndarray,
    g_scales: jnp.ndarray,
    g_quats: jnp.ndarray,
    g_opac: jnp.ndarray,
    gaussians: Optional[GaussianParams],  # 3DGS params for SH/bg transfer
    cfg: FrostingConfig,
    spatial_extent: float = 1.0,
    use_background: bool = False,
    contract_points: bool = False,
    camera_center=None,
) -> Tuple[FrostingParams, FrostingMeta]:
    """Build the frosting layer around a shell mesh (frosting_model.py
    ctor :288-591)."""
    import os as _os

    def _dbg(tag, x):
        # FROSTING_INIT_DEBUG=1: synchronize after each init phase so an
        # async device failure is attributed to the right op group
        if _os.environ.get("FROSTING_INIT_DEBUG"):
            jax.block_until_ready(x)
            print(f"[init_frosting] {tag} ok", flush=True)

    shell_verts = jnp.asarray(shell_verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)
    v = shell_verts.shape[0]
    normals = mesh_ops.vertex_normals(shell_verts, faces_j)
    _dbg("vertex_normals", normals)

    # per-vertex std of nearby gaussians along the normal (fm:299-309)
    kidx, _ = knn_lib.knn_query(shell_verts, g_means, k=min(cfg.knn_k, 16))
    from frosting_tpu.ops import quat as quat_ops

    nb_quats = g_quats[kidx]  # [V, K, 4]
    nb_scales = g_scales[kidx]
    local_n = quat_ops.apply(
        quat_ops.conjugate(nb_quats), jnp.broadcast_to(normals[:, None], nb_quats.shape[:2] + (3,))
    )
    stds = jnp.linalg.norm(nb_scales * local_n, axis=-1).mean(axis=1)  # [V]
    _dbg("vertex_stds", stds)

    inner_dist, outer_dist = level_dists_along_normals(
        shell_verts, normals, g_means, g_scales, g_quats, g_opac, cfg,
        range_per_vertex=cfg.proposal_std_range * stds,
    )
    _dbg("level_dists", (inner_dist, outer_dist))

    # fast pre-clamp by local edge length (bounds the KNN window the
    # intersection tests must cover)
    edges = jnp.concatenate(
        [faces_j[:, [0, 1]], faces_j[:, [1, 2]], faces_j[:, [2, 0]]]
    )
    el = jnp.linalg.norm(
        shell_verts[edges[:, 0]] - shell_verts[edges[:, 1]], axis=-1
    )
    acc = jnp.zeros((v,)).at[edges[:, 0]].add(el).at[edges[:, 1]].add(el)
    deg = jnp.zeros((v,)).at[edges[:, 0]].add(1.0).at[edges[:, 1]].add(1.0)
    mean_edge = acc / jnp.maximum(deg, 1.0)
    cap = cfg.max_offset_edge_factor * mean_edge
    inner_dist = jnp.maximum(inner_dist, -cap)
    outer_dist = jnp.minimum(outer_dist, cap)
    _dbg("edge_clamp", (inner_dist, outer_dist))

    # true self-intersection avoidance: grow offsets incrementally,
    # freezing vertices whose sheet point enters another cell (fm:398-435)
    if cfg.avoid_self_intersections:
        # init-time-only, no gradients: run on the HOST CPU backend. The
        # 20-iteration fori body (KNN + prism tests at reference budgets,
        # 197k verts x 394k faces) wedged the remote TPU compile helper
        # for 45+ minutes on a full-budget Shelly run; the CPU backend
        # compiles it in seconds and the loop is off the hot path.
        cpu_dev = jax.devices("cpu")[0]
        with jax.default_device(cpu_dev):
            inner_dist, outer_dist = avoid_self_intersections(
                jax.device_put(shell_verts, cpu_dev),
                jax.device_put(normals, cpu_dev),
                jax.device_put(faces_j, cpu_dev),
                jax.device_put(inner_dist, cpu_dev),
                jax.device_put(outer_dist, cpu_dev),
                scene_scale=spatial_extent,
                n_iters=cfg.self_intersection_iters,
                k=cfg.self_intersection_knn,
            )
        inner_dist = jnp.asarray(np.asarray(inner_dist))
        outer_dist = jnp.asarray(np.asarray(outer_dist))
        _dbg("avoid_self_intersections", (inner_dist, outer_dist))
    min_sz = cfg.min_frosting_size * spatial_extent
    outer_dist = jnp.maximum(outer_dist, min_sz)
    inner_dist = jnp.minimum(inner_dist, -min_sz)

    # cell volumes ~ base area x mean thickness (fm:437-495, Heron); for
    # unbounded scenes both are computed in contracted space so distant
    # background cells don't swallow the gaussian budget (fm:443-471)
    vol_verts = shell_verts
    thick_v = outer_dist - inner_dist
    if contract_points:
        c = (
            jnp.asarray(camera_center, jnp.float32).reshape(1, 3)
            if camera_center is not None
            else jnp.zeros((1, 3), jnp.float32)
        )
        vol_verts = contract(shell_verts, c, spatial_extent)
        d = jnp.linalg.norm(shell_verts - c, axis=-1)
        damp = jnp.where(
            d > spatial_extent, (spatial_extent / jnp.maximum(d, 1e-12)) ** 2, 1.0
        )
        thick_v = thick_v * damp
    areas = mesh_ops.face_areas(vol_verts, faces_j)
    thick = thick_v[faces_j].mean(axis=1)
    volumes = areas * jnp.maximum(thick, cfg.min_frosting_size * spatial_extent)
    _dbg("volumes", volumes)

    # volume-proportional allocation via inverse-CDF sampling:
    # jax.random.categorical materializes an [n, F] Gumbel matrix —
    # 440 GB at the reference budgets (300k gaussians x 394k faces of a
    # 200k-vert shell; this OOM'd the full Shelly run). cumsum + binary
    # search is O(n log F) and exact-in-distribution (same construction
    # as fields.sample_points_in_gaussians).
    #
    # The whole block runs on the HOST CPU backend: it is init-time-only
    # (no gradients), and the eager sort/searchsorted/log sequence at the
    # 300k x 394k reference budget reproducibly crashed the TPU worker
    # process (two full-budget Shelly runs died here; same PRNG keys give
    # identical results on the CPU backend).
    k1, k2, k3 = jax.random.split(key, 3)
    n = cfg.n_gaussians
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        volumes_h = jax.device_put(volumes, cpu)
        p = volumes_h / jnp.maximum(volumes_h.sum(), 1e-30)
        cdf = jnp.cumsum(p)
        u_cell = jax.random.uniform(
            jax.device_put(k1, cpu), (n,), maxval=cdf[-1]
        )
        cell_idx = jnp.clip(
            jnp.searchsorted(cdf, u_cell, side="right"),
            0,
            len(faces_j) - 1,
        ).astype(jnp.int32)
        # SORTED cell assignment (distribution unchanged — every other
        # per-gaussian quantity is sampled iid afterwards): contiguity
        # lets the activation backward reduce corner gradients as prefix
        # differences instead of an N-row scatter-add
        # (see _blend_corners_sorted)
        cell_idx = jnp.sort(cell_idx)
        cell_bounds = jnp.searchsorted(
            cell_idx,
            jnp.arange(len(faces_j) + 1, dtype=jnp.int32),
            side="left",
        ).astype(jnp.int32)

        # random barycentric init: sorted-uniform differences (fm:502-507)
        u = jax.random.uniform(jax.device_put(k2, cpu), (n, 6))
        u = u.at[:, -1].set(1.0)
        u = jnp.sort(u, axis=-1)
        bary = jnp.concatenate([u[:, :1], u[:, 1:] - u[:, :-1]], axis=-1)
        bary_logits = jnp.log(jnp.maximum(bary, 1e-8))
    cell_idx = jnp.asarray(np.asarray(cell_idx))
    cell_bounds = jnp.asarray(np.asarray(cell_bounds))
    bary_logits = jnp.asarray(np.asarray(bary_logits))
    _dbg("allocation", (cell_idx, bary_logits))

    params = FrostingParams(
        shell_verts=shell_verts,
        inner_dist=inner_dist,
        outer_dist=outer_dist,
        bary_logits=bary_logits,
        scales_log=jnp.zeros((n, 3)),
        quats_raw=jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1
        ),
        opacities_raw=jnp.full((n,), float(inverse_sigmoid(jnp.asarray(0.1)))),
        sh_dc=jnp.zeros((n, 1, 3)),
        sh_rest=jnp.zeros((n, sh_ops.num_sh_coeffs(cfg.sh_degree) - 1, 3)),
    )

    # scale init: knn distance among frosting points, clamped by cell size
    pts = gaussian_centers(params, faces_j, cell_idx)
    _dbg("gaussian_centers", pts)
    d2 = jnp.maximum(knn_lib.mean_knn_sqdist(pts, k=3), 1e-7)
    _dbg("scale_knn", d2)
    corners = cell_corners(params, faces_j)
    side = jnp.linalg.norm(
        corners[:, 3:] - corners[:, :3], axis=-1
    )  # [F, 3] prism side lengths
    base = jnp.linalg.norm(
        corners[:, [0, 1, 2]] - corners[:, [1, 2, 0]], axis=-1
    )
    max_len = jnp.maximum(side.max(-1), base.max(-1))[cell_idx]
    scales0 = jnp.sqrt(jnp.minimum(d2, max_len**2))
    params = dataclasses.replace(
        params,
        scales_log=jnp.log(scales0)[:, None].repeat(3, 1),
    )

    # SH transfer from the closest source gaussian (fm:517-556)
    closest, _ = knn_lib.knn_query(pts, g_means, k=1)
    _dbg("sh_transfer_knn", closest)
    closest = closest[:, 0]
    if gaussians is not None:
        params = dataclasses.replace(
            params,
            sh_dc=gaussians.sh_dc[closest],
            sh_rest=gaussians.sh_rest[closest],
        )

    bg = None
    if use_background and gaussians is not None:
        lo = jnp.min(shell_verts, axis=0)
        hi = jnp.max(shell_verts, axis=0)
        inside = jnp.all(
            (gaussians.means3d > lo) & (gaussians.means3d < hi), axis=-1
        )
        bg_mask = (~inside) & (gaussians.mask > 0.5)
        bg = dataclasses.replace(
            gaussians, mask=bg_mask.astype(jnp.float32)
        )
    params = dataclasses.replace(params, bg=bg)
    return params, FrostingMeta(
        faces=faces_j, cell_idx=cell_idx, cell_bounds=cell_bounds
    )


def to_gaussians(p: FrostingParams, meta: FrostingMeta):
    """Convert to plain activated Gaussian arrays (PLY export path,
    convert_frosting_into_gaussians, frosting_model.py:2211-2285)."""
    return activate_frosting(p, meta)
