"""Shell (base mesh) extraction — step 3 of the pipeline.

Re-creates extract_shell_base_from_coarse_sugar (frosting_extractors/
coarse_shell.py:52-909) with TPU-native building blocks:

  per camera:  expected-depth map from the Gaussian rasterizer (the
               point-colors trick replaces the splat-mesh PyTorch3D
               depth raster of coarse_shell.py:283-319) ->
               back-project pixel rays -> sample `n_samples` points over a
               +/- range around the depth -> batched density-field eval
               (KNN-gathered) -> first/last level crossings give OUTER and
               INNER surface points (frosting_model.py:1747-2013); normals
               from the density gradient.
  then:        statistical outlier removal -> FFT Poisson reconstruction ->
               vertex-clustering decimation -> largest-component cleaning
               (stands in for Open3D Poisson/decimate/cluster,
               coarse_shell.py:420-617).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import Camera
from frosting_tpu.models import fields
from frosting_tpu.ops import knn as knn_lib
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.raster.render import render_projected
from frosting_tpu.raster.preprocess import preprocess


@dataclasses.dataclass(frozen=True)
class ShellConfig:
    surface_level: float = 0.3  # train.py:37 default 0.3
    n_ray_samples: int = 21  # frosting_model.py:178 "21 samples over +/-3sigma"
    range_sigma: float = 3.0
    knn_k: int = 16
    # 0 = auto: resolution 2^depth from the NN-distance heuristic
    # (compute_optimal_poisson_depth, coarse_shell.py:17-49), capped at
    # max_poisson_resolution
    poisson_resolution: int = 0
    # 1024^3 = depth 10, the reference's real-scene default
    # (coarse_shell.py:80). Grids >= 512 route to the host-CPU FFT
    # (poisson.FFT_CPU_THRESHOLD) and marching runs in z-slabs, so the
    # solve never touches the chip's HBM.
    max_poisson_resolution: int = 1024
    target_vertices: int = 1_000_000  # high_poly default (train.py:118-121)
    # second decimation target (the reference emits BOTH 1M and 200k
    # meshes per extraction, coarse_shell.py:105-108): when set, the same
    # Poisson mesh is also decimated/cleaned to this budget and returned
    # in aux["low_poly"] = (verts, faces)
    target_vertices_low: int | None = None
    outlier_k: int = 20
    outlier_std: float = 2.0
    # fraction of least-supported Poisson vertices to drop
    # (vertices_density_quantile, coarse_shell.py:466-506; 0.1 for
    # MipNeRF360, 0.0 for Shelly per configs/*.json)
    cleaning_quantile: float = 0.1
    # fg/bg split by camera-centered bbox (coarse_shell.py:382-405): fg
    # within fg_bbox_factor x spatial extent, bg within bg_bbox_factor x;
    # each half gets its own Poisson + cleaning + decimation
    fg_split: bool = False
    fg_bbox_factor: float = 1.0
    bg_bbox_factor: float = 4.0
    # snap mesh verts onto extracted surface points (coarse_shell.py:526-554)
    project_on_surface: bool = True
    # visibility-based connected-component culling (coarse_shell.py:565-617);
    # None disables it and keeps only the largest component
    visibility_threshold: float | None = 0.001
    # Extraction method. "surface" (default) is the paper pipeline
    # (ray-sampled level crossings). The other two are the reference's
    # ablation paths (flags at coarse_shell.py:281-282):
    #   "centers"  — Poisson on the gaussian CENTERS with density-gradient
    #                normals (coarse_shell.py:637-772; the reference
    #                estimates normals by local PCA, estimate_pointcloud_
    #                normals — the density gradient gives the same surface
    #                orientation without a PCA pass and stays on device)
    #   "marching" — iso-surface of the density field on a regular grid
    #                via marching tetrahedra (coarse_shell.py:773-907,
    #                mcubes at 512^3; resolution configurable here)
    method: str = "surface"
    marching_resolution: int = 256
    # centers path: drop near-transparent gaussians before meshing (the
    # reference prunes opacity < 0.5 when loading the coarse model,
    # coarse_shell.py:251-257)
    centers_min_opacity: float = 0.5


@functools.partial(jax.jit, static_argnames=("rcfg",))
def render_depth(means, scales, quats, opac, sh, camera, rcfg: RasterConfig):
    """Alpha-weighted expected depth + mean 3D scale per pixel + alpha."""
    ones = jnp.ones_like(means[:, :1])
    homog = jnp.concatenate([means, ones], axis=-1)
    depth = (homog @ camera.world_view[:, 2:3])[:, 0]
    mean_scale = jnp.mean(scales, axis=-1)
    feat = jnp.stack([depth, mean_scale, jnp.zeros_like(depth)], axis=-1)
    out = render(
        means, scales, quats, opac, sh, camera, rcfg,
        bg=jnp.zeros((3,), jnp.float32), colors_precomp=feat,
    )
    acc = 1.0 - out.t_final
    depth_map = out.image[0] / jnp.maximum(acc, 1e-6)
    scale_map = out.image[1] / jnp.maximum(acc, 1e-6)
    return depth_map, scale_map, acc


@functools.partial(jax.jit, static_argnames=("rcfg", "cfg"))
def level_points_from_camera(
    means, scales, quats, opac,
    camera: Camera,
    rcfg: RasterConfig,
    cfg: ShellConfig,
):
    """Returns (outer_pts [P,3], outer_normals [P,3], inner_pts [P,3],
    valid [P]) for every covered pixel of this camera."""
    sh_dummy = jnp.zeros((means.shape[0], 1, 3), jnp.float32)
    depth_map, scale_map, acc = render_depth(
        means, scales, quats, opac, sh_dummy, camera, rcfg
    )
    h, w = depth_map.shape
    covered = acc > 0.5

    # back-project pixel centers: ray dir in world space
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.0)[None, :].repeat(h, 0)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.0)[:, None].repeat(w, 1)
    fx, fy = camera.focals(rcfg.projection_width, rcfg.projection_height)
    cx = (rcfg.projection_width - 1.0) / 2.0
    cy = (rcfg.projection_height - 1.0) / 2.0
    dir_cam = jnp.stack(
        [(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], axis=-1
    )
    R = camera.world_view[:3, :3]  # row-vector: p_view = p_world @ R
    dir_world = dir_cam @ R.T  # view->world rotation
    origin = camera.cam_center

    t_mid = depth_map  # view-space z equals ray parameter for z-normalized dir
    rng = cfg.range_sigma * jnp.maximum(scale_map, 1e-4)
    ts = jnp.linspace(-1.0, 1.0, cfg.n_ray_samples)
    t_samples = t_mid[..., None] + rng[..., None] * ts  # [H, W, S]
    pts = origin + dir_world[..., None, :] * t_samples[..., None]

    flat_pts = pts.reshape(-1, 3)

    def density_at(p, idx):
        return fields.field_values(
            p, idx, means, opac, scales, quats, beta_mode="average",
            density_factor=1.0,
        ).density

    # Morton index over the refs built ONCE per camera: the per-block
    # knn_query re-sorted the full reference cloud (3 grids x ~84 blocks
    # at a 512^2 x 21-sample sweep) because the joint ref/query bbox made
    # the sort block-dependent; preparing on the camera's full sample set
    # hoists all of it.
    import os as _os

    small_refs = (
        means.shape[0] <= 16384
        or _os.environ.get("SHELL_KNN_HOIST", "1") == "0"
    )
    knn_index = (
        None if small_refs else knn_lib.knn_prepare(means, flat_pts)
    )

    def eval_block(pts_block):
        # batched density passes (the reference evaluates 2M pts/pass,
        # fm:1888-1912): unbatched, the [M, K, 3] neighbor gathers at a
        # 5M-point extraction materialize lane-padded multi-GB arrays
        if small_refs:
            knn_idx, _ = knn_lib.knn_query(pts_block, means, k=cfg.knn_k)
        else:
            knn_idx, _ = knn_lib.knn_query_indexed(
                knn_index, pts_block, k=cfg.knn_k
            )
        return jax.vmap(
            lambda p, idx: jax.value_and_grad(
                lambda q: density_at(q[None], idx[None])[0]
            )(p)
        )(pts_block, knn_idx)

    m = flat_pts.shape[0]
    blk = 65536
    if m <= blk:
        dens, dgrad = eval_block(flat_pts)
    else:
        pad = (-m) % blk
        fp = jnp.concatenate([flat_pts, jnp.zeros((pad, 3), jnp.float32)])
        dens, dgrad = jax.lax.map(eval_block, fp.reshape(-1, blk, 3))
        dens = dens.reshape(-1)[:m]
        dgrad = dgrad.reshape(-1, 3)[:m]
    dens = dens.reshape(h, w, cfg.n_ray_samples)
    dgrad = dgrad.reshape(h, w, cfg.n_ray_samples, 3)

    above = dens > cfg.surface_level  # [H, W, S]
    any_above = jnp.any(above, axis=-1) & covered

    s_idx = jnp.arange(cfg.n_ray_samples)
    first = jnp.argmax(above, axis=-1)  # first above-level sample
    last = (
        cfg.n_ray_samples - 1 - jnp.argmax(above[..., ::-1], axis=-1)
    )

    def interp_crossing(k_after):
        """Linear interp of the crossing between sample k_after-1 and
        k_after (outer: density rises through level)."""
        k0 = jnp.maximum(k_after - 1, 0)
        d0 = jnp.take_along_axis(dens, k0[..., None], -1)[..., 0]
        d1 = jnp.take_along_axis(dens, k_after[..., None], -1)[..., 0]
        t0 = jnp.take_along_axis(t_samples, k0[..., None], -1)[..., 0]
        t1 = jnp.take_along_axis(t_samples, k_after[..., None], -1)[..., 0]
        a = jnp.clip(
            (cfg.surface_level - d0)
            / jnp.where(jnp.abs(d1 - d0) < 1e-12, 1e-12, d1 - d0),
            0.0,
            1.0,
        )
        return t0 + a * (t1 - t0)

    t_outer = interp_crossing(first)
    # inner crossing: density falls back through the level after `last`
    k_in = jnp.minimum(last + 1, cfg.n_ray_samples - 1)
    d_last = jnp.take_along_axis(dens, last[..., None], -1)[..., 0]
    d_in = jnp.take_along_axis(dens, k_in[..., None], -1)[..., 0]
    t_last = jnp.take_along_axis(t_samples, last[..., None], -1)[..., 0]
    t_in = jnp.take_along_axis(t_samples, k_in[..., None], -1)[..., 0]
    a_in = jnp.clip(
        (cfg.surface_level - d_last)
        / jnp.where(jnp.abs(d_in - d_last) < 1e-12, 1e-12, d_in - d_last),
        0.0,
        1.0,
    )
    t_inner = t_last + a_in * (t_in - t_last)

    outer_pts = origin + dir_world * t_outer[..., None]
    inner_pts = origin + dir_world * t_inner[..., None]
    g_outer = jnp.take_along_axis(
        dgrad, first[..., None, None].repeat(3, -1), axis=2
    )[..., 0, :]
    normals = -g_outer / jnp.maximum(
        jnp.linalg.norm(g_outer, axis=-1, keepdims=True), 1e-9
    )
    valid = any_above
    return (
        outer_pts.reshape(-1, 3),
        normals.reshape(-1, 3),
        inner_pts.reshape(-1, 3),
        valid.reshape(-1),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _density_grad_block(
    pts_block, means, scales, quats, opac, k: int, knn_index=None
):
    """(density, d density/d point) for one block of query points.
    Pass knn_index (ops.knn.knn_prepare over `means`) to skip the
    per-block reference re-sort when sweeping many blocks."""
    if knn_index is None:
        knn_idx, _ = knn_lib.knn_query(pts_block, means, k=k)
    else:
        knn_idx, _ = knn_lib.knn_query_indexed(knn_index, pts_block, k=k)

    def density_at(p, idx):
        return fields.field_values(
            p[None], idx[None], means, opac, scales, quats,
            beta_mode="average", density_factor=1.0,
        ).density[0]

    return jax.vmap(
        lambda p, idx: jax.value_and_grad(lambda q: density_at(q, idx))(p)
    )(pts_block, knn_idx)


def eval_density_blocks(
    means, scales, quats, opac, pts: np.ndarray, k: int, block: int = 65536
):
    """Blocked density(+gradient) evaluation over an arbitrary point set
    (the reference's 2M-points-per-pass loop, coarse_shell.py:799-805).
    Returns numpy (density [M], grad [M, 3])."""
    m = len(pts)
    out_d = np.empty((m,), np.float32)
    out_g = np.empty((m, 3), np.float32)
    # index over the fixed refs built once for the whole sweep; the
    # query-bbox requirement is satisfied by the two bbox corner points
    knn_index = None
    if means.shape[0] > 16384 and m > block:
        corners = jnp.asarray(
            np.stack([np.min(pts, axis=0), np.max(pts, axis=0)]),
            jnp.float32,
        )
        knn_index = knn_lib.knn_prepare(means, corners)
    for i in range(0, m, block):
        blk = np.asarray(pts[i : i + block], np.float32)
        pad = block - len(blk)
        if pad:
            blk = np.concatenate([blk, np.zeros((pad, 3), np.float32)])
        d, g = _density_grad_block(
            jnp.asarray(blk), means, scales, quats, opac, k, knn_index
        )
        out_d[i : i + block] = np.asarray(d)[: m - i]
        out_g[i : i + block] = np.asarray(g)[: m - i]
    return out_d, out_g


def _centers_point_cloud(means, scales, quats, opac, cfg: ShellConfig):
    """Ablation point cloud: gaussian centers + density-gradient normals
    (coarse_shell.py:637-772)."""
    keep = np.asarray(opac) >= cfg.centers_min_opacity
    pts = np.asarray(means)[keep]
    _d, g = eval_density_blocks(
        means, scales, quats, opac, pts, k=cfg.knn_k
    )
    n = -g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-9)
    return pts, n


def _marching_mesh(
    means, scales, quats, opac, cameras, cfg: ShellConfig, verbose
):
    """Ablation mesh: marching tetrahedra over a regular density grid
    spanning +/- the camera spatial extent around the mean camera center
    (coarse_shell.py:773-907 uses 512^3 mcubes on the same bbox)."""
    centers = np.stack([np.asarray(c.cam_center) for c in cameras])
    avg = centers.mean(axis=0)
    extent = 1.1 * float(np.linalg.norm(centers - avg[None], axis=1).max())
    res = cfg.marching_resolution
    lin = np.linspace(-1.0, 1.0, res, dtype=np.float32) * extent
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = (
        np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + avg[None]
    ).astype(np.float32)
    dens, _g = eval_density_blocks(means, scales, quats, opac, pts, cfg.knn_k)
    grid = dens.reshape(res, res, res)
    spacing = (2.0 * extent / (res - 1),) * 3
    origin = tuple(avg - extent)
    from frosting_tpu.extract import marching

    verts, faces = marching.marching_tets(
        grid, cfg.surface_level, origin=origin, spacing=spacing
    )
    if verbose:
        print(
            f"[shell/marching] res {res}: {len(verts)} verts "
            f"{len(faces)} faces pre-decimation"
        )
    return verts, faces


def auto_poisson_resolution(
    points: np.ndarray,
    max_resolution: int = 256,
    cell_size_nn_distance_ratio: float = 100.0,
    quantile: float = 0.1,
) -> int:
    """Grid resolution 2^depth from the reference's auto-depth heuristic
    (compute_optimal_poisson_depth, coarse_shell.py:17-49):
    depth = floor(-log2(ratio * q)) where q is the 10%-quantile
    **SQUARED** NN distance normalized by the bbox size — PyTorch3D's
    knn_points returns squared distances and the reference feeds them in
    unrooted, so ratio=100 is calibrated against d^2/bbox (a linear-d
    reading of the same formula yields depth <= 2 on any real scene)."""
    if len(points) < 4:
        return 64
    sub = points
    if len(sub) > 100_000:
        sub = sub[:: len(sub) // 100_000]
    from scipy.spatial import cKDTree

    bbox = 1.1 * float(np.max(sub.max(0) - sub.min(0)))
    d, _ = cKDTree(sub).query(sub, k=2, workers=-1)
    q = float(np.quantile(d[:, 1], quantile)) ** 2 / max(bbox, 1e-12)
    depth = int(np.floor(-np.log2(max(cell_size_nn_distance_ratio * q, 1e-12))))
    depth = max(6, min(depth, int(np.log2(max_resolution))))
    return 1 << depth


def _reconstruct_half(pts, nrm, cfg: ShellConfig, verbose, tag):
    """Outliers -> Poisson (auto depth) -> quantile clean for one half."""
    from frosting_tpu.extract import meshclean, poisson

    if len(pts) < 16:
        return None
    pts_f, _keep, (nrm_f,) = meshclean.remove_statistical_outliers(
        pts, k=cfg.outlier_k, std_ratio=cfg.outlier_std, extra=[nrm]
    )
    res = cfg.poisson_resolution or auto_poisson_resolution(
        pts_f, cfg.max_poisson_resolution
    )
    verts, faces = poisson.poisson_reconstruct(pts_f, nrm_f, resolution=res)
    if verbose:
        print(
            f"[shell/{tag}] poisson res {res}: "
            f"{len(verts)} verts {len(faces)} faces"
        )
    verts, faces = meshclean.remove_unsupported_vertices(
        verts, faces, pts_f, cfg.cleaning_quantile
    )
    return verts, faces, res


def extract_shell(
    means, scales, quats, opac,
    cameras: List[Camera],
    rcfg: RasterConfig,
    cfg: ShellConfig = ShellConfig(),
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Full shell extraction. Returns (verts, faces, aux) with aux holding
    the raw surface points/normals and per-vertex inner/outer info for the
    frosting stage."""
    from frosting_tpu.extract import meshclean

    if cfg.method == "marching":
        verts, faces = _marching_mesh(
            means, scales, quats, opac, cameras, cfg, verbose
        )
        verts, faces = meshclean.decimate(verts, faces, cfg.target_vertices)
        if cfg.visibility_threshold is not None:
            verts, faces = meshclean.visibility_cull_components(
                verts, faces, cameras, rcfg, cfg.visibility_threshold
            )
        else:
            verts, faces = meshclean.largest_component(verts, faces)
        if verbose:
            print(
                f"[shell] cleaned mesh: {len(verts)} verts "
                f"{len(faces)} faces"
            )
        from frosting_tpu.ops import mesh as mesh_ops

        vn = np.asarray(
            mesh_ops.vertex_normals(
                jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32)
            )
        )
        aux = {
            "surface_points": verts,
            "surface_normals": vn,
            "inner_points": verts,
        }
        return verts, faces, aux

    if cfg.method == "centers":
        pts, nrm = _centers_point_cloud(means, scales, quats, opac, cfg)
        inner = pts
        if verbose:
            print(f"[shell] {len(pts)} gaussian centers as surface points")
        return _mesh_from_point_cloud(
            pts, nrm, inner, cameras, rcfg, cfg, verbose
        )
    if cfg.method != "surface":
        raise ValueError(f"unknown extraction method {cfg.method!r}")

    import time as _time

    all_pts, all_nrm, all_inner = [], [], []
    t_cams = _time.time()
    for i, cam in enumerate(cameras):
        o, nrm, inner, valid = level_points_from_camera(
            means, scales, quats, opac, cam, rcfg, cfg
        )
        v = np.asarray(valid)
        all_pts.append(np.asarray(o)[v])
        all_nrm.append(np.asarray(nrm)[v])
        all_inner.append(np.asarray(inner)[v])
        if verbose:
            print(
                f"[shell] camera {i + 1}/{len(cameras)}: "
                f"{int(v.sum())} level points",
                flush=True,
            )
    t_cams = _time.time() - t_cams
    pts = np.concatenate(all_pts)
    nrm = np.concatenate(all_nrm)
    inner = np.concatenate(all_inner)
    if verbose:
        print(
            f"[shell] {len(pts)} surface points from {len(cameras)} "
            f"cameras in {t_cams:.1f} s "
            f"({t_cams / max(len(cameras), 1):.2f} s/camera)"
        )
    verts, faces, aux = _mesh_from_point_cloud(
        pts, nrm, inner, cameras, rcfg, cfg, verbose
    )
    aux["timings"] = dict(
        aux.get("timings", {}),
        level_points_s=round(t_cams, 2),
        per_camera_s=round(t_cams / max(len(cameras), 1), 3),
    )
    return verts, faces, aux


def _mesh_from_point_cloud(
    pts, nrm, inner, cameras, rcfg: RasterConfig, cfg: ShellConfig, verbose
):
    """Shared reconstruction tail: (oriented point cloud) -> fg/bg Poisson
    -> quantile clean -> decimate -> projection -> visibility culling."""
    from frosting_tpu.extract import meshclean

    import time as _time

    t_poisson = _time.time()
    if cfg.fg_split:
        # camera-centered fg/bg split (coarse_shell.py:382-405)
        centers = np.stack([np.asarray(c.cam_center) for c in cameras])
        avg = centers.mean(axis=0)
        extent = 1.1 * float(
            np.linalg.norm(centers - avg[None], axis=1).max()
        )
        off = np.abs(pts - avg[None]).max(axis=1)
        fg_mask = off < cfg.fg_bbox_factor * extent
        bg_mask = (~fg_mask) & (off < cfg.bg_bbox_factor * extent)
        raw_halves = [
            h
            for h in (
                _reconstruct_half(pts[m], nrm[m], cfg, verbose, tag)
                for m, tag in ((fg_mask, "fg"), (bg_mask, "bg"))
            )
            if h is not None
        ]
    else:
        raw_halves = [_reconstruct_half(pts, nrm, cfg, verbose, "all")]
        raw_halves = [h for h in raw_halves if h is not None]
    if not raw_halves:
        raise ValueError(
            "shell extraction found no reconstructable surface: every "
            "fg/bg half had fewer than 16 level-crossing points (check "
            "surface_level / camera coverage / the coarse model's opacity)"
        )
    poisson_res = [r for _v, _f, r in raw_halves]
    raw_halves = [(v, f) for v, f, _r in raw_halves]
    t_poisson = _time.time() - t_poisson

    def finalize(target):
        """Decimate the shared Poisson halves to one budget and run the
        clean tail (projection + visibility culling)."""
        halves = [
            meshclean.decimate(v, f, target) for v, f in raw_halves
        ]
        verts, faces = meshclean.merge_meshes(halves)
        if cfg.project_on_surface:
            verts = meshclean.project_on_points(verts, pts)
        if cfg.visibility_threshold is not None:
            verts, faces = meshclean.visibility_cull_components(
                verts, faces, cameras, rcfg, cfg.visibility_threshold
            )
        else:
            verts, faces = meshclean.largest_component(verts, faces)
        return verts, faces

    t_finalize = _time.time()
    verts, faces = finalize(cfg.target_vertices)
    t_finalize = _time.time() - t_finalize
    if verbose:
        print(
            f"[shell] cleaned mesh: {len(verts)} verts {len(faces)} faces "
            f"(poisson {t_poisson:.1f} s, clean tail {t_finalize:.1f} s)"
        )
    aux = {
        "surface_points": pts,
        "surface_normals": nrm,
        "inner_points": inner,
        "poisson_resolutions": poisson_res,
        "timings": {
            "poisson_s": round(t_poisson, 2),
            "finalize_s": round(t_finalize, 2),
        },
    }
    # second budget from the same reconstruction (coarse_shell.py:105-108
    # emits both the 1M high-poly and 200k low-poly meshes per run)
    if cfg.target_vertices_low:
        lv, lf = finalize(cfg.target_vertices_low)
        aux["low_poly"] = (lv, lf)
        if verbose:
            print(f"[shell] low-poly mesh: {len(lv)} verts {len(lf)} faces")
    return verts, faces, aux
