"""End-to-end Frosting pipeline orchestration.

The single-call analogue of train_full_pipeline.py (reference :121-208),
running all stages in-process instead of chaining subprocesses:

  1. vanilla 3DGS optimization               (train/gs_trainer.py)
  2. coarse SuGaR surface regularization     (train/sugar_trainer.py)
  3. shell base-mesh extraction              (extract/shell.py)
  4. frosting layer initialization           (models/frosting.py)
  5. frosting refinement                     (train/frosting_trainer.py)
  6. exports: PLY (3DGS-viewer-compatible)   (scene/gaussians.py, utils/ply.py)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import Camera
from frosting_tpu.extract.shell import ShellConfig, extract_shell
from frosting_tpu.models import frosting as frosting_lib
from frosting_tpu.raster import RasterConfig
from frosting_tpu.scene.gaussians import activate
from frosting_tpu.train import frosting_trainer, gs_trainer, sugar_trainer


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    gs: gs_trainer.GSTrainConfig = gs_trainer.GSTrainConfig()
    sugar: sugar_trainer.SugarTrainConfig = sugar_trainer.SugarTrainConfig()
    shell: ShellConfig = ShellConfig()
    frosting: frosting_lib.FrostingConfig = frosting_lib.FrostingConfig()
    refine: frosting_trainer.FrostingTrainConfig = (
        frosting_trainer.FrostingTrainConfig()
    )
    use_background_gaussians: bool = False
    # optional refined-SuGaR stage between shell extraction and frosting
    # (the reference's refined mesh-bound SuGaR, sugar_model.py:186-360):
    # 0 = skip; >0 = train that many iterations of mesh-bound Gaussians
    # on the extracted shell and report it in the results dict
    refined_sugar_iterations: int = 0
    refined_sugar_n_per_triangle: int = 6


def run_pipeline(
    cameras: List[Camera],
    gt_images: np.ndarray,
    points: np.ndarray,
    colors: np.ndarray,
    spatial_extent: float,
    rcfg: RasterConfig,
    cfg: PipelineConfig,
    seed: int = 0,
    log_fn=print,
    cache_dir: Optional[str] = None,
) -> Dict:
    """Run stages 1-5; returns a dict with every stage's artifacts.

    cache_dir: optional stage-artifact caching (the in-process analogue
    of the reference's inter-stage artifact files,
    train_full_pipeline.py:155-208): completed stages write their hand-off
    artifact there and are SKIPPED on a re-run — a multi-hour full-budget
    pipeline survives a transient crash (e.g. a TPU worker restart)
    without redoing finished stages. Skipped stages leave their history
    entries (gs_state etc.) unset in the result."""
    import os

    out: Dict = {}
    ck = (lambda n: os.path.join(cache_dir, n)) if cache_dir else None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)

    def _save_gaussians(path, p):
        np.savez(
            path,
            **{
                f.name: np.asarray(getattr(p, f.name))
                for f in dataclasses.fields(p)
            },
        )

    def _load_gaussians(path):
        from frosting_tpu.scene.gaussians import GaussianParams

        z = np.load(path)
        return GaussianParams(
            **{
                f.name: jnp.asarray(z[f.name])
                for f in dataclasses.fields(GaussianParams)
            }
        )

    if ck and os.path.exists(ck("sugar_params.npz")):
        if log_fn:
            log_fn("=== stages 1-2: resumed from cache ===")
        params = _load_gaussians(ck("sugar_params.npz"))
        out["sugar_params"] = params
    else:
        if log_fn:
            log_fn("=== stage 1: vanilla 3DGS ===")
        state, gs_hist = gs_trainer.train(
            cameras, gt_images, points, colors, spatial_extent, rcfg, cfg.gs,
            seed=seed, log_fn=log_fn,
        )
        out["gs_state"] = state
        out["gs_history"] = gs_hist

        if log_fn:
            log_fn("=== stage 2: coarse SuGaR ===")
        params, sugar_hist = sugar_trainer.train(
            state.params, spatial_extent, cameras, gt_images, rcfg, cfg.sugar,
            seed=seed, log_fn=log_fn,
        )
        out["sugar_params"] = params
        out["sugar_history"] = sugar_hist
        if ck:
            _save_gaussians(ck("sugar_params.npz"), params)

    # compact away dead arena slots (parked at 1e6) before the host-driven
    # extraction/init stages: they would wreck the KNN Morton quantization
    # and misalign SH-transfer indices
    live = np.asarray(params.mask) > 0.5
    params_live = type(params)(
        **{
            f.name: jnp.asarray(np.asarray(getattr(params, f.name))[live])
            for f in dataclasses.fields(params)
        }
    )
    means, scales, quats, opac, _sh = activate(params_live)

    if ck and os.path.exists(ck("shell.npz")):
        if log_fn:
            log_fn("=== stage 3: resumed from cache ===")
        z = np.load(ck("shell.npz"))
        verts, faces = z["verts"], z["faces"]
        shell_aux = {
            "poisson_resolutions": [int(r) for r in z["poisson_res"]]
        }
    else:
        if log_fn:
            log_fn("=== stage 3: shell extraction ===")
        verts, faces, shell_aux = extract_shell(
            means, scales, quats, opac, cameras, rcfg, cfg.shell,
            verbose=bool(log_fn),
        )
        if ck:
            np.savez(
                ck("shell.npz"),
                verts=np.asarray(verts),
                faces=np.asarray(faces),
                poisson_res=np.asarray(
                    shell_aux.get("poisson_resolutions", []), np.int64
                ),
            )
    out["shell_verts"] = verts
    out["shell_faces"] = faces
    out["shell_poisson_resolutions"] = shell_aux.get(
        "poisson_resolutions", []
    )

    if cfg.refined_sugar_iterations > 0:
        if log_fn:
            log_fn("=== stage 3b: refined SuGaR (mesh-bound) ===")
        rs_params, rs_meta, rs_hist = train_refined_sugar(
            verts, faces, means, params_live, spatial_extent,
            cameras, gt_images, rcfg,
            iterations=cfg.refined_sugar_iterations,
            n_per_triangle=cfg.refined_sugar_n_per_triangle,
            white_background=cfg.refine.white_background,
            seed=seed, log_fn=log_fn,
        )
        out["refined_sugar_params"] = rs_params
        out["refined_sugar_meta"] = rs_meta
        out["refined_sugar_history"] = rs_hist

    if ck and os.path.exists(ck("frosting_init.npz")):
        if log_fn:
            log_fn("=== stage 4: resumed from cache ===")
        from frosting_tpu.train import checkpoint as ckpt_lib

        fparams, meta = ckpt_lib.load_frosting(ck("frosting_init.npz"))
    else:
        if log_fn:
            log_fn("=== stage 4: frosting init ===")
        fparams, meta = frosting_lib.init_frosting(
            jax.random.key(seed), verts, faces, means, scales, quats, opac,
            params_live, cfg.frosting, spatial_extent,
            use_background=cfg.use_background_gaussians,
        )
        if ck:
            from frosting_tpu.train import checkpoint as ckpt_lib

            ckpt_lib.save_frosting(ck("frosting_init.npz"), fparams, meta)
    out["frosting_meta"] = meta

    if log_fn:
        log_fn("=== stage 5: frosting refinement ===")
    fparams, refine_hist = frosting_trainer.train(
        fparams, meta, spatial_extent, cameras, gt_images, rcfg, cfg.refine,
        seed=seed, log_fn=log_fn,
    )
    out["frosting_params"] = fparams
    out["refine_history"] = refine_hist
    return out


def train_refined_sugar(
    verts,
    faces,
    coarse_means,
    coarse_params,
    spatial_extent: float,
    cameras: List[Camera],
    gt_images: np.ndarray,
    rcfg: RasterConfig,
    iterations: int = 2_000,
    n_per_triangle: int = 6,
    white_background: bool = False,
    seed: int = 0,
    log_fn=print,
):
    """Refined mesh-bound SuGaR on an extracted shell: pins flat Gaussians
    to the mesh triangles (sugar_model.py:186-360) and optimizes their
    in-plane scales / rotations / opacity / SH against the photometric
    loss. SH-dc is seeded from each vertex's nearest coarse Gaussian.
    Returns (MeshBoundParams, MeshBoundMeta, history)."""
    from frosting_tpu.models import mesh_bound as mb_lib
    from frosting_tpu.ops import knn as knn_lib
    from frosting_tpu.ops import sh as sh_ops
    from frosting_tpu.train import refined_sugar as rs_trainer

    idx, _ = knn_lib.knn_query(
        jnp.asarray(verts, jnp.float32), jnp.asarray(coarse_means), k=1
    )
    vert_colors = np.asarray(
        sh_ops.sh_to_rgb(coarse_params.sh_dc[idx[:, 0], 0])
    )
    rs_params, rs_meta = mb_lib.init_mesh_bound(
        np.asarray(verts), np.asarray(faces),
        n_per_triangle=n_per_triangle, vertex_colors=vert_colors,
    )
    rs_cfg = rs_trainer.MeshBoundTrainConfig(
        iterations=iterations, lr_max_steps=iterations,
        white_background=white_background,
    )
    rs_params, rs_hist = rs_trainer.train(
        rs_params, rs_meta, spatial_extent, cameras, gt_images, rcfg,
        rs_cfg, seed=seed, log_fn=log_fn,
    )
    return rs_params, rs_meta, rs_hist


def export_gaussians_ply(means, scales, quats, opac, sh, path: str) -> None:
    """Write plain Gaussian arrays as a 3DGS-viewer-compatible PLY
    (gaussian_model.py:177-208 field layout)."""
    from frosting_tpu.utils import ply as ply_io

    n = means.shape[0]
    means = np.asarray(means)
    props = {
        "x": means[:, 0],
        "y": means[:, 1],
        "z": means[:, 2],
        "nx": np.zeros(n, np.float32),
        "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    sh = np.asarray(sh)
    dc = sh[:, :1].transpose(0, 2, 1).reshape(n, -1)
    for i in range(dc.shape[1]):
        props[f"f_dc_{i}"] = dc[:, i]
    rest = sh[:, 1:].transpose(0, 2, 1).reshape(n, -1)
    for i in range(rest.shape[1]):
        props[f"f_rest_{i}"] = rest[:, i]
    opac = np.clip(np.asarray(opac), 1e-6, 1 - 1e-6)
    props["opacity"] = np.log(opac / (1 - opac)).astype(np.float32)
    scl = np.log(np.maximum(np.asarray(scales), 1e-12))
    for i in range(3):
        props[f"scale_{i}"] = scl[:, i]
    q = np.asarray(quats)
    for i in range(4):
        props[f"rot_{i}"] = q[:, i]
    ply_io.write_ply(path, props)


def export_frosting_ply(fparams, meta, path: str) -> None:
    """Export the refined frosting as a 3DGS-viewer PLY
    (convert_frosting_into_gaussians -> save_ply, refine.py:585-599)."""
    means, scales, quats, opac, sh = frosting_lib.to_gaussians(fparams, meta)
    export_gaussians_ply(means, scales, quats, opac, sh, path)
