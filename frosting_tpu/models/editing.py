"""Editing / animation runtime: pose the shell, adapt the frosting.

Re-creates the Blender-package editing stack (blender/frosting_utils.py,
frosting_model.py editability machinery :900-1183) in the functional
design. Because frosting Gaussian CENTERS are a pure function of the shell
(softmax-bary over cell corners), editing positions is free — replace
shell_verts and re-render. What needs explicit adaptation is the
second-order geometry: per-cell affine transforms rotate/scale each
Gaussian's covariance (the reference's torch.linalg.solve canonical
transforms, frosting_model.py:1013-1121) and rotate its SH through the view
direction (get_frosting_sh_rotations, blender/frosting_utils.py:519-534).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.models import frosting as frosting_lib
from frosting_tpu.ops import cov as cov_ops
from frosting_tpu.ops import quat as quat_ops


def cell_affine_transforms(
    ref_corners: jnp.ndarray,  # [F, 6, 3]
    new_corners: jnp.ndarray,  # [F, 6, 3]
) -> jnp.ndarray:
    """Least-squares linear map per cell: A minimizing ||A Xc - Yc|| over
    the 6 centered corners (the reference solves the same normal equations
    with torch.linalg.solve, frosting_model.py:1114-1119). Returns
    [F, 3, 3]."""
    xc = ref_corners - ref_corners.mean(axis=1, keepdims=True)
    yc = new_corners - new_corners.mean(axis=1, keepdims=True)
    hi = jax.lax.Precision.HIGHEST
    xtx = jnp.einsum("fka,fkb->fab", xc, xc, precision=hi)
    ytx = jnp.einsum("fka,fkb->fab", yc, xc, precision=hi)
    # regularize for degenerate (flat) cells
    xtx = xtx + 1e-8 * jnp.eye(3)
    return jnp.linalg.solve(
        jnp.swapaxes(xtx, -1, -2), jnp.swapaxes(ytx, -1, -2)
    ).swapaxes(-1, -2)


class EditedGaussians(NamedTuple):
    means: jnp.ndarray
    cov6: jnp.ndarray  # transformed covariance (feed cov3d_precomp)
    opacities: jnp.ndarray
    sh: jnp.ndarray
    sh_rotations: jnp.ndarray  # [N, 4] quats rotating view dirs for SH


def thickness_rescale_factors(
    ref_verts: jnp.ndarray,  # [V, 3] shell verts at make-editable time
    new_verts: jnp.ndarray,  # [V, 3] edited shell verts
    faces: jnp.ndarray,  # [F, 3]
    mode: str = "median",
) -> jnp.ndarray:
    """Per-vertex factor rescaling the frosting thickness when the mesh is
    edited (frosting_model.py:649-705 outer_verts/inner_verts editable
    properties). "median": one global factor = median corner-to-centroid
    distance ratio over all faces. "triangle": per-face median-corner ratio
    scatter-averaged onto vertices. "none": ones."""
    v = ref_verts.shape[0]
    if mode == "none":
        return jnp.ones((v,), jnp.float32)

    def corner_dists(verts):
        tri = verts[faces]  # [F, 3, 3]
        return jnp.linalg.norm(
            tri - tri.mean(axis=1, keepdims=True), axis=-1
        )  # [F, 3]

    ref_d = corner_dists(ref_verts)
    new_d = corner_dists(new_verts)
    if mode == "median":
        factor = jnp.median(new_d) / jnp.maximum(jnp.median(ref_d), 1e-12)
        return jnp.full((v,), factor, jnp.float32)
    if mode == "triangle":
        per_face = jnp.median(new_d, axis=-1) / jnp.maximum(
            jnp.median(ref_d, axis=-1), 1e-12
        )  # [F]
        num = jnp.zeros((v,), jnp.float32).at[faces.reshape(-1)].add(
            jnp.repeat(per_face, 3)
        )
        cnt = jnp.zeros((v,), jnp.float32).at[faces.reshape(-1)].add(1.0)
        return num / jnp.maximum(cnt, 1.0)
    raise ValueError(f"unknown thickness rescale mode: {mode}")


def adapt_frosting(
    params: frosting_lib.FrostingParams,
    meta: frosting_lib.FrostingMeta,
    new_shell_verts: jnp.ndarray,
    deformation_threshold: float = 2.0,
    thickness_rescale: str = "median",
) -> EditedGaussians:
    """Render-ready Gaussians for an edited/posed shell
    ('complex' adaptation: full per-cell affine on the covariance).

    deformation_threshold: Gaussians whose cell stretched by more than this
    factor get opacity zeroed (render_blender_scene.py deformation masking,
    blender/frosting_utils.py:537-548).
    thickness_rescale: "median" | "triangle" | "none" — rescale the shell
    thickness with the local triangle size of the edited mesh
    (render_blender_scene.py --editable_thickness flags, fm:649-705)."""
    factor = thickness_rescale_factors(
        params.shell_verts, new_shell_verts, meta.faces, thickness_rescale
    )
    edited = dataclasses.replace(
        params,
        shell_verts=new_shell_verts,
        inner_dist=params.inner_dist * factor,
        outer_dist=params.outer_dist * factor,
    )

    ref_corners = frosting_lib.cell_corners(params, meta.faces)
    new_corners = frosting_lib.cell_corners(edited, meta.faces)
    A = cell_affine_transforms(ref_corners, new_corners)  # [F, 3, 3]
    A_g = A[meta.cell_idx]  # [N, 3, 3]

    means = frosting_lib.gaussian_centers(edited, meta.faces, meta.cell_idx)
    scales = jnp.exp(params.scales_log)
    quats = quat_ops.normalize(params.quats_raw)
    cov6 = cov_ops.cov3d_from_scale_quat(scales, quats)
    sigma = cov_ops.unpack_cov3d(cov6)
    hi = jax.lax.Precision.HIGHEST
    sigma_new = jnp.einsum(
        "nab,nbc,ndc->nad", A_g, sigma, A_g, precision=hi
    )
    cov6_new = jnp.stack(
        [
            sigma_new[:, 0, 0],
            sigma_new[:, 0, 1],
            sigma_new[:, 0, 2],
            sigma_new[:, 1, 1],
            sigma_new[:, 1, 2],
            sigma_new[:, 2, 2],
        ],
        axis=-1,
    )

    # deformation masking — exact reference semantics
    # (_get_edited_points_deformation_mask, blender/frosting_utils.py:
    # 535-548): per-face ratio = max over corners of corner-to-centroid
    # distance new/reference; Gaussians in faces stretched beyond the
    # threshold get opacity zeroed
    def corner_dists(verts):
        tri = verts[meta.faces]
        return jnp.linalg.norm(tri - tri.mean(axis=1, keepdims=True), axis=-1)

    ratios = jnp.max(
        corner_dists(new_shell_verts)
        / jnp.maximum(corner_dists(params.shell_verts), 1e-12),
        axis=-1,
    )  # [F]
    opac = jax.nn.sigmoid(params.opacities_raw)
    opac = jnp.where(
        ratios[meta.cell_idx] > deformation_threshold, 0.0, opac
    )

    # SH rotation: rotate view dirs by the cell's rotation delta (polar part
    # of A), the analogue of get_frosting_sh_rotations' quat delta
    u, _s, vt = jnp.linalg.svd(A_g)
    R = u @ vt
    det = jnp.linalg.det(R)
    # ensure proper rotations
    u_fix = u.at[:, :, 2].multiply(jnp.sign(det)[:, None])
    R = u_fix @ vt
    sh_rot = quat_ops.from_matrix(R)

    sh = jnp.concatenate([params.sh_dc, params.sh_rest], axis=1)
    return EditedGaussians(
        means=means, cov6=cov6_new, opacities=opac, sh=sh, sh_rotations=sh_rot
    )


def _face_frames(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """[F, 3, 3] orthonormal frame per face (rows: tangent, bitangent,
    normal)."""
    tri = verts[faces]
    t1 = tri[:, 1] - tri[:, 0]
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([t1, t2, n], axis=1)


def adapt_frosting_simple(
    params: frosting_lib.FrostingParams,
    meta: frosting_lib.FrostingMeta,
    new_shell_verts: jnp.ndarray,
    thickness_rescale: str = "median",
) -> EditedGaussians:
    """'Simple' adaptation (use_simple_adapt, frosting_model.py:739-791):
    each Gaussian rigidly follows its cell's face rotation
    (q' = q_face_delta * q) and its scales are multiplied by the thickness
    factor — faster than the full per-cell affine, less accurate under
    shear."""
    edited = dataclasses.replace(params, shell_verts=new_shell_verts)
    means = frosting_lib.gaussian_centers(edited, meta.faces, meta.cell_idx)

    ref_f = _face_frames(params.shell_verts, meta.faces)  # [F, 3, 3]
    new_f = _face_frames(new_shell_verts, meta.faces)
    # rotation sending the reference basis to the new basis: with row-stacked
    # orthonormal frames B, R = B_new^T @ B_ref  (R @ t_ref = t_new)
    R = jnp.einsum("fab,fac->fbc", new_f, ref_f)[meta.cell_idx]
    delta = quat_ops.from_matrix(R)
    quats = quat_ops.normalize(params.quats_raw)
    quats_new = quat_ops.multiply(delta, quats)

    factor = thickness_rescale_factors(
        params.shell_verts, new_shell_verts, meta.faces, thickness_rescale
    )
    # per-gaussian factor: mean of its cell's vertex factors
    f_g = factor[meta.faces[meta.cell_idx]].mean(axis=-1)
    scales = jnp.exp(params.scales_log) * f_g[:, None]
    cov6 = cov_ops.cov3d_from_scale_quat(scales, quats_new)

    opac = jax.nn.sigmoid(params.opacities_raw)
    sh = jnp.concatenate([params.sh_dc, params.sh_rest], axis=1)
    return EditedGaussians(
        means=means, cov6=cov6, opacities=opac, sh=sh, sh_rotations=delta
    )


def render_edited(
    eg: EditedGaussians, camera, rcfg, bg=None, active_sh_degree: int = 3
):
    """Render adapted Gaussians (uses the rasterizer's cov3d_precomp path;
    SH is evaluated along rotated view dirs)."""
    from frosting_tpu.ops import sh as sh_ops
    from frosting_tpu.raster import render

    # rotate view dirs per gaussian: dir' = R^T dir
    dirs = eg.means - camera.cam_center
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
    )
    dirs_rot = quat_ops.apply(quat_ops.conjugate(eg.sh_rotations), dirs)
    colors = jnp.maximum(
        sh_ops.eval_sh(active_sh_degree, eg.sh, dirs_rot) + 0.5, 0.0
    )
    dummy_scales = jnp.ones((eg.means.shape[0], 3), jnp.float32)
    dummy_quats = jnp.concatenate(
        [jnp.ones((eg.means.shape[0], 1)), jnp.zeros((eg.means.shape[0], 3))],
        axis=1,
    )
    return render(
        eg.means, dummy_scales, dummy_quats, eg.opacities, eg.sh,
        camera, rcfg, bg=bg, colors_precomp=colors, cov3d_precomp=eg.cov6,
    )


# --- linear blend skinning + Blender package loading ---


def lbs_pose_verts(
    tpose_points: jnp.ndarray,  # [V, 3]
    bone_weights: jnp.ndarray,  # [V, B]
    rest_matrices: jnp.ndarray,  # [B, 4, 4] bone rest transforms
    pose_matrices: jnp.ndarray,  # [B, 4, 4] bone pose transforms
) -> jnp.ndarray:
    """v' = sum_b w_vb * M_pose_b @ M_rest_b^-1 @ v  (apply_poses_to_scene,
    blender/frosting_utils.py:474-516). Matrices column-vector convention."""
    deltas = jnp.einsum(
        "bij,bjk->bik", pose_matrices, jnp.linalg.inv(rest_matrices)
    )  # [B, 4, 4]
    homog = jnp.concatenate(
        [tpose_points, jnp.ones_like(tpose_points[:, :1])], axis=-1
    )
    per_bone = jnp.einsum("bij,vj->vbi", deltas, homog)[..., :3]  # [V, B, 3]
    return jnp.sum(bone_weights[..., None] * per_bone, axis=1)


class CompositeScene(NamedTuple):
    """Several frosting models merged into one renderable scene
    (build_composite_scene, blender/frosting_utils.py:171-471)."""

    params: frosting_lib.FrostingParams
    meta: frosting_lib.FrostingMeta
    vert_ranges: np.ndarray  # [M, 2] shell-vertex [start, end) per model
    gauss_ranges: np.ndarray  # [M, 2] gaussian [start, end) per model


def transform_background(bg, T):
    """Rigid+uniform-scale world transform of background Gaussians
    (reference: bg points transformed and quats premultiplied by the
    world rotation, blender/frosting_utils.py:364-371; bg is not bound to
    any shell so editing leaves it rigid)."""
    import jax.numpy as jnp

    T = jnp.asarray(T, jnp.float32)
    t3 = T[:3, :3]
    s = jnp.abs(jnp.linalg.det(t3)) ** (1.0 / 3.0)
    rot = t3 / jnp.maximum(s, 1e-12)
    homog = jnp.concatenate(
        [bg.means3d, jnp.ones_like(bg.means3d[:, :1])], -1
    )
    rq = quat_ops.from_matrix(rot[None])[0]
    return dataclasses.replace(
        bg,
        means3d=(homog @ T.T)[:, :3],
        quats_raw=quat_ops.multiply(
            jnp.broadcast_to(rq, bg.quats_raw.shape), bg.quats_raw
        ),
        scales_log=bg.scales_log + jnp.log(jnp.maximum(s, 1e-12)),
    )


def background_to_edited(bg) -> EditedGaussians:
    """Activate background Gaussians into EditedGaussians rows so the
    editing render can composite them with the adapted frosting set
    (render_composited_image appends bg opacities, bf:570-572)."""
    import jax.numpy as jnp

    from frosting_tpu.ops import cov as cov_ops
    from frosting_tpu.scene.gaussians import activate

    means, scales, quats, opac, sh = activate(bg)
    cov6 = cov_ops.cov3d_from_scale_quat(scales, quats)
    ident = jnp.concatenate(
        [jnp.ones((means.shape[0], 1)), jnp.zeros((means.shape[0], 3))], -1
    )
    return EditedGaussians(
        means=means, cov6=cov6, opacities=opac, sh=sh, sh_rotations=ident
    )


def concat_edited(a: EditedGaussians, b: EditedGaussians) -> EditedGaussians:
    import jax.numpy as jnp

    return EditedGaussians(
        *(jnp.concatenate([x, y]) for x, y in zip(a, b))
    )


def build_composite_scene(
    models,  # list of (FrostingParams, FrostingMeta)
    world_transforms=None,  # optional [M] 4x4 column-vector matrices
    keep_background: bool = True,
) -> CompositeScene:
    """Concatenate frosting models into a single scene; per-model vertex
    ranges let apply_poses_to_scene edit each mesh independently.

    Background Gaussians: like the reference (bf:360-371), the FIRST model
    carrying a background contributes it, transformed by its world matrix;
    the other models' backgrounds are dropped (a composite scene has one
    world)."""
    import jax.numpy as jnp

    v_off = 0
    g_off = 0
    vert_ranges = []
    gauss_ranges = []
    parts = []
    faces = []
    cells = []
    for i, (p, m) in enumerate(models):
        verts = p.shell_verts
        if world_transforms is not None:
            T = jnp.asarray(world_transforms[i], jnp.float32)
            homog = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], -1)
            verts = (homog @ T.T)[:, :3]
            p = dataclasses.replace(p, shell_verts=verts)
        nv = p.shell_verts.shape[0]
        ng = p.bary_logits.shape[0]
        vert_ranges.append((v_off, v_off + nv))
        gauss_ranges.append((g_off, g_off + ng))
        parts.append(p)
        faces.append(np.asarray(m.faces) + v_off)
        v_off += nv
        g_off += ng

    def cat(field):
        return jnp.concatenate([getattr(p, field) for p in parts])

    bg = None
    if keep_background:
        for i, (p, _m) in enumerate(models):
            if p.bg is not None:
                bg = p.bg
                if world_transforms is not None:
                    bg = transform_background(bg, world_transforms[i])
                break

    params = frosting_lib.FrostingParams(
        shell_verts=cat("shell_verts"),
        inner_dist=cat("inner_dist"),
        outer_dist=cat("outer_dist"),
        bary_logits=cat("bary_logits"),
        scales_log=cat("scales_log"),
        quats_raw=cat("quats_raw"),
        opacities_raw=cat("opacities_raw"),
        sh_dc=cat("sh_dc"),
        sh_rest=cat("sh_rest"),
        bg=bg,
    )
    # face offsets must account for concatenated face arrays
    face_off = np.cumsum([0] + [len(f) for f in faces[:-1]])
    cells = [
        np.asarray(m.cell_idx) + face_off[i]
        for i, (_p, m) in enumerate(models)
    ]
    meta = frosting_lib.FrostingMeta(
        faces=jnp.asarray(np.concatenate(faces), jnp.int32),
        cell_idx=jnp.asarray(np.concatenate(cells), jnp.int32),
    )
    return CompositeScene(
        params=params,
        meta=meta,
        vert_ranges=np.asarray(vert_ranges),
        gauss_ranges=np.asarray(gauss_ranges),
    )


def pose_composite(
    scene: CompositeScene,
    mesh_index: int,
    new_verts_for_mesh: jnp.ndarray,
) -> jnp.ndarray:
    """New full shell_verts with one model's vertices replaced
    (apply_poses_to_scene writes per-mesh slices,
    blender/frosting_utils.py:505-516)."""
    s, e = scene.vert_ranges[mesh_index]
    return scene.params.shell_verts.at[s:e].set(new_verts_for_mesh)


def load_blender_package(path: str) -> Dict:
    """Parse a Blender-exported JSON package (bones, weights, frames,
    cameras) into numpy structures (load_blender_package,
    blender/frosting_utils.py:15-104)."""
    with open(path) as f:
        package = json.load(f)

    out: Dict = {"raw": package, "meshes": []}
    for mesh_dict in package.get("bones", []):
        if not mesh_dict:
            out["meshes"].append(None)
            continue
        vd = mesh_dict["vertex"]
        ad = mesh_dict["armature"]
        tpose = np.asarray(vd["tpose_points"], np.float32)
        bone_names = list(ad["rest_bones"].keys())
        b = len(bone_names)
        v = len(tpose)
        weights = np.zeros((v, b), np.float32)
        name_to_idx = {n: i for i, n in enumerate(bone_names)}
        for i in range(v):
            for g, w in zip(vd["groups"][i], vd["weights"][i]):
                if g in name_to_idx:
                    weights[i, name_to_idx[g]] = w
        wsum = weights.sum(axis=1, keepdims=True)
        weights = np.where(wsum > 0, weights / np.maximum(wsum, 1e-12), 0.0)
        rest = np.stack(
            [np.asarray(ad["rest_bones"][n], np.float32) for n in bone_names]
        )
        pose = np.stack(
            [np.asarray(ad["pose_bones"][n], np.float32) for n in bone_names]
        )  # [B, T, 4, 4]
        out["meshes"].append(
            {
                "tpose_points": tpose,
                "weights": weights,
                "bone_names": bone_names,
                "rest_matrices": rest,
                "pose_matrices": pose,
                "matrix_world": np.asarray(vd["matrix_world"], np.float32),
            }
        )
    return out
