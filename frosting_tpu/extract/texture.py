"""Textured-mesh extraction: UV atlas, color baking, OBJ export.

Re-creates compute_textured_mesh_for_frosting_mesh + the OBJ export path
(frosting_utils/texture.py:11-181, frosting_extractors/textured_mesh.py):
a block UV atlas packs two triangles per square texel block with inset
corners; per-camera bakes render the frosting and scatter-average pixel
colors into texels via the mesh rasterizer's pix_to_face/barycentrics;
unseen texels are filled from per-face average SH colors.
"""

from __future__ import annotations

import math
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import Camera
from frosting_tpu.ops import mesh_raster
from frosting_tpu.ops import sh as sh_ops
from frosting_tpu.raster import RasterConfig, render


def uv_atlas(n_faces: int, texture_size: int) -> Tuple[np.ndarray, int]:
    """Face corner UVs [F, 3, 2] in [0,1] (v up, OBJ convention). Each
    square block of the atlas holds 2 triangles (texture.py:35-72); corners
    are inset by a fraction of the block so bilinear lookups don't bleed."""
    blocks_per_side = int(math.ceil(math.sqrt((n_faces + 1) // 2)))
    block = 1.0 / blocks_per_side
    inset = 0.12 * block

    uvs = np.zeros((n_faces, 3, 2), np.float64)
    for f in range(n_faces):
        b = f // 2
        bx = b % blocks_per_side
        by = b // blocks_per_side
        x0, y0 = bx * block, by * block
        x1, y1 = x0 + block, y0 + block
        if f % 2 == 0:  # lower-left triangle
            uvs[f] = [
                [x0 + inset, y0 + inset],
                [x1 - 2 * inset, y0 + inset],
                [x0 + inset, y1 - 2 * inset],
            ]
        else:  # upper-right triangle
            uvs[f] = [
                [x1 - inset, y1 - inset],
                [x0 + 2 * inset, y1 - inset],
                [x1 - inset, y0 + 2 * inset],
            ]
    return uvs, blocks_per_side


def bake_texture(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    render_fn,  # camera -> [3, H, W] image
    cameras: List[Camera],
    rcfg: RasterConfig,
    texture_size: int = 1024,
    face_fill_colors: np.ndarray | None = None,  # [F, 3]
) -> Tuple[np.ndarray, np.ndarray]:
    """Bake per-camera renders into a texture. Returns
    (texture [S, S, 3] float in [0,1], face UVs [F, 3, 2])."""
    f = int(faces.shape[0])
    uvs, _ = uv_atlas(f, texture_size)
    uvs_j = jnp.asarray(uvs, jnp.float32)

    acc = jnp.zeros((texture_size * texture_size, 3), jnp.float32)
    cnt = jnp.zeros((texture_size * texture_size,), jnp.float32)

    @jax.jit
    def accumulate(acc, cnt, image, pix_to_face, bary, uvs_j):
        pf = pix_to_face.reshape(-1)
        br = bary.reshape(-1, 3)
        cols = image.reshape(3, -1).T  # [P, 3]
        covered = pf >= 0
        pf_c = jnp.maximum(pf, 0)
        uv = jnp.sum(uvs_j[pf_c] * br[..., None], axis=1)  # [P, 2]
        # v-up -> row index from the top
        tx = jnp.clip((uv[:, 0] * texture_size), 0, texture_size - 1)
        ty = jnp.clip(((1.0 - uv[:, 1]) * texture_size), 0, texture_size - 1)
        tid = ty.astype(jnp.int32) * texture_size + tx.astype(jnp.int32)
        w = covered.astype(jnp.float32)
        acc = acc.at[tid].add(cols * w[:, None])
        cnt = cnt.at[tid].add(w)
        return acc, cnt

    for cam in cameras:
        image = render_fn(cam)
        frags = mesh_raster.rasterize_mesh(verts, faces, cam, rcfg)
        acc, cnt = accumulate(
            acc, cnt, jnp.asarray(image), frags.pix_to_face, frags.bary, uvs_j
        )

    tex = np.array(acc).reshape(texture_size, texture_size, 3)
    count = np.array(cnt).reshape(texture_size, texture_size)
    seen = count > 0
    tex[seen] /= count[seen][:, None]

    # fill unseen texels with their face's fill color (texture.py:94-110)
    if face_fill_colors is not None:
        ys, xs = np.nonzero(~seen)
        u = (xs + 0.5) / texture_size
        v = 1.0 - (ys + 0.5) / texture_size
        blocks_per_side = int(math.ceil(math.sqrt((f + 1) // 2)))
        bx = np.clip((u * blocks_per_side).astype(int), 0, blocks_per_side - 1)
        by = np.clip((v * blocks_per_side).astype(int), 0, blocks_per_side - 1)
        lu = u * blocks_per_side - bx
        lv = v * blocks_per_side - by
        tri = (lu + lv > 1.0).astype(int)  # upper-right half of the block
        fid = np.minimum((by * blocks_per_side + bx) * 2 + tri, f - 1)
        tex[ys, xs] = face_fill_colors[fid]
    return np.clip(tex, 0.0, 1.0), uvs


def face_average_sh_colors(
    face_centers: np.ndarray,  # [F, 3]
    g_means: np.ndarray,
    g_sh_dc: np.ndarray,  # [N, 1, 3]
) -> np.ndarray:
    """Nearest-gaussian DC color per face (the reference's SH-average fill,
    texture.py:156-164)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(g_means))
    _, idx = tree.query(np.asarray(face_centers), k=1)
    return np.clip(
        np.asarray(sh_ops.sh_to_rgb(jnp.asarray(g_sh_dc[idx, 0]))), 0.0, 1.0
    )


def export_obj(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    uvs: np.ndarray,  # [F, 3, 2]
    texture: np.ndarray,  # [S, S, 3] float
) -> None:
    """Write OBJ + MTL + PNG (save_obj analogue, refine.py:623)."""
    base = os.path.splitext(path)[0]
    name = os.path.basename(base)
    from PIL import Image

    Image.fromarray((texture * 255).astype(np.uint8)).save(base + ".png")
    with open(base + ".mtl", "w") as m:
        m.write(f"newmtl material_0\nmap_Kd {name}.png\n")
    with open(path, "w") as o:
        o.write(f"mtllib {name}.mtl\nusemtl material_0\n")
        for v in verts:
            o.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for fuv in uvs:
            for uv in fuv:
                o.write(f"vt {uv[0]:.6f} {uv[1]:.6f}\n")
        for i, face in enumerate(faces):
            t = 3 * i
            o.write(
                f"f {face[0]+1}/{t+1} {face[1]+1}/{t+2} {face[2]+1}/{t+3}\n"
            )


def extract_textured_mesh(
    fparams,
    meta,
    cameras: List[Camera],
    rcfg: RasterConfig,
    path: str,
    texture_size: int = 1024,
    sh_degree: int = 3,
) -> None:
    """Full step-6: bake the refined frosting into a textured OBJ
    (extract_mesh_and_texture_from_frosting, textured_mesh.py:16-128)."""
    from frosting_tpu.models.frosting import activate_frosting

    verts = fparams.shell_verts
    faces = meta.faces

    @jax.jit
    def render_cam_p(fp, mt, cam):
        means, scales, quats, opac, sh = activate_frosting(fp, mt)
        return jnp.clip(
            render(
                means, scales, quats, opac, sh, cam, rcfg,
                active_sh_degree=sh_degree,
            ).image,
            0.0,
            1.0,
        )

    def render_cam(cam):
        return render_cam_p(fparams, meta, cam)

    means, _, _, _, sh = activate_frosting(fparams, meta)
    fc = np.asarray(verts)[np.asarray(faces)].mean(axis=1)
    fill = face_average_sh_colors(
        fc, np.asarray(means), np.asarray(sh[:, :1])
    )
    tex, uvs = bake_texture(
        verts, faces, render_cam, cameras, rcfg, texture_size, fill
    )
    export_obj(path, np.asarray(verts), np.asarray(faces), uvs, tex)
