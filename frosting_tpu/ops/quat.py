"""Quaternion algebra (wxyz convention), pure JAX.

Replaces the PyTorch3D quaternion ops the reference leans on
(quaternion_to_matrix / quaternion_multiply / quaternion_apply etc.,
imported at frosting_scene/sugar_model.py:4-8). Convention: q = (w, x, y, z),
matching the 3DGS rotation parameter layout (cuda_rasterizer/forward.cu:127-131
uses r=q.x as the scalar part of the stored 4-vector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # sum-of-squares + clamped rsqrt keeps the GRADIENT finite at q == 0
    # (jnp.linalg.norm's vjp is 0 * inf = NaN there), which matters for
    # dead arena slots parked at zero.
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (wxyz) -> rotation matrix [..., 3, 3].

    Matches computeCov3D's R (cuda_rasterizer/forward.cu:133-138).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (wxyz).

    Branch-free Shepperd-style construction (safe under jit): build all four
    candidate quaternions and select the one keyed to the largest diagonal
    combination.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, each scaled by 4*component^2. The floor of 1e-6 keeps
    # every branch's sqrt/div GRADIENT finite: unselected candidates receive
    # zero cotangent, but 0 * inf = NaN would still leak through sqrt'(0)
    # (the argmax-selected candidate is always >= 1, far from the floor).
    qw2 = jnp.maximum(1e-6, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(1e-6, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(1e-6, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(1e-6, 1.0 - m00 - m11 + m22)

    def safe_div(a, b):
        return a / jnp.maximum(b, 1e-12)

    sw = jnp.sqrt(qw2)
    cw = jnp.stack(
        [sw, safe_div(m21 - m12, sw), safe_div(m02 - m20, sw), safe_div(m10 - m01, sw)],
        axis=-1,
    )
    sx = jnp.sqrt(qx2)
    cx = jnp.stack(
        [safe_div(m21 - m12, sx), sx, safe_div(m01 + m10, sx), safe_div(m02 + m20, sx)],
        axis=-1,
    )
    sy = jnp.sqrt(qy2)
    cy = jnp.stack(
        [safe_div(m02 - m20, sy), safe_div(m01 + m10, sy), sy, safe_div(m12 + m21, sy)],
        axis=-1,
    )
    sz = jnp.sqrt(qz2)
    cz = jnp.stack(
        [safe_div(m10 - m01, sz), safe_div(m02 + m20, sz), safe_div(m12 + m21, sz), sz],
        axis=-1,
    )

    comps = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(comps, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :] * 0.5
    return normalize(q)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both [..., 4] wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)
