"""Quantify candidate instance-culling wins on the bench.py scene (CPU).

For each expanded (gaussian, tile) instance under the current per-axis
3-sigma rect, test whether the {q <= 9} ellipse actually intersects the
tile rectangle (exact: minimize the conic quadratic form over the tile
box) and whether the opacity-aware cutoff q <= 2*ln(255*opac) shrinks it
further. Both tests are semantics-preserving: chunk_math zeroes alpha
below ALPHA_CUTOFF (chunk_math.py:144), so removed instances contribute
exactly nothing forward or backward.

Prints the fraction of instances each test removes.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.raster.preprocess import preprocess

    rng = np.random.default_rng(0)
    n = 100_000
    means = rng.uniform(-0.7, 0.7, (n, 3))
    scales = np.exp(rng.uniform(np.log(0.008), np.log(0.04), (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n)
    sh = rng.normal(size=(n, 16, 3)) * 0.2
    cam = look_at_camera(eye=[0.0, 0.0, -3.0], target=[0.0, 0.0, 0.0])
    cfg = RasterConfig(width=512, height=512, tile_w=32, tile_h=16)

    gs = tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )
    proj = jax.jit(lambda *g: preprocess(*g, camera=cam, cfg=cfg))(*gs)
    m2d = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)
    rect = np.asarray(proj.rect)
    op = np.asarray(proj.opacities).reshape(-1)
    valid = np.asarray(proj.valid)

    tw, th = cfg.tile_w, cfg.tile_h
    t2_op = 2.0 * np.log(np.maximum(255.0 * op, 1e-12))

    live = np.nonzero(valid)[0]
    x0, y0, x1, y1 = (rect[live, k].astype(np.int64) for k in range(4))
    w = x1 - x0
    areas = w * (y1 - y0)
    total = int(areas.sum())
    idx = np.repeat(np.arange(len(live)), areas)
    starts = np.concatenate([[0], np.cumsum(areas)[:-1]])
    within = np.arange(total) - starts[idx]
    tx = x0[idx] + within % w[idx]
    ty = y0[idx] + within // w[idx]

    g = live[idx]
    a, b, c = con[g, 0], con[g, 1], con[g, 2]
    mx, my = m2d[g, 0], m2d[g, 1]
    px0, px1 = tx * tw, (tx + 1) * tw - 1
    py0, py1 = ty * th, (ty + 1) * th - 1
    # coordinate descent on q(dx,dy)=a dx^2 + 2b dx dy + c dy^2 over the box
    py = np.clip(my, py0, py1)
    px = np.clip(mx, px0, px1)
    for _ in range(3):
        px = np.clip(mx - b * (py - my) / np.maximum(a, 1e-12), px0, px1)
        py = np.clip(my - b * (px - mx) / np.maximum(c, 1e-12), py0, py1)
    dx, dy = px - mx, py - my
    q = a * dx * dx + 2 * b * dx * dy + c * dy * dy
    e = q > 9.0
    o = q > t2_op[g]
    print(
        {
            "instances": total,
            "cut_ellipse_pct": round(100 * float(e.mean()), 2),
            "cut_opacity_extra_pct": round(100 * float((o & ~e).mean()), 2),
            "cut_total_pct": round(100 * float((o | e).mean()), 2),
        }
    )


if __name__ == "__main__":
    main()
