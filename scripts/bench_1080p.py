"""Production-scale rasterizer benchmark: 1920x1080 @ 1M gaussians.

Same methodology as bench.py (in-program fori_loop, per-iteration input
perturbation, one dispatch per measurement). Writes BENCH_1080P.json at the
repo root. Run standalone (one TPU-compiling process at a time).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
    )

    rng = np.random.default_rng(0)
    n = 1_000_000
    means = rng.uniform(-0.9, 0.9, (n, 3))
    scales = np.exp(rng.uniform(np.log(0.003), np.log(0.015), (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n)
    sh = rng.normal(size=(n, 16, 3)) * 0.2
    sh[:, 0] = (means + 1.0) * 0.7
    gs = tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )
    cam = look_at_camera(eye=[0.0, 0.0, -3.0], target=[0.0, 0.0, 0.0])

    w, h = 1920, 1080
    probe_cfg = RasterConfig(
        width=w, height=h, chunk=128, max_instances=1 << 22, backend="auto"
    )
    n_inst = int(
        jax.jit(lambda g, c: count_instances(*g, c, probe_cfg))(gs, cam)
    )
    cfg = RasterConfig(
        width=w, height=h, chunk=128,
        max_instances=autotune_max_instances(n_inst, 128, safety=1.25),
        backend="auto",
    )
    print("instances", n_inst, "cap", cfg.max_instances, flush=True)

    target = jnp.zeros((3, h, w), jnp.float32)
    iters = 5

    def loss_fn(means, scales, quats, opac, sh, camera, tgt):
        out = render(means, scales, quats, opac, sh, camera, cfg)
        return jnp.mean(jnp.abs(out.image - tgt))

    grad_opac = jax.grad(loss_fn, argnums=3)

    @jax.jit
    def bench_prog(means, scales, quats, opac, sh, camera, tgt, salt):
        def body(i, acc):
            it = i.astype(jnp.float32)
            opac_i = jnp.clip(opac + 0.001 * it + salt, 0, 1)
            means_i = means + 1e-5 * it + salt * 1e-3
            g = grad_opac(means_i, scales, quats, opac_i, sh, camera, tgt)
            return acc + jnp.sum(jnp.abs(g))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    @jax.jit
    def bench_fwd(means, scales, quats, opac, sh, camera, salt):
        def body(i, acc):
            it = i.astype(jnp.float32)
            opac_i = jnp.clip(opac + 0.001 * it + salt, 0, 1)
            means_i = means + 1e-5 * it + salt * 1e-3
            out = render(means_i, scales, quats, opac_i, sh, camera, cfg)
            return acc + jnp.sum(out.image)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = float(bench_prog(*gs, cam, target, 0.0))
    t0 = time.time()
    r = float(bench_prog(*gs, cam, target, 0.017))
    dt = time.time() - t0
    assert np.isfinite(r)
    mpix_s = w * h * iters / dt / 1e6

    rf = float(bench_fwd(*gs, cam, 0.0))
    t0 = time.time()
    rf = float(bench_fwd(*gs, cam, 0.013))
    dtf = time.time() - t0
    assert np.isfinite(rf)
    fwd_mpix_s = w * h * iters / dtf / 1e6

    result = {
        "metric": "fwd+bwd rasterize 1920x1080 @1M gaussians",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "instances": n_inst,
        "ms_per_iter": round(dt / iters * 1e3, 1),
        "fwd_only_mpix_s": round(fwd_mpix_s, 2),
        "fwd_only_fps": round(fwd_mpix_s * 1e6 / (w * h), 1),
    }
    print(json.dumps(result))
    with open("BENCH_1080P.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
