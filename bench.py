"""Benchmark: fwd+bwd rasterization throughput on the flagship config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": N}

Measures a full differentiable render step (preprocess -> bin -> Pallas
blend -> backward through custom VJP) at 512x512 with 100k Gaussians, the
shape class of the reference's refine stage hot loop (SURVEY.md §3.4).

The reference repo publishes no quantitative numbers (BASELINE.md); as the
comparison point we use 25 Mpix/s — a conservative estimate of the CUDA
diff-gaussian-rasterization fwd+bwd throughput on a reference-class GPU for
comparable scenes (~2-4 ms per 512x512 train iteration).
"""

import json
import time

import numpy as np

BASELINE_MPIX_S = 25.0


def main():
    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render

    rng = np.random.default_rng(0)
    n = 100_000
    means = rng.uniform(-0.7, 0.7, (n, 3))
    scales = np.exp(rng.uniform(np.log(0.008), np.log(0.04), (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n)
    sh = rng.normal(size=(n, 16, 3)) * 0.2
    sh[:, 0] = (means + 1.0) * 0.7
    gs = tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )
    cam = look_at_camera(eye=[0.0, 0.0, -3.0], target=[0.0, 0.0, 0.0])
    cfg = RasterConfig(
        width=512, height=512, chunk=64, max_instances=1 << 20, backend="auto"
    )
    target = jnp.zeros((3, 512, 512), jnp.float32)

    # NOTE: camera/target are explicit arguments, never closures — executing
    # a jitted program with closed-over device-array constants flips this
    # TPU runtime into a persistent slow-gather mode (~2000x on binning).
    def loss_fn(means, scales, quats, opac, sh, camera, tgt):
        out = render(means, scales, quats, opac, sh, camera, cfg)
        return jnp.mean(jnp.abs(out.image - tgt))

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    g = step(*gs, cam, target)  # compile
    jax.block_until_ready(g)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        g = step(*gs, cam, target)
    jax.block_until_ready(g)
    dt = time.time() - t0

    mpix_s = 512 * 512 * iters / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd+bwd rasterize 512x512 @100k gaussians",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
