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

import os
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
    # chunk=128 measured ~10% faster than 64 at this shape (PERF_NOTES.md).
    # Capacity is auto-tuned from a calibration view, as a production
    # deployment would (every capacity-proportional cost — instance
    # gather, backward reduction, zero-init — scales with the bound).
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
    )

    probe_cfg = RasterConfig(
        width=512, height=512, tile_w=32, tile_h=16, chunk=128, max_instances=1 << 21,
        backend="auto",
    )
    n_inst = int(
        jax.jit(
            lambda g, c: count_instances(*g, c, probe_cfg)
        )(gs, cam)
    )
    # safety 1.25: the bench scene's camera set is fixed, so the per-view
    # instance count is known exactly (a production deployment autotunes
    # from its calibration views the same way; the overflow flag guards
    # under-sizing and triggers re-tuning).
    cfg = RasterConfig(
        width=512, height=512, tile_w=32, tile_h=16, chunk=128,
        max_instances=autotune_max_instances(n_inst, 128, safety=1.25),
        backend="auto",
    )
    target = jnp.zeros((3, 512, 512), jnp.float32)

    # Measurement methodology (see PERF_NOTES.md): the tunnel RTT is ~25 ms
    # and the runtime memoizes repeated identical dispatches, so per-call
    # host timing lies in both directions. Instead the iteration loop runs
    # INSIDE one program (fori_loop), each step perturbing the opacities on
    # device so no two renders are identical; one dispatch, one sync.
    # The fixed dispatch+RTT cost was measured at ~32 ms PER DISPATCH
    # (trivial-body probe, round 3): 100 iterations amortize it to
    # ~0.3 ms/iter. Timing repeats 3x with DISTINCT salts (no memoization)
    # taking the minimum — the shared tunnel only ever ADDS noise, so min
    # is the consistent estimator of the true step cost.
    iters = 100
    repeats = 3

    def loss_fn(means, scales, quats, opac, sh, camera, tgt):
        out = render(means, scales, quats, opac, sh, camera, cfg)
        return jnp.mean(jnp.abs(out.image - tgt))

    grad_opac = jax.grad(loss_fn, argnums=3)

    # Both means AND opacities are perturbed per iteration: a training step
    # moves every parameter, and perturbing the means keeps the whole
    # binning pipeline (projection-dependent) inside the measured loop —
    # opacity-only perturbation would let XLA hoist it as loop-invariant.
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

    r = float(bench_prog(*gs, cam, target, 0.0))  # compile + 1st run
    dt = float("inf")
    for rep in range(repeats):
        t0 = time.time()
        r = float(bench_prog(*gs, cam, target, 0.017 + 0.003 * rep))
        dt = min(dt, time.time() - t0)
        assert np.isfinite(r)
    mpix_s = 512 * 512 * iters / dt / 1e6

    rf = float(bench_fwd(*gs, cam, 0.0))
    dtf = float("inf")
    for rep in range(repeats):
        t0 = time.time()
        rf = float(bench_fwd(*gs, cam, 0.013 + 0.003 * rep))
        dtf = min(dtf, time.time() - t0)
        assert np.isfinite(rf)
    fwd_mpix_s = 512 * 512 * iters / dtf / 1e6

    extra = {
        "fwd_only_mpix_s": round(fwd_mpix_s, 2),
        "fwd_only_fps": round(fwd_mpix_s * 1e6 / (512 * 512), 1),
        # bwd_sort_bf16 (per-instance grad rows packed as bf16 pairs
        # before the per-gaussian f32 segment sum) is the DEFAULT since
        # round 5 (+4.6% same-session, grad cosine > 0.9999,
        # scripts/perf_ab_r4.py + tests/test_raster.py); the headline now
        # measures the default config.
        "bwd_sort_bf16": True,
    }
    # production-scale shape measured separately (scripts/bench_1080p.py
    # writes BENCH_1080P.json; kept out of the main loop so the driver's
    # bench run stays fast)
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_1080P.json")) as f:
            extra["bench_1080p_1m"] = json.load(f)
    except (OSError, ValueError):
        pass
    print(
        json.dumps(
            {
                "metric": "fwd+bwd rasterize 512x512 @100k gaussians",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
                "extra": extra,
            }
        )
    )


def _tunnel_healthy(timeout_s: int = 90) -> bool:
    """Pre-flight probe in a THROWAWAY subprocess: the wedged tunnel can
    either raise UNAVAILABLE at init or hang forever on the first
    dispatch, and JAX caches a failed init process-wide — so the probe
    must be expendable."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float((jnp.ones((8, 128)) * 2).sum()))"
    )
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def main_with_retry(attempts: int = 5, wait_s: int = 150):
    """The TPU tunnel occasionally wedges for minutes at a time; don't let
    a transient outage lose the benchmark run."""
    import sys

    for attempt in range(attempts):
        if _tunnel_healthy():
            main()
            return
        print(
            f"TPU tunnel unhealthy (probe {attempt + 1}/{attempts}); "
            f"retrying in {wait_s}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(wait_s)
    main()  # last resort: run anyway and let the real error surface


if __name__ == "__main__":
    main_with_retry()
