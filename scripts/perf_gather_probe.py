"""Micro-probes for the instance gather / scatter glue around the blend.

Variants (one per --probe, separate jits):
  take_row    : take (N+1,16) rows -> (padded,16)            [current]
  take_row3   : take + reshape/swap to (n_blocks,16,K)       [current+layout]
  take_lane   : take from (16,N+1) along lanes -> (16,padded) -> block layout
  segsum      : segment_sum (padded,16) by padded_gauss      [current bwd]
  segsum_lane : segment over transposed (16,padded) via take-based matmul? no:
                transpose grads3 -> row layout -> segment_sum [current bwd]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", required=True)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-instances", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.raster.binning import bin_gaussians
    from frosting_tpu.raster.preprocess import pack_fields, preprocess

    rng = np.random.default_rng(0)
    n = 100_000
    means = rng.uniform(-0.7, 0.7, (n, 3))
    scales = np.exp(rng.uniform(np.log(0.008), np.log(0.04), (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n)
    sh = rng.normal(size=(n, 16, 3)) * 0.2
    gs = tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )
    cam = look_at_camera(eye=[0.0, 0.0, -3.0], target=[0.0, 0.0, 0.0])
    cfg = RasterConfig(
        width=512, height=512, chunk=args.chunk,
        max_instances=args.max_instances, backend="pallas",
    )

    @jax.jit
    def prepare(means, scales, quats, opac, sh, camera):
        proj = preprocess(means, scales, quats, opac, sh, camera, cfg)
        fields_ext = pack_fields(proj)
        binned = bin_gaussians(proj.rect, proj.depths, proj.valid, cfg)
        return fields_ext, binned

    fields_ext, binned = prepare(*gs, cam)
    fields_ext.block_until_ready()
    gathered = jnp.take(fields_ext, binned.padded_gauss, axis=0)
    gathered.block_until_ready()
    k = cfg.chunk
    nb = cfg.n_blocks

    name = args.probe
    if name == "take_row":
        def f(fe, b, i):
            p = jnp.take(fe * (1 + i * 1e-12), b.padded_gauss, axis=0)
            return jnp.sum(p[:, 0]) * 1e-9
    elif name == "take_row3":
        def f(fe, b, i):
            p = jnp.take(fe * (1 + i * 1e-12), b.padded_gauss, axis=0)
            p3 = p.reshape(nb, k, 16).swapaxes(1, 2)
            return jnp.sum(p3[:, 0, 0]) * 1e-9
    elif name == "take_lane":
        def f(fe, b, i):
            fet = (fe * (1 + i * 1e-12)).T  # [16, N+1]
            p = jnp.take(fet, b.padded_gauss, axis=1)  # [16, padded]
            p3 = p.reshape(16, nb, k).swapaxes(0, 1)
            return jnp.sum(p3[:, 0, 0]) * 1e-9
    elif name == "segsum":
        def f(fe, b, i):
            g = gathered * (1 + i * 1e-12)
            s = jax.ops.segment_sum(
                g, b.padded_gauss, num_segments=fe.shape[0]
            )
            return jnp.sum(s[:, 0]) * 1e-9
    elif name in ("segsum_sorted", "cumsum_diff"):
        # Historical round-2 variants built on Binned.inv_map/gauss_orig,
        # which were removed when the backward reduction moved to the
        # orig_s payload sort (round 3). Findings recorded in PERF_NOTES.
        raise SystemExit(f"probe variant '{name}' removed with inv_map")
    elif name == "take_planar":
        def f(fe, b, i):
            fet = (fe * (1 + i * 1e-12)).T  # (16, N+1)
            planes = [jnp.take(fet[c], b.padded_gauss) for c in range(16)]
            p = jnp.stack(planes)  # (16, padded)
            p3 = p.reshape(16, nb, k).swapaxes(0, 1)
            return jnp.sum(p3[:, 0, 0]) * 1e-9
    else:
        raise SystemExit(f"unknown probe {name}")

    iters = args.iters

    @jax.jit
    def prog(fe, b, salt):
        def body(i, acc):
            return acc + f(fe, b, i.astype(jnp.float32) + salt)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = float(prog(fields_ext, binned, 0.0))
    t0 = time.time()
    r = float(prog(fields_ext, binned, 0.017))
    dt = time.time() - t0
    assert np.isfinite(r)
    print(
        json.dumps(
            {
                "probe": name,
                "max_instances": args.max_instances,
                "ms": round(dt / iters * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
