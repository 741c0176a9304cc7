"""Ablate the Pallas forward blend: real chunk math vs a trivial stand-in
with the identical DMA/loop structure. Separates per-chunk COMPUTE cost from
loop+DMA overhead. In-program fori_loop + salt methodology (PERF_NOTES.md).

    python scripts/perf_blend_ablate.py [--noop] [--chunk N] [--tile N]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--tile-h", type=int, default=0)
    ap.add_argument("--mode", choices=["fwd", "bwd"], default="fwd")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.raster import chunk_math
    from frosting_tpu.raster.binning import bin_gaussians
    from frosting_tpu.raster.preprocess import pack_fields, preprocess

    if args.noop:
        # same signatures, trivial math: isolates loop + DMA + transpose
        def forward_chunk(fields, t_all, t_mask, color, px, py):
            s = jnp.sum(fields[:, 0:1] * 1e-9) * 0 + 0.9999
            return t_all * s, t_mask * s, color + (px * fields[0:1, 0:1]) * 1e-9

        def backward_chunk(fields, g_color, g_tmask, gc_total, t_final,
                           t_all, gc_pre, px, py, basis_t, cx, cy):
            g = fields * 1e-9 + jnp.sum(g_color) * 1e-12
            return g, t_all * 0.9999, gc_pre

        chunk_math.forward_chunk = forward_chunk
        chunk_math.backward_chunk = backward_chunk

    from frosting_tpu.raster import blend_pallas

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
        width=512, height=512, tile_w=args.tile,
        tile_h=args.tile_h or args.tile,
        chunk=args.chunk, max_instances=1 << 20, backend="pallas",
    )

    @jax.jit
    def prepare(means, scales, quats, opac, sh, camera):
        proj = preprocess(means, scales, quats, opac, sh, camera, cfg)
        fields_ext = pack_fields(proj)
        binned = bin_gaussians(proj.rect, proj.depths, proj.valid, cfg)
        padded = jnp.take(fields_ext, binned.padded_gauss, axis=0)
        return padded, binned

    @jax.jit
    def prepare3(means, scales, quats, opac, sh, camera):
        padded, binned = prepare(means, scales, quats, opac, sh, camera)
        return blend_pallas.to_block_layout(padded, cfg), binned

    padded, binned = prepare3(*gs, cam)
    padded.block_until_ready()

    iters = args.iters
    if args.mode == "fwd":

        @jax.jit
        def prog(padded, binned, salt):
            def body(i, acc):
                p = padded * (1.0 + salt * 1e-9 * i.astype(jnp.float32))
                out = blend_pallas.blend_forward_pallas(p, binned, cfg)
                return acc + jnp.sum(out[0]) * 1e-9 + jnp.sum(out[-1]) * 1e-9

            return jax.lax.fori_loop(0, iters, body, 0.0)

    else:

        @jax.jit
        def prog(padded, binned, salt):
            out0 = blend_pallas.blend_forward_pallas(padded, binned, cfg)
            g = out0 * 0 + 1.0

            def body(i, acc):
                p = padded * (1.0 + salt * 1e-9 * i.astype(jnp.float32))
                grads = blend_pallas.blend_backward_pallas(
                    p, binned, out0, g, cfg
                )
                return acc + jnp.sum(grads[0]) * 1e-9

            return jax.lax.fori_loop(0, iters, body, 0.0)

    r = float(prog(padded, binned, 0.0))
    t0 = time.time()
    r = float(prog(padded, binned, 0.017))
    dt = time.time() - t0
    assert np.isfinite(r)
    print(
        json.dumps(
            {
                "mode": args.mode,
                "noop": args.noop,
                "tile": args.tile,
                "chunk": args.chunk,
                "num_instances": int(binned.num_instances),
                "n_real_chunks": int(binned.n_work),
                "ms_per_call": round(dt / iters * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
