"""Full-resolution shell extraction at reference budgets: auto Poisson
depth (up to 256^3), density-quantile cleaning, fg/bg split, QEM
decimation toward the 1M/200k vertex targets (train.py:118-121), on a
dense synthetic scene. Writes EXTRACT_BENCH.json + shell_fullres.ply.

    python scripts/extract_fullres.py [--n 200000] [--res 512]
"""

import argparse
import json
import time

import numpy as np


def dense_scene(n, seed=0):
    """Dense displaced-sphere + ground scene (activated gaussian arrays)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n_s = int(n * 0.75)
    d = rng.normal(size=(n_s, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # displacement field for geometric detail
    disp = (
        0.08 * np.sin(6 * d[:, 0]) * np.cos(5 * d[:, 1])
        + 0.05 * np.sin(9 * d[:, 2])
    )
    means_s = d * (1.0 + disp)[:, None]
    n_g = n - n_s
    gx = rng.uniform(-1.8, 1.8, n_g)
    gy = rng.uniform(-1.8, 1.8, n_g)
    gz = np.full(n_g, -1.15) + 0.02 * np.sin(4 * gx) * np.cos(4 * gy)
    means = np.concatenate([means_s, np.stack([gx, gy, gz], 1)])
    scales = np.exp(
        rng.uniform(np.log(0.006), np.log(0.02), (n, 3))
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.7, 0.98, n).astype(np.float32)
    return (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opac),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=512)
    # the reference extracts with 100-300 cameras (coarse_shell.py:301-364)
    ap.add_argument("--n-cams", type=int, default=100)
    ap.add_argument("--target-vertices", type=int, default=1_000_000)
    ap.add_argument(
        "--max-poisson", type=int, default=1024,
        help="Poisson grid cap (1024 = the reference's depth-10 default, "
        "coarse_shell.py:80; solves >= 512 run on the host FFT)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the axon plugin overrides "
        "JAX_PLATFORMS=cpu at import; this uses jax.config instead)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from frosting_tpu.extract.shell import ShellConfig, extract_shell
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.utils import ply as ply_io

    means, scales, quats, opac = dense_scene(args.n)
    cams = synthetic.camera_ring(
        n_cams=args.n_cams, radius=3.4, height=1.4
    )
    rcfg = RasterConfig(
        width=args.res, height=args.res, chunk=128,
        max_instances=1 << 21, backend="auto",
    )
    cfg = ShellConfig(
        poisson_resolution=0,  # auto depth heuristic
        max_poisson_resolution=args.max_poisson,
        target_vertices=args.target_vertices,
        target_vertices_low=200_000,  # reference emits BOTH budgets
        cleaning_quantile=0.1,
        fg_split=True,
    )
    t0 = time.time()
    verts, faces, aux = extract_shell(
        means, scales, quats, opac, cams, rcfg, cfg, verbose=True
    )
    dt = time.time() - t0
    v = np.asarray(verts, np.float32)
    ply_io.write_ply(
        "shell_fullres.ply",
        {"x": v[:, 0], "y": v[:, 1], "z": v[:, 2]},
        faces=np.asarray(faces, np.int32),
    )
    lv, lf = aux.get("low_poly", (verts, faces))
    import jax as _jax

    out = {
        "n_gaussians": args.n,
        "n_cams": args.n_cams,
        "device": _jax.devices()[0].platform,
        "resolution": args.res,
        "poisson_resolutions": aux.get("poisson_resolutions", []),
        "target_vertices": args.target_vertices,
        "mesh_vertices": int(len(verts)),
        "mesh_faces": int(len(faces)),
        "low_poly_target": 200_000,
        "low_poly_vertices": int(len(lv)),
        "low_poly_faces": int(len(lf)),
        "wall_clock_s": round(dt, 1),
        "timings": aux.get("timings", {}),
        "max_poisson_resolution": args.max_poisson,
    }
    with open("EXTRACT_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
