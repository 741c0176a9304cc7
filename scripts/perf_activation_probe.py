"""Where does the 2M refine step's non-raster time go? In-program-loop
probes (PERF_NOTES methodology: fori_loop + per-iter input perturbation,
one dispatch per measurement) of:

  1. frosting activation fwd+bwd alone (suspect: the corner-gradient
     scatter-add in gaussian_centers' backward — an N-row scatter at
     scalar rate)
  2. raster fwd+bwd alone at the culled instance budget
  3. the full train step (reference point vs REFINE2M.json)

  PYTHONPATH="$PWD:$PYTHONPATH" python scripts/perf_activation_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.models.frosting import FrostingMeta, FrostingParams

    sys.path.insert(0, "scripts")
    from bench_refine2m import uv_sphere

    n = 2_000_000
    verts, faces = uv_sphere()
    f = len(faces)
    rng = np.random.default_rng(0)
    params = FrostingParams(
        shell_verts=jnp.asarray(verts),
        inner_dist=jnp.full((len(verts),), -0.02),
        outer_dist=jnp.full((len(verts),), 0.02),
        bary_logits=jnp.asarray(rng.normal(0, 0.7, (n, 6)), jnp.float32),
        scales_log=jnp.asarray(
            rng.uniform(np.log(0.002), np.log(0.006), (n, 3)), jnp.float32
        ),
        quats_raw=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opacities_raw=jnp.asarray(rng.normal(1.0, 0.5, (n,)), jnp.float32),
        sh_dc=jnp.asarray(rng.normal(0.3, 0.2, (n, 1, 3)), jnp.float32),
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        bg=None,
    )
    cell_idx_np = np.sort(rng.integers(0, f, n)).astype(np.int32)
    bounds_np = np.searchsorted(
        cell_idx_np, np.arange(f + 1), side="left"
    ).astype(np.int32)
    meta = FrostingMeta(
        faces=jnp.asarray(faces),
        cell_idx=jnp.asarray(cell_idx_np),
    )
    meta_b = FrostingMeta(
        faces=jnp.asarray(faces),
        cell_idx=jnp.asarray(cell_idx_np),
        cell_bounds=jnp.asarray(bounds_np),
    )

    def timeloop(fn, arg, iters=30, label=""):
        @jax.jit
        def prog(a, salt):
            def body(i, carry):
                a_, acc = carry
                out = fn(a_, salt + jnp.float32(i))
                return (a_, acc + out)

            _, acc = jax.lax.fori_loop(
                0, iters, body, (a, jnp.zeros((), jnp.float32))
            )
            return acc

        r = prog(arg, jnp.float32(0.0))
        jax.block_until_ready(r)
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            r = prog(arg, jnp.float32(rep + 1.0))
            jax.block_until_ready(r)
            best = min(best, (time.time() - t0) / iters * 1e3)
        print(f"{label}: {best:.2f} ms/iter", flush=True)
        return best

    # 1. activation fwd+bwd (grad wrt all params through the means +
    # scales/quats/opac/sh sums so every activation op has a cotangent)
    def make_act_step(m):
        def act_loss(p, salt):
            means, scales, quats, opac, sh = frosting_lib.activate_frosting(
                p, m
            )
            return (
                jnp.sum(means * salt)
                + jnp.sum(scales) * 1e-6
                + jnp.sum(quats) * 1e-6
                + jnp.sum(opac) * 1e-6
                + jnp.sum(sh) * 1e-6
            )

        def act_step(p, salt):
            g = jax.grad(act_loss)(p, salt)
            return jnp.sum(g.bary_logits[0]) + jnp.sum(g.shell_verts[0])

        return act_step

    timeloop(
        make_act_step(meta), params,
        label="activation fwd+bwd (2M, scatter path)",
    )
    timeloop(
        make_act_step(meta_b), params,
        label="activation fwd+bwd (2M, sorted prefix-diff path)",
    )

    # 1b. centers-only fwd (no grad): the corner gather + softmax blend
    def centers_fwd(p, salt):
        m = frosting_lib.gaussian_centers(p, meta.faces, meta.cell_idx)
        return jnp.sum(m * salt)

    timeloop(centers_fwd, params, label="centers fwd only (2M)")

    # 1c. grad wrt bary only (no shell gradient -> no corner scatter)
    def bary_grad(p, salt):
        def lf(bl):
            import dataclasses as dc

            p2 = dc.replace(p, bary_logits=bl)
            corners = jax.lax.stop_gradient(
                frosting_lib.cell_corners(p2, meta.faces)
            )[meta.cell_idx]
            w = jax.nn.softmax(bl, axis=-1)
            m = jnp.sum(w[..., None] * corners, axis=1)
            return jnp.sum(m * salt)

        g = jax.grad(lf)(p.bary_logits)
        return jnp.sum(g[0])

    timeloop(bary_grad, params, label="centers grad, bary only (no corner scatter)")


if __name__ == "__main__":
    main()
