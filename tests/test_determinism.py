"""Determinism: repeated renders and gradients are bitwise identical.

The CUDA reference's backward accumulates with atomicAdd
(backward.cu:523-554) and is therefore run-to-run non-deterministic; this
rasterizer replaces the scatter with per-instance gradient rows + an
ordered segment-sum, so training is exactly reproducible."""

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.raster import RasterConfig, render
from tests.test_raster import make_scene

CFG = RasterConfig(
    width=64, height=64, chunk=32, max_instances=8192, backend="jax"
)
CAM = look_at_camera(eye=[0.2, -0.3, -2.8], target=[0.0, 0.0, 0.0])


def test_render_and_grads_bitwise_deterministic():
    gs = make_scene(n=300, seed=1, opaque_wall=True)

    fn = jax.jit(lambda *g: render(*g, CAM, CFG).image)
    img1 = np.asarray(fn(*gs))
    img2 = np.asarray(fn(*gs))
    assert (img1 == img2).all()

    gfn = jax.jit(
        jax.grad(
            lambda *g: jnp.sum(render(*g, CAM, CFG).image ** 2),
            argnums=(0, 1, 2, 3, 4),
        )
    )
    g1 = gfn(*gs)
    g2 = gfn(*gs)
    for a, b in zip(g1, g2):
        assert (np.asarray(a) == np.asarray(b)).all()
