"""frosting-tpu: a TPU-native (JAX/XLA/Pallas) Gaussian Frosting framework.

Re-creates the capabilities of Anttwo/Frosting (Gaussian Frosting, ECCV 2024)
with a from-scratch, TPU-first design: a differentiable tile-binned Gaussian
rasterizer written as Pallas kernels, a pure-functional scene/model core, and
a sharded (`jax.sharding.Mesh` + `shard_map`) multi-chip training runtime.
"""

__version__ = "0.1.0"
