"""Static rasterizer configuration.

Everything here is shape-determining and must be hashable/static under jit.
"""

from __future__ import annotations

import dataclasses


# Packed per-instance field layout (float32 rows of width INSTANCE_WIDTH):
#   0: mean2d.x   1: mean2d.y
#   2: conic.a    3: conic.b     4: conic.c
#   5: opacity
#   6: color.r    7: color.g     8: color.b
# The physical sublane padding of the 9-row dimension (to the (8,128) tile
# grid) is left to the compiler; carrying explicit zero rows cost a
# full-buffer pad pass per step.
INSTANCE_WIDTH = 9
INSTANCE_FIELDS_USED = 9

# Alpha-compositing constants, matching renderCUDA (forward.cu:310-351).
ALPHA_CLAMP = 0.99
ALPHA_CUTOFF = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static shape/capacity configuration for one render resolution."""

    width: int
    height: int
    # Full-image dimensions used for projection (NDC->pixel and focal
    # lengths). Differ from width/height when rendering a sub-rectangle
    # (tile-axis sharding renders horizontal strips). 0 = same as width/height.
    proj_width: int = 0
    proj_height: int = 0
    # Pixel tile processed by one blend program. 32x32=1024 pixels fills the
    # 8x128 VPU exactly; the CUDA reference uses 16x16 (config.h:15-17) but
    # tile size only affects the conservative rect-inclusion set, not the
    # compositing math.
    # 32x16 measured fastest at the bench shape (P=512): vs 32x32 the
    # per-instance pixel work halves while instances only grow ~1.4x
    # (21.6 vs 23.1 ms/iter); 32x8 and 16x16 lose to instance-count costs
    # (25.5 / 24.9). P = tile_w*tile_h must be a multiple of 128 (lanes).
    tile_w: int = 32
    tile_h: int = 16
    # Gaussians blended per chunk (the lane width of the in-chunk
    # Hillis-Steele transmittance scan). On TPU the Pallas kernels only
    # compile at chunk=128: the [n_blocks, 9, K] instance buffer lowers to
    # a (1, 128)-tiled layout whose manual DMA slices Mosaic accepts only
    # when K == 128 (K=64 and K=256 are both rejected on alignment).
    # Smaller chunks remain valid on the pure-JAX backend (CPU tests use
    # 32 for tight shapes).
    chunk: int = 128
    # Capacity for duplicated (gaussian, tile) instances before padding. The
    # dynamic `num_rendered` of the CUDA reference (rasterizer_impl.cu:280-285)
    # becomes this static bound + an overflow flag.
    max_instances: int = 1 << 20
    # Near-plane depth cull (auxiliary.h in_frustum).
    near: float = 0.2
    sh_degree: int = 3
    # Consecutive chunks fetched per DMA by the Pallas blend kernels (the
    # superblock): amortizes DMA issue/latency over S chunks. The instance
    # buffer carries S-1 trailing slack blocks so the last superblock of a
    # tile may over-read harmlessly.
    dma_superblock: int = 4
    # Tiles processed by ONE Pallas grid program. TPU Pallas grids execute
    # sequentially on the single TensorCore, and each program entry costs
    # ~5 us (measured: 2.46 ms noop floor at 512 single-tile programs), so
    # batching tiles amortizes that fixed cost. 0 = auto (largest of
    # 8/4/2/1 dividing n_tiles).
    tiles_per_program: int = 0
    # Blend backend: "auto" (pallas on TPU, jax elsewhere), "pallas", "jax".
    backend: str = "auto"
    # Run Pallas kernels in interpreter mode (CPU testing of the TPU path).
    pallas_interpret: bool = False
    # Instance-expansion decode strategy. "scatter" (default):
    # telescoping diff-scatter + batched cap-sized cumsum. "gather":
    # capacity-bounded searchsorted + one [4, N] lane gather — looked
    # promising from micro-probes (lane gathers run ~1 ns/index vs ~7 for
    # row gathers) but measured 67 ms vs 17.8 ms per step end-to-end on
    # the real chip (scripts/perf_ab_r4.py): the cap-sized searchsorted
    # lowering dominates. Kept for A/B reproducibility; do not default.
    decode: str = "scatter"
    # Pack the backward reduction's 9 gradient rows as bf16 PAIRS in
    # uint32 payloads, shrinking the two payload-carrying sorts from 10 to
    # 6 operands (sorts cost per operand-row; ~0.2 ms per operand per
    # million rows on this runtime). The per-INSTANCE gradient rows are
    # quantized to bf16 before the per-gaussian f32 segment sum — ~3
    # decimal digits per instance; measured grad cosine > 0.9999 vs the
    # f32 path (tests/test_raster.py) and +4.6% step throughput at the
    # 512² bench cap, more at 1080p caps. Default ON; set False to get
    # bit-faithful f32 sort payloads (e.g. for finite-difference tests).
    bwd_sort_bf16: bool = True

    def __post_init__(self):
        if self.max_instances % self.chunk != 0:
            raise ValueError("max_instances must be a multiple of chunk")
        if self.tile_pixels % 128 != 0:
            raise ValueError("tile_w*tile_h must be a multiple of 128 (lanes)")
        if self.decode not in ("scatter", "gather"):
            raise ValueError(
                f"decode must be 'scatter' or 'gather', got {self.decode!r}"
            )
        if self.backend not in ("auto", "pallas", "jax"):
            raise ValueError(
                f"backend must be 'auto', 'pallas' or 'jax', got {self.backend!r}"
            )

    @property
    def projection_width(self) -> int:
        return self.proj_width or self.width

    @property
    def projection_height(self) -> int:
        return self.proj_height or self.height

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def tile_pixels(self) -> int:
        return self.tile_w * self.tile_h

    @property
    def padded_rows(self) -> int:
        """Static row count of the K-aligned instance buffer: capacity, plus
        up to one padding chunk per tile (every tile gets >= 1 chunk so its
        output block is always written), plus one trailing all-zero dummy
        block that out-of-range work items point at, plus superblock
        over-read slack."""
        return (
            self.max_instances
            + (self.n_tiles + 1) * self.chunk
            + (self.dma_superblock - 1) * self.chunk
        )

    @property
    def n_blocks(self) -> int:
        return self.padded_rows // self.chunk

    @property
    def work_cap(self) -> int:
        return self.n_blocks

    @property
    def tpp(self) -> int:
        """Resolved tiles_per_program (see the field docstring).
        Auto picks the largest power of two <= 32 dividing n_tiles:
        measured monotone gains up to 32 at 512 tiles (18.6/18.3/18.1 ms
        per step at tpp 8/16/32 — program entries cost ~5 us each)."""
        if self.tiles_per_program:
            if self.n_tiles % self.tiles_per_program:
                raise ValueError("tiles_per_program must divide n_tiles")
            return self.tiles_per_program
        for c in (32, 16, 8, 4, 2):
            if self.n_tiles % c == 0:
                return c
        return 1
