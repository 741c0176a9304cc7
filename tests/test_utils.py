"""Smoke tests for the observability subsystems (viewer + profiling) —
everything else in the package is tested, these must be too."""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np

from frosting_tpu.raster import RasterConfig
from frosting_tpu.utils import profiling, viewer


def test_step_timer_and_metrics_logger(tmp_path):
    t = profiling.StepTimer(pixels_per_step=64 * 64)
    out = None
    for _ in range(3):
        out = t.tick()
    assert out["step_ms"] > 0
    assert out["mpix_per_s"] > 0

    path = str(tmp_path / "m.jsonl")
    ml = profiling.MetricsLogger(path)
    ml.log(1, loss=0.5, psnr=20.0)
    ml.log(2, loss=jnp.float32(0.4))
    ml.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["loss"] == 0.5 and rows[1]["step"] == 2

    # disabled sink is a no-op
    off = profiling.MetricsLogger(None)
    off.log(1, x=1.0)
    off.close()


def test_trace_context(tmp_path):
    # jax.profiler trace context runs and produces a directory
    with profiling.trace(str(tmp_path / "trace")):
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()


def test_viewer_serves_frames():
    rng = np.random.default_rng(0)
    n = 200
    model = (
        jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        jnp.full((n, 3), 0.08, jnp.float32),
        jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1),
            jnp.float32,
        ),
        jnp.full((n,), 0.9, jnp.float32),
        jnp.asarray(rng.normal(size=(n, 16, 3)) * 0.1, jnp.float32),
    )
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=8192, backend="jax"
    )
    server = viewer.start(lambda: model, rcfg, port=0)  # ephemeral port
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?az=0.3&el=0.2&r=3.0", timeout=60
        ) as resp:
            data = resp.read()
        assert resp.status == 200
        assert data[:8] == b"\x89PNG\r\n\x1a\n"  # a real PNG frame
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ) as resp:
            assert b"html" in resp.read().lower()
    finally:
        server.shutdown()
