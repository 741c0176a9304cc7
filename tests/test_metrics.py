"""Metrics: LPIPS implementation validated numerically against a torch
re-implementation of the reference network (lpipsPyTorch/modules/*) built
from the SAME weights. The learned torchvision weights are not available in
this air-gapped env, so the check uses random VGG16-shaped weights — it
validates every architectural detail (conv/pool/relu schedule, input
normalization, channel-unit-normalization, linear heads, spatial average)
rather than the constants."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


VGG_CONVS = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
CHANNELS = [64, 128, 256, 512, 512]


def make_weights(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    z = {}
    for i, cout, cin in VGG_CONVS:
        z[f"features.{i}.weight"] = rng.normal(
            0, 1.0 / np.sqrt(cin * 9), (cout, cin, 3, 3)
        ).astype(np.float32)
        z[f"features.{i}.bias"] = rng.normal(0, 0.1, (cout,)).astype(
            np.float32
        )
    for k, c in enumerate(CHANNELS):
        z[f"lin{k}.model.1.weight"] = np.abs(
            rng.normal(0, 0.05, (1, c, 1, 1))
        ).astype(np.float32)
    path = str(tmp_path / "lpips_weights.npz")
    np.savez(path, **z)
    return path, z


def torch_lpips(a, b, z):
    """Reference-faithful torch LPIPS (lpipsPyTorch/modules/{lpips,
    networks,utils}.py) from the npz weights."""
    import torch.nn.functional as F

    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = x * 2.0 - 1.0
        h = (x - mean) / std
        out = []
        conv = {i: i for i, _, _ in VGG_CONVS}
        for i in range(30):
            if i in conv:
                w = torch.tensor(z[f"features.{i}.weight"])
                bb = torch.tensor(z[f"features.{i}.bias"])
                h = F.conv2d(h, w, bb, padding=1)
            elif i in (4, 9, 16, 23):
                h = F.max_pool2d(h, 2)
            else:
                h = F.relu(h)
            if i + 1 in (4, 9, 16, 23, 30):
                out.append(h)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for k, (f1, f2) in enumerate(zip(fa, fb)):
        n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
        n2 = f2 / (f2.norm(dim=1, keepdim=True) + 1e-10)
        d = (n1 - n2) ** 2
        w = torch.tensor(z[f"lin{k}.model.1.weight"]).view(1, -1, 1, 1)
        total = total + (d * w).sum(dim=1).mean()
    return float(total)


def test_lpips_matches_torch_reference(tmp_path):
    from frosting_tpu.metrics import LPIPS

    path, z = make_weights(tmp_path)
    lp = LPIPS(path)
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    ours = float(lp(a, b))
    ref = torch_lpips(
        torch.tensor(a)[None], torch.tensor(b)[None], z
    )
    assert ours > 0
    np.testing.assert_allclose(ours, ref, rtol=2e-4)

    # identical images -> exactly zero distance
    assert float(lp(a, a)) < 1e-8


def test_evaluate_views_reports_lpips(tmp_path):
    import jax.numpy as jnp

    from frosting_tpu import metrics

    path, _z = make_weights(tmp_path)
    lp = metrics.LPIPS(path)
    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    res = metrics.evaluate_views(
        lambda cam: jnp.asarray(gt[0]) * 0.9, [0, 1], gt, lpips=lp
    )
    assert res["lpips"] is not None and np.isfinite(res["lpips"])
    assert res["n_views"] == 2


def test_lpips_golden_value_with_real_weights():
    """Constants validation with REAL weights: the vendored npz (produced
    by scripts/export_lpips_weights.py on an internet-connected machine)
    embeds a golden pair + the torch-side LPIPS distance computed from the
    exact exported weights; the JAX implementation must reproduce it.
    Skipped when no real-weight npz is vendored (air-gapped build env)."""
    import os

    path = os.environ.get("FROSTING_TPU_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        pytest.skip("no real-weight LPIPS npz vendored")
    z = np.load(path)
    if "golden_value" not in z:
        pytest.skip("npz lacks embedded golden value (old export)")

    from frosting_tpu.metrics import LPIPS

    lp = LPIPS(path)
    ours = float(lp(z["golden_a"], z["golden_b"]))
    np.testing.assert_allclose(ours, float(z["golden_value"]), rtol=1e-3)
    assert float(lp(z["golden_a"], z["golden_a"])) < 1e-8
