"""Export real LPIPS(vgg) weights to the npz format frosting_tpu.metrics
loads (FROSTING_TPU_LPIPS_WEIGHTS). Run this ON A MACHINE WITH INTERNET
ACCESS + torchvision (this repo's build environment is air-gapped, so the
npz must be produced elsewhere and vendored):

  python scripts/export_lpips_weights.py -o lpips_vgg.npz

Sources (exactly what the reference uses,
gaussian_splatting/lpipsPyTorch/modules/{lpips,networks}.py):
  * torchvision VGG16 IMAGENET1K_V1 `features` convolutions
  * LPIPS v0.1 vgg linear heads from richzhang/PerceptualSimilarity
    (torch.hub; the `lpips` pip package bundles them as
    lpips/weights/v0.1/vgg.pth)

The export also embeds a GOLDEN VALUE: two fixed synthetic images are
pushed through the torch-side LPIPS built from the very weights being
exported, and the inputs + expected distance are stored in the npz
(keys golden_a/golden_b/golden_value). tests/test_metrics.py's gated
golden test then verifies the JAX implementation reproduces that value
from the vendored file — end-to-end constants validation with no network
at test time.
"""

from __future__ import annotations

import argparse

import numpy as np

VGG_CONVS = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
CHANNELS = [64, 128, 256, 512, 512]


def torch_lpips_from_npz(a, b, z):
    """Reference-faithful torch LPIPS from npz weights (mirrors
    lpipsPyTorch/modules/{lpips,networks,utils}.py and the validation
    harness in tests/test_metrics.py)."""
    import torch
    import torch.nn.functional as F

    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = x * 2.0 - 1.0
        h = (x - mean) / std
        out = []
        conv = {i for i, _, _ in VGG_CONVS}
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    import torchvision

    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
    ).features.eval()

    z = {}
    for i, _cout, _cin in VGG_CONVS:
        z[f"features.{i}.weight"] = (
            vgg[i].weight.detach().numpy().astype(np.float32)
        )
        z[f"features.{i}.bias"] = (
            vgg[i].bias.detach().numpy().astype(np.float32)
        )

    # LPIPS v0.1 vgg linear heads. Preferred: the `lpips` pip package
    # (bundles the weights offline once installed); fallback: torch.hub.
    try:
        import lpips as lpips_pkg
        import os

        wpath = os.path.join(
            os.path.dirname(lpips_pkg.__file__), "weights", "v0.1", "vgg.pth"
        )
        heads = torch.load(wpath, map_location="cpu")
    except ImportError:
        heads = torch.hub.load_state_dict_from_url(
            "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
            "lpips/weights/v0.1/vgg.pth",
            map_location="cpu",
        )
    for k, c in enumerate(CHANNELS):
        w = heads[f"lin{k}.model.1.weight"].detach().numpy()
        assert w.shape == (1, c, 1, 1), (k, w.shape)
        z[f"lin{k}.model.1.weight"] = w.astype(np.float32)

    # golden pair: deterministic synthetic images + expected distance
    rng = np.random.default_rng(1234)
    xs = np.linspace(0, 1, 64, dtype=np.float32)
    base = np.stack(
        [np.outer(xs, xs), np.outer(1 - xs, xs), np.outer(xs, 1 - xs)]
    )
    noise = rng.normal(0, 0.08, base.shape).astype(np.float32)
    a = np.clip(base, 0, 1)
    b = np.clip(base + noise, 0, 1)
    golden = torch_lpips_from_npz(
        torch.tensor(a)[None], torch.tensor(b)[None], z
    )
    z["golden_a"] = a
    z["golden_b"] = b
    z["golden_value"] = np.float32(golden)

    np.savez(args.output, **z)
    print(f"wrote {args.output}: golden LPIPS = {golden:.6f}")


if __name__ == "__main__":
    main()
