"""Gating tests over the committed benchmark artifacts: the JSON files the
TPU benchmark scripts write are load-bearing evidence for the BASELINE
configs, so regressions in them must fail the suite, not just drift
silently. Each test skips when its artifact has not been produced yet
(fresh clone) but FAILS when an artifact exists below its floor."""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not produced in this environment")
    with open(path) as fh:
        return json.load(fh)


def test_psnr_bench_floor():
    """BASELINE config 2 (3DGS 7k full recipe): eval PSNR >= 27 dB."""
    d = _load("PSNR_BENCH.json")
    assert d["iterations"] >= 7000
    assert d["eval_psnr"] >= 27.0, d["eval_psnr"]
    assert d["eval_ssim"] >= 0.90, d["eval_ssim"]


def test_shelly_bench_floor():
    """BASELINE config 3 (SuGaR + shell + frosting, Shelly knobs): the
    full-budget run must not exhibit the entropy->sdf collapse — eval
    PSNR of the refined frosting >= 27 dB on the held-out views."""
    d = _load("SHELLY_BENCH.json")
    assert d["eval_psnr"] >= 27.0, d["eval_psnr"]
    assert d["shell_vertices"] > 10_000, d["shell_vertices"]


def test_refine2m_culled_speedup():
    """BASELINE config 4 (2M refine w/ occlusion culling): culling must
    deliver a real compute saving."""
    d = _load("REFINE2M.json")
    assert d["culled_speedup"] >= 1.2, d["culled_speedup"]


def test_pipeline_mc_floor():
    """BASELINE config 5 (full sharded pipeline on the virtual mesh):
    eval PSNR floor so sharded-path regressions fail loudly."""
    d = _load("PIPELINE_MC.json")
    psnr = d.get("eval_psnr") or d.get("final_psnr")
    assert psnr is not None, d
    # 36.4 dB measured after the entropy-NaN fix (round 4); floor set
    # with margin so sharded-path regressions still fail loudly
    assert psnr >= 30.0, psnr
