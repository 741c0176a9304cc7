"""Editing runtime: identity edits are exact; rigid motions transport the
frosting correctly; LBS skinning behaves."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.models import editing, frosting as frosting_lib
from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.raster import RasterConfig, render
from tests.test_mesh import icosphere


def _make_frosting(seed=0, n=2000):
    v, f = icosphere(2)
    rng = np.random.default_rng(seed)
    params = frosting_lib.FrostingParams(
        shell_verts=jnp.asarray(v, jnp.float32),
        inner_dist=jnp.full((len(v),), -0.08, jnp.float32),
        outer_dist=jnp.full((len(v),), 0.08, jnp.float32),
        bary_logits=jnp.asarray(rng.normal(size=(n, 6)), jnp.float32),
        scales_log=jnp.full((n, 3), np.log(0.04), jnp.float32),
        quats_raw=jnp.asarray(
            rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]), jnp.float32
        ),
        opacities_raw=jnp.full((n,), 1.5, jnp.float32),
        sh_dc=jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.5, jnp.float32),
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
    )
    meta = frosting_lib.FrostingMeta(
        faces=jnp.asarray(f, jnp.int32),
        cell_idx=jnp.asarray(
            rng.integers(0, len(f), n), jnp.int32
        ),
    )
    return params, meta


CFG = RasterConfig(width=64, height=64, chunk=32, max_instances=8192, backend="jax")
CAM = look_at_camera(eye=[0, 0, -3.0], target=[0, 0, 0])


def test_identity_edit_matches_direct_render():
    params, meta = _make_frosting()
    eg = editing.adapt_frosting(params, meta, params.shell_verts)
    img_edit = editing.render_edited(eg, CAM, CFG).image
    m, s, q, o, sh = frosting_lib.activate_frosting(params, meta)
    img_ref = render(m, s, q, o, sh, CAM, CFG).image
    np.testing.assert_allclose(
        np.asarray(img_edit), np.asarray(img_ref), atol=2e-3
    )


def test_rigid_rotation_transports_render():
    params, meta = _make_frosting()
    # rotate the whole shell 90deg about z; camera rotated identically must
    # see the same image
    angle = np.pi / 2
    Rz = jnp.asarray(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ],
        jnp.float32,
    )
    new_verts = params.shell_verts @ Rz.T
    eg = editing.adapt_frosting(params, meta, new_verts)
    img_rot = editing.render_edited(eg, CAM, CFG).image

    # original shell, camera moved to the pre-image of the rotation
    eye = np.array([0.0, 0.0, -3.0])
    Rz_np = np.asarray(Rz)
    cam2 = look_at_camera(eye=Rz_np.T @ eye, target=[0, 0, 0],
                          up=tuple(Rz_np.T @ np.array([0, 1.0, 0])))
    eg0 = editing.adapt_frosting(params, meta, params.shell_verts)
    img_ref = editing.render_edited(eg0, cam2, CFG).image
    diff = np.abs(np.asarray(img_rot) - np.asarray(img_ref))
    assert diff.mean() < 5e-3, diff.mean()


def test_deformation_masking_kills_stretched_cells():
    params, meta = _make_frosting()
    # blow the shell up 5x: every cell stretches >2x -> all opacities 0
    eg = editing.adapt_frosting(
        params, meta, params.shell_verts * 5.0, deformation_threshold=2.0
    )
    assert float(eg.opacities.max()) == 0.0


def test_lbs_rigid_bone():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    w = np.ones((3, 1), np.float32)
    rest = np.eye(4, dtype=np.float32)[None]
    pose = np.eye(4, dtype=np.float32)[None].copy()
    pose[0, :3, 3] = [1.0, 2.0, 3.0]  # translate
    out = editing.lbs_pose_verts(
        jnp.asarray(v), jnp.asarray(w), jnp.asarray(rest), jnp.asarray(pose)
    )
    np.testing.assert_allclose(np.asarray(out), v + np.array([1, 2, 3]), atol=1e-5)


def test_thickness_rescaling_factors():
    """Uniform 2x mesh scale must rescale thickness by 2 in both modes;
    rigid motion leaves it at 1 (fm:649-705)."""
    params, meta = _make_frosting()
    v = params.shell_verts
    for mode in ("median", "triangle"):
        f2 = editing.thickness_rescale_factors(v, 2.0 * v, meta.faces, mode)
        np.testing.assert_allclose(np.asarray(f2), 2.0, rtol=1e-5)
        q = quat_ops.normalize(jnp.asarray([0.9, 0.1, -0.3, 0.2]))
        vr = quat_ops.apply(q[None], v) + jnp.asarray([0.3, -0.1, 0.2])
        fr = editing.thickness_rescale_factors(v, vr, meta.faces, mode)
        np.testing.assert_allclose(np.asarray(fr), 1.0, rtol=1e-4)
    f0 = editing.thickness_rescale_factors(v, 2.0 * v, meta.faces, "none")
    np.testing.assert_allclose(np.asarray(f0), 1.0)


def test_thickness_rescaling_in_adapt():
    """adapt_frosting with a 2x-scaled shell doubles the layer thickness:
    gaussian centers move out to ~2x their original offset from the base
    surface (because inner/outer dists rescale)."""
    params, meta = _make_frosting()
    eg_resc = editing.adapt_frosting(
        params, meta, 2.0 * params.shell_verts, deformation_threshold=10.0,
        thickness_rescale="median",
    )
    eg_none = editing.adapt_frosting(
        params, meta, 2.0 * params.shell_verts, deformation_threshold=10.0,
        thickness_rescale="none",
    )
    # radial offset of gaussian centers from the (scaled) unit-2 sphere
    r_resc = jnp.linalg.norm(eg_resc.means, axis=-1) - 2.0
    r_none = jnp.linalg.norm(eg_none.means, axis=-1) - 2.0
    # with rescaling the off-surface spread doubles vs no rescaling
    ratio = float(jnp.std(r_resc) / jnp.maximum(jnp.std(r_none), 1e-9))
    assert 1.7 < ratio < 2.3, ratio


def test_simple_adaptation_rigid_parity():
    """Under a rigid motion, simple adaptation must agree with the full
    affine adaptation (both reduce to the same rotation)."""
    params, meta = _make_frosting()
    q = quat_ops.normalize(jnp.asarray([0.8, -0.2, 0.4, 0.1]))
    t = jnp.asarray([0.2, 0.5, -0.3])
    new_v = quat_ops.apply(q[None], params.shell_verts) + t

    eg_full = editing.adapt_frosting(
        params, meta, new_v, deformation_threshold=10.0
    )
    eg_simple = editing.adapt_frosting_simple(params, meta, new_v)
    np.testing.assert_allclose(
        np.asarray(eg_simple.means), np.asarray(eg_full.means), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(eg_simple.cov6), np.asarray(eg_full.cov6), atol=1e-4
    )
    # rendered images agree
    out_f = editing.render_edited(eg_full, CAM, CFG)
    out_s = editing.render_edited(eg_simple, CAM, CFG)
    np.testing.assert_allclose(
        np.asarray(out_s.image), np.asarray(out_f.image), atol=5e-3
    )


def test_composite_keeps_background_gaussians():
    """The first model's background Gaussians survive composition,
    world-transformed (bf:360-371); rendering them changes the image."""
    from frosting_tpu.scene.gaussians import GaussianParams

    params, meta = _make_frosting(n=256)
    rng = np.random.default_rng(7)
    nb = 64
    bg = GaussianParams(
        means3d=jnp.asarray(rng.uniform(1.5, 2.5, (nb, 3)), jnp.float32),
        sh_dc=jnp.asarray(rng.normal(size=(nb, 1, 3)), jnp.float32),
        sh_rest=jnp.zeros((nb, 15, 3), jnp.float32),
        scales_log=jnp.full((nb, 3), np.log(0.2), jnp.float32),
        quats_raw=jnp.concatenate(
            [jnp.ones((nb, 1)), jnp.zeros((nb, 3))], -1
        ),
        opacities_raw=jnp.full((nb,), 2.0, jnp.float32),
        mask=jnp.ones((nb,), jnp.float32),
    )
    params = dataclasses.replace(params, bg=bg)

    # uniform-scale rigid world transform
    s = 2.0
    T = np.diag([s, s, s, 1.0]).astype(np.float32)
    T[:3, 3] = [0.5, 0.0, 0.0]
    scene = editing.build_composite_scene(
        [(params, meta)], world_transforms=[T]
    )
    assert scene.params.bg is not None
    moved = np.asarray(scene.params.bg.means3d)
    expect = np.asarray(bg.means3d) * s + np.asarray([0.5, 0.0, 0.0])
    np.testing.assert_allclose(moved, expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(scene.params.bg.scales_log),
        np.asarray(bg.scales_log) + np.log(s),
        rtol=1e-5,
    )

    # rendering with bg composited differs from without
    from frosting_tpu.cameras import look_at_camera

    eg = editing.adapt_frosting(
        scene.params, scene.meta, scene.params.shell_verts
    )
    bg_eg = editing.background_to_edited(scene.params.bg)
    both = editing.concat_edited(eg, bg_eg)
    cam = look_at_camera(eye=[0.0, 0.0, -4.0], target=[1.0, 0.0, 0.0])
    img_no = np.asarray(editing.render_edited(eg, cam, CFG).image)
    img_bg = np.asarray(editing.render_edited(both, cam, CFG).image)
    assert np.isfinite(img_bg).all()
    assert np.abs(img_bg - img_no).max() > 0.01
