"""Unit tests for round-2 fixes: ply header guard, checkpoint treedef
validation, multi-host frame sharding, capacity bucket slack."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from litegs_tpu import config as cfg
from litegs_tpu.io import checkpoint as ckpt
from litegs_tpu.io import ply as ply_io
from litegs_tpu.training.start import shard_frames_for_process


def test_ply_rejects_non_vertex_first(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(
        b"ply\nformat binary_little_endian 1.0\n"
        b"element face 1\nproperty float dummy\n"
        b"element vertex 1\nproperty float x\nproperty float y\n"
        b"property float z\nend_header\n" + b"\x00" * 16)
    with pytest.raises(ValueError, match="vertex element first"):
        ply_io.read_ply_vertices(str(p))


def test_checkpoint_treedef_mismatch_rejected(tmp_path):
    state = {"a": jnp.zeros((4,)), "b": jnp.ones((4,))}
    path = ckpt.save_checkpoint(str(tmp_path), 3, state)
    # same leaf count + shapes, different structure
    bad_template = (jnp.zeros((4,)), jnp.zeros((4,)))
    with pytest.raises(AssertionError, match="treedef"):
        ckpt.load_checkpoint(path, bad_template)
    epoch, restored = ckpt.load_checkpoint(path, state)
    assert epoch == 3
    np.testing.assert_array_equal(np.asarray(restored["b"]), 1.0)


def test_shard_frames_round_robin():
    frames = list(range(10))
    shards = [shard_frames_for_process(frames, i, 4) for i in range(4)]
    # disjoint cover
    flat = sorted(f for s in shards for f in s)
    assert flat == frames
    assert shards[0] == [0, 4, 8]
    assert shards[3] == [3, 7]
    # single process = identity
    assert shard_frames_for_process(frames, 0, 1) == frames


def test_bucket_slack_bound():
    rng = np.random.default_rng(0)
    for x in rng.integers(1_000, 10_000_000, 200):
        b = cfg.bucket_size(int(x))
        assert b >= int(x * 1.25)
        assert b <= int(x * 1.25 * 1.1) + 256, (x, b)
        assert b % 128 == 0


def test_lpips_native_runs_with_synthetic_weights(tmp_path, monkeypatch):
    """The native JAX LPIPS computes (zero for identical images,
    positive and finite for different ones) given a weight file."""
    rng = np.random.default_rng(0)
    n_convs = 13
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
              512]
    arrays = {}
    cin = 3
    for i, cout in enumerate(widths):
        arrays[f"conv{i}_weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        arrays[f"conv{i}_bias"] = np.zeros(cout, np.float32)
        cin = cout
    for k, c in enumerate([64, 128, 256, 512, 512]):
        arrays[f"lin{k}"] = np.abs(
            rng.standard_normal(c).astype(np.float32))
    wpath = tmp_path / "lpips_vgg.npz"
    np.savez(wpath, **arrays)
    monkeypatch.setenv("LPIPS_WEIGHTS", str(wpath))

    from litegs_tpu import metrics
    fn = metrics.lpips_fn()
    assert fn is not None
    img = rng.random((3, 32, 32)).astype(np.float32)
    gt = rng.random((3, 32, 32)).astype(np.float32)
    assert fn(img, img) == pytest.approx(0.0, abs=1e-6)
    d = fn(img, gt)
    assert np.isfinite(d) and d > 0


def test_lpips_unavailable_without_weights(monkeypatch, tmp_path):
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
    from litegs_tpu import metrics
    assert metrics.lpips_fn() is None


def test_disable_culling_matches_for_fully_visible_scene():
    """--disable_culling keeps every chunk; for a scene entirely inside
    the frustum the render must be identical to the culled one."""
    import jax.numpy as jnp
    from litegs_tpu import config, data, render, scene

    cam, frames = data.synthetic.make_cameras(1, 64, 96, seed=0)
    xyz, rgb = data.synthetic.make_gaussian_cloud(600, seed=1)
    params = scene.pad_params(scene.create_gaussians(xyz, rgb, 1), 768)
    caps = config.CapacityParams(768, 768, 8192, 16384)
    xyz_a, s_a, r_a, _ = scene.activate(params)
    origin, extend = scene.cluster.chunk_aabb(xyz_a, s_a, r_a, 128)
    f = frames[0]
    planes = jnp.asarray(f.frustumplane(cam.proj_matrix()))
    center = jnp.asarray(f.camera_center(), jnp.float32)
    view = jnp.asarray(f.view_matrix())
    proj = jnp.asarray(cam.proj_matrix())

    outs = []
    for disable in (False, True):
        pp = config.PipelineParams(raster_backend="jnp",
                                   disable_culling=disable)
        culled = render.render_preprocess(params, origin, extend, planes,
                                          center, 1, pp, caps)
        v = render.render(culled, view, proj, 64, 96, pp, caps)
        outs.append(np.asarray(v.img))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
