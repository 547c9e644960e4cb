"""Round-4 synthetic-task knobs: sparse init, textured GT, KNN auto-block.

The densify-to-1M flagship run (CONVERGENCE_r5.md) relies on these:
``init_points`` subsamples the GT cloud (SfM-sparse-init regime) and
``color_freq`` sharpens the GT color field so densification scores stay
alive; ``knn_mean_sq_dist`` auto-sizes its scan block so million-point
clouds don't materialize a >16 GB distance slab.
"""
import numpy as np
import jax.numpy as jnp

from litegs_tpu.data import synthetic, synthetic_train
from litegs_tpu.scene.gaussians import knn_mean_sq_dist


def test_color_freq_changes_colors_not_positions():
    xyz1, rgb1 = synthetic.make_gaussian_cloud(512, seed=3, freq=1.0)
    xyz2, rgb2 = synthetic.make_gaussian_cloud(512, seed=3, freq=3.0)
    np.testing.assert_array_equal(xyz1, xyz2)
    assert np.abs(rgb1 - rgb2).max() > 0.05
    # higher frequency -> more spatial color variation between neighbors
    order = np.argsort(xyz1[:, 0], kind="stable")
    var1 = np.abs(np.diff(rgb1[order], axis=0)).mean()
    var2 = np.abs(np.diff(rgb2[order], axis=0)).mean()
    assert var2 > var1


def test_make_task_sparse_init_subsamples():
    data, init_xyz, init_color = synthetic_train.make_task(
        n_points=600, n_frames=2, img_h=32, img_w=48, sh_degree=1,
        seed=0, backend="jnp", init_points=200, color_freq=2.0)
    assert init_xyz.shape == (200, 3) and init_color.shape == (200, 3)
    assert data.images.shape == (2, 3, 32, 48)
    assert float(jnp.max(data.images)) > 0.05  # GT actually rendered


def test_knn_auto_block_matches_explicit():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((700, 3)), jnp.float32)
    auto = knn_mean_sq_dist(xyz)             # auto block (>= n here)
    explicit = knn_mean_sq_dist(xyz, block=256)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(explicit),
                               rtol=1e-5, atol=1e-6)
