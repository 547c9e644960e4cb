"""Projection-chain unit tests: conventions, closed forms, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litegs_tpu.ops import projection
from litegs_tpu.utils import math as um


def rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_mvp_matches_numpy_rowvector():
    rng = np.random.default_rng(0)
    n = 17
    xyz = rng.standard_normal((3, n)).astype(np.float32)
    R = um.qvec2rotmat(um.rotmat2qvec(np.linalg.qr(
        rng.standard_normal((3, 3)))[0]))
    V = um.get_view_matrix(R, rng.standard_normal(3))
    P = um.get_project_matrix(0.01, 100.0, 1.2, 1.5)
    xyz_h = np.concatenate([xyz, np.ones((1, n), np.float32)])
    view_pos, ndc = projection.mvp_transform(jnp.asarray(xyz_h),
                                             jnp.asarray(V), jnp.asarray(P))
    # numpy row-vector reference
    vp_ref = (xyz_h.T @ V).T
    hom = (vp_ref.T @ P).T
    ndc_ref = hom / hom[3]
    np.testing.assert_allclose(view_pos, vp_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ndc[:3], ndc_ref[:3], rtol=1e-4, atol=1e-4)


def test_transform_matrix_is_rotation_times_scale():
    rng = np.random.default_rng(1)
    q = rand(rng, 4, 5)
    q = q / jnp.linalg.norm(q, axis=0)
    s = jnp.exp(rand(rng, 3, 5))
    m = np.asarray(projection.create_transform_matrix(s, q))
    # row i of M must be s_i times a row of the transposed COLMAP rotation
    # (the reference's row-vector convention, wrapper.py:198-220)
    for n in range(5):
        r_colmap = um.qvec2rotmat(np.asarray(q)[:, n])
        want = np.asarray(s)[:, None, n] * r_colmap.T
        np.testing.assert_allclose(m[:, :, n], want, rtol=1e-4, atol=1e-5)


def test_inverse_2x2_sym():
    rng = np.random.default_rng(2)
    a = jnp.exp(rand(rng, 20)) + 1.0
    c = jnp.exp(rand(rng, 20)) + 1.0
    b = rand(rng, 20) * 0.5
    cov = jnp.stack([a, b, c])
    inv = projection.inverse_2x2_sym(cov)
    # cov @ inv == I
    i00 = cov[0] * inv[0] + cov[1] * inv[1]
    i01 = cov[0] * inv[1] + cov[1] * inv[2]
    i11 = cov[1] * inv[1] + cov[2] * inv[2]
    np.testing.assert_allclose(i00, 1.0, atol=1e-4)
    np.testing.assert_allclose(i01, 0.0, atol=1e-4)
    np.testing.assert_allclose(i11, 1.0, atol=1e-4)


def test_eigh_2x2():
    rng = np.random.default_rng(3)
    a = jnp.exp(rand(rng, 30)) * 10
    c = jnp.exp(rand(rng, 30)) * 10
    b = rand(rng, 30)
    cov = jnp.stack([a, b, c])
    val, vec = projection.eigh_2x2_sym(cov)
    mats = np.stack([np.stack([a, b]), np.stack([b, c])]).transpose(2, 0, 1)
    val_ref = np.linalg.eigvalsh(mats)
    np.testing.assert_allclose(np.asarray(val).T, val_ref, rtol=1e-4,
                               atol=1e-4)
    # eigenvectors: A v = lambda v (tolerance scaled to matrix magnitude)
    scale = np.abs(mats).max(axis=(1, 2))[:, None, None] + 1.0
    for i in range(2):
        v = np.asarray(vec)[:, i, :].T[..., None]
        av = mats @ v
        lv = val_ref[:, i][:, None, None] * v
        np.testing.assert_allclose(av / scale, lv / scale, atol=2e-4)


def test_cov2d_gradcheck():
    """Finite-difference check through the full projection chain."""
    rng = np.random.default_rng(4)
    n = 8
    q = rand(rng, 4, n)
    s = rand(rng, 3, n) * 0.1 - 1.0
    xyz = rand(rng, 3, n)
    xyz = xyz.at[2].add(4.0)
    V = jnp.eye(4)
    P = jnp.asarray(um.get_project_matrix(0.01, 100.0, 1.5, 1.5))

    def f(q, s, xyz):
        qn = q / jnp.linalg.norm(q, axis=0)
        m = projection.create_transform_matrix(jnp.exp(s), qn)
        xyz_h = projection.homogeneous(xyz)
        view_pos, _ = projection.mvp_transform(xyz_h, V, P)
        jac = projection.rayspace_jacobian(view_pos, P, 100, 100)
        cov2d = projection.cov2d_from_transform(jac, V, m)
        inv = projection.inverse_2x2_sym(cov2d)
        return jnp.sum(jnp.sin(inv))

    # xyz is excluded: it only enters through the ray-space Jacobian, which
    # is non-differentiable by design (reference wrapper.py:243 @no_grad)
    grads = jax.grad(f, argnums=(0, 1))(q, s, xyz)
    eps = 1e-3
    for argi, x in enumerate((q, s)):
        flat = np.asarray(x).ravel()
        g = np.asarray(grads[argi]).ravel()
        idxs = rng.choice(flat.size, size=6, replace=False)
        for i in idxs:
            xp, xm = flat.copy(), flat.copy()
            xp[i] += eps
            xm[i] -= eps
            args_p = [q, s, xyz]
            args_m = [q, s, xyz]
            args_p[argi] = jnp.asarray(xp.reshape(x.shape))
            args_m[argi] = jnp.asarray(xm.reshape(x.shape))
            fd = (f(*args_p) - f(*args_m)) / (2 * eps)
            assert abs(fd - g[i]) < 2e-2 + 0.05 * abs(fd), (argi, i, fd, g[i])


def test_frustum_culling():
    V = jnp.eye(4)
    P = jnp.asarray(um.get_project_matrix(0.01, 100.0, 1.0, 1.0))
    planes = um.viewproj_to_frustumplane((V @ P)[None])
    # box at origin is behind the camera-at-origin near plane edge; box at
    # z=5 in front is visible; box at z=-5 is not.
    origins = jnp.asarray([[0, 0, 0], [0, 0, 5], [0, 0, -5],
                           [20, 0, 5]], jnp.float32).T
    exts = jnp.full((3, 4), 0.5)
    vis = um.frustum_culling_aabb(planes, origins, exts)
    assert bool(vis[1])
    assert not bool(vis[2])
    assert not bool(vis[3])


def test_img_tiles_roundtrip():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((3, 37, 53)), jnp.float32)
    tiles = um.img_to_tiles(img, 8, 16)
    back = um.tiles_to_img(tiles, 37, 53, 8, 16)
    np.testing.assert_allclose(back, img, atol=1e-7)


def test_cov2d_fused_matches_composition():
    """cov2d_fused == cov2d_from_transform(create_transform_matrix(...)),
    forward and gradients (it replaces the composition in the render
    path to avoid [3,3,N] relayouts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from litegs_tpu.ops import projection

    rng = np.random.RandomState(11)
    n = 257
    scale = jnp.asarray(rng.rand(3, n) * 0.5 + 0.1, jnp.float32)
    rot = rng.randn(4, n).astype(np.float32)
    rot = jnp.asarray(rot / np.linalg.norm(rot, axis=0, keepdims=True))
    jac = np.zeros((3, 3, n), np.float32)
    jac[0, 0] = rng.rand(n) * 200 + 100
    jac[1, 1] = rng.rand(n) * 200 + 100
    jac[2, 0] = rng.randn(n) * 20
    jac[2, 1] = rng.randn(n) * 20
    jac = jnp.asarray(jac)
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    view = jnp.asarray(view)
    w = jnp.asarray(rng.randn(3, n), jnp.float32)

    def composed(s, q):
        m = projection.create_transform_matrix(s, q)
        return projection.cov2d_from_transform(jac, view, m)

    def fused(s, q):
        return projection.cov2d_fused(s, q, jac, view)

    ca = composed(scale, rot)
    cb = fused(scale, rot)
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                               rtol=2e-5, atol=2e-4)
    ga = jax.grad(lambda s, q: jnp.sum(composed(s, q) * w),
                  argnums=(0, 1))(scale, rot)
    gb = jax.grad(lambda s, q: jnp.sum(fused(s, q) * w),
                  argnums=(0, 1))(scale, rot)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-2)
