"""Gaussian projection chain: world -> view -> NDC -> 2D covariance.

All of these are per-primitive elementwise chains over the ``[C, N]``
channel-first layout.  The reference implements each as a hand-written CUDA
kernel pair (transform.cu: mvp 378-598, transform-matrix 92-256, jacobian
22-90, cov2d 736-927, eigh/inverse 1364-1487); on TPU plain jnp is the right
tool -- XLA fuses the whole chain into a handful of VPU loops and autodiff
supplies backwards that are mathematically identical to the reference's
hand-derived ones.  Semantics (clamps, low-pass, conventions) match the
reference exactly; each function cites its counterpart.

Conventions: DX/row-vector matrices, ``p_view = p_world_h @ V``,
``p_clip = p_view @ P`` (see litegs/data.py:13).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def homogeneous(xyz):
    """[3, N] -> [4, N] with w = 1."""
    return jnp.concatenate([xyz, jnp.ones_like(xyz[:1])], axis=0)


def mvp_transform(xyz_h, view_matrix, proj_matrix):
    """World -> view and NDC positions.

    Matches mvp_forward_kernel (transform.cu:378-438): view_pos = x @ V,
    hom = view_pos @ P, ndc = hom / hom.w with w guarded at |w| > 1e-12
    (zero otherwise), ndc.w fixed to 1.

    Args:
      xyz_h: [4, N] homogeneous world positions.
      view_matrix, proj_matrix: [4, 4] row-vector matrices.
    Returns:
      (view_pos [4, N], ndc [4, N])
    """
    view_pos = jnp.einsum("kc,kn->cn", view_matrix, xyz_h,
                          precision=jax.lax.Precision.HIGHEST)
    hom = jnp.einsum("kc,kn->cn", proj_matrix, view_pos,
                     precision=jax.lax.Precision.HIGHEST)
    w = hom[3]
    inv_w = jnp.where(jnp.abs(w) > 1e-12, 1.0 / jnp.where(w == 0, 1.0, w),
                      0.0)
    ndc = hom * inv_w
    ndc = ndc.at[3].set(1.0)
    return view_pos, ndc


def create_transform_matrix(scale, rot_unit):
    """(scale, unit quaternion) -> M with M[i, j] = R[i, j] * s[i].

    R rows follow the reference's row-vector rotation (wrapper.py:198-220):
    R[0] = [1-2(y^2+z^2), 2(xy+rz), 2(xz-ry)], etc.  Returns [3, 3, N].
    """
    r, x, y, z = rot_unit[0], rot_unit[1], rot_unit[2], rot_unit[3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + r * z),
                      2 * (x * z - r * y)])
    row1 = jnp.stack([2 * (x * y - r * z), 1 - 2 * (x * x + z * z),
                      2 * (y * z + r * x)])
    row2 = jnp.stack([2 * (x * z + r * y), 2 * (y * z - r * x),
                      1 - 2 * (x * x + y * y)])
    rot_mat = jnp.stack([row0, row1, row2])          # [3, 3, N]
    return rot_mat * scale[:, None, :]


def rayspace_jacobian(view_pos, proj_matrix, img_h: int, img_w: int):
    """Affine approximation of the perspective projection (EWA splatting).

    Matches jacobian_rayspace_kernel (transform.cu:22-52): focal from the
    projection diagonal, xy clamped to 1.3x the frustum at the point's
    depth, z clamped to the 0.01 near plane.  Non-differentiable in the
    reference (wrapper.py:243 @no_grad); we stop_gradient to match.

    Returns [3, 3, N] with only rows (0,0), (1,1), (2,0), (2,1) non-zero.
    """
    view_pos = jax.lax.stop_gradient(view_pos)
    focal_x = proj_matrix[0, 0] * img_w * 0.5
    focal_y = proj_matrix[1, 1] * img_h * 0.5
    tx, ty, tz = view_pos[0], view_pos[1], view_pos[2]
    limit_x = tz / proj_matrix[0, 0] * 1.3
    limit_y = tz / proj_matrix[1, 1] * 1.3
    tx = jnp.clip(tx, -limit_x, limit_x)
    ty = jnp.clip(ty, -limit_y, limit_y)
    rtz = 1.0 / jnp.maximum(tz, 1e-2)
    zeros = jnp.zeros_like(tx)
    j00 = focal_x * rtz
    j11 = focal_y * rtz
    j20 = -focal_x * tx * rtz * rtz
    j21 = -focal_y * ty * rtz * rtz
    row0 = jnp.stack([j00, zeros, zeros])
    row1 = jnp.stack([zeros, j11, zeros])
    row2 = jnp.stack([j20, j21, zeros])
    return jnp.stack([row0, row1, row2])


def cov2d_from_transform(jacobian, view_matrix, transform_matrix):
    """Project the 3D covariance to screen space, + 0.3 low-pass.

    Equivalent to the reference composition (wrapper.py:419-442 /
    transform.cu:736-821): cov3d = M^T M, T = J[:, :2]^T V3^T (row-vector
    chain), cov2d = T cov3d T^T + 0.3 I.  Returns the three unique entries
    (a, b, c) = (cov[0,0], cov[0,1], cov[1,1]) as [3, N] -- carrying
    symmetric 2x2s as 3 channels avoids the reference's double-counted
    off-diagonal gradient halving (raster.cu:827, unpack 875-877).
    """
    # t[u, k, n] = sum_i J[i, u, n] * V3[k, i]   (u in {0,1})
    j2 = jacobian[:, :2, :]                         # [3, 2, N]
    v3 = view_matrix[:3, :3]
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("iun,ki->ukn", j2, v3, precision=hi)   # [2, 3, N]
    # m2[u, j, n] = sum_k t[u, k, n] * M[j, k, n] = (T M^T)[u, j]: cov2d =
    # T cov3d T^T with cov3d = M^T M (wrapper.py:348-353; M = diag(s) R, so
    # M^T M = R^T S^2 R -- contracting M's *second* index here is what
    # carries the rotation; contracting the first would collapse to S^2)
    m2 = jnp.einsum("ukn,jkn->ujn", t, transform_matrix, precision=hi)
    a = jnp.sum(m2[0] * m2[0], axis=0) + 0.3
    b = jnp.sum(m2[0] * m2[1], axis=0)
    c = jnp.sum(m2[1] * m2[1], axis=0) + 0.3
    return jnp.stack([a, b, c])


def cov2d_fused(scale_act, rot_unit, jacobian, view_matrix):
    """Fused (scale, quat, J, V) -> cov2d rows, no [3,3,N] materialization.

    Numerically the composition create_transform_matrix +
    cov2d_from_transform, but written as pure [N]-vector arithmetic: the
    [3,3,N] intermediates tile as T(2,128)/T(1,128) on TPU and their
    relayout copies cost ~30 ms/step at 1M points (profile_step.py
    fusion.53 + copies); row-wise streams fuse into a handful of VPU
    passes instead.  J's sparsity (rows (0,0),(1,1),(2,0),(2,1) only,
    rayspace_jacobian) is exploited directly.
    Returns (a, b, c) [3, N] with the +0.3 low-pass.
    """
    r, x, y, z = rot_unit[0], rot_unit[1], rot_unit[2], rot_unit[3]
    s0, s1, s2 = scale_act[0], scale_act[1], scale_act[2]
    # M rows (create_transform_matrix): m[i][j] = R[i,j] * s_i
    m = [[(1 - 2 * (y * y + z * z)) * s0, 2 * (x * y + r * z) * s0,
          2 * (x * z - r * y) * s0],
         [2 * (x * y - r * z) * s1, (1 - 2 * (x * x + z * z)) * s1,
          2 * (y * z + r * x) * s1],
         [2 * (x * z + r * y) * s2, 2 * (y * z - r * x) * s2,
          (1 - 2 * (x * x + y * y)) * s2]]
    j00, j11 = jacobian[0, 0], jacobian[1, 1]
    j20, j21 = jacobian[2, 0], jacobian[2, 1]
    v3 = view_matrix[:3, :3]
    # t[u][k] = sum_i J[i,u] * V3[k,i]  (only J rows 0/1 diag + row 2)
    t = [[j00 * v3[k, 0] + j20 * v3[k, 2] for k in range(3)],
         [j11 * v3[k, 1] + j21 * v3[k, 2] for k in range(3)]]
    # m2[u][j] = sum_k t[u][k] * M[j][k]   (= T M^T; cov3d = M^T M)
    m2 = [[t[u][0] * m[j][0] + t[u][1] * m[j][1] + t[u][2] * m[j][2]
           for j in range(3)] for u in range(2)]
    a = m2[0][0] ** 2 + m2[0][1] ** 2 + m2[0][2] ** 2 + 0.3
    b = (m2[0][0] * m2[1][0] + m2[0][1] * m2[1][1]
         + m2[0][2] * m2[1][2])
    c = m2[1][0] ** 2 + m2[1][1] ** 2 + m2[1][2] ** 2 + 0.3
    return jnp.stack([a, b, c])


def inverse_2x2_sym(cov3):
    """Inverse of symmetric 2x2 given (a, b, c) channels; returns (a,b,c).

    Matches eigh_and_inv_2x2matrix's inverse (transform.cu:1364-1421).
    Degenerate matrices yield zeros (the reference nan_to_num's the backward,
    wrapper.py:591; forward infs are masked by the PSD visibility check in
    binning, binning.cu:320).
    """
    a, b, c = cov3[0], cov3[1], cov3[2]
    det = a * c - b * b
    safe = jnp.abs(det) > 1e-12
    inv_det = jnp.where(safe, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    return jnp.stack([c * inv_det, -b * inv_det, a * inv_det])


def eigh_2x2_sym(cov3):
    """Closed-form eigendecomposition of symmetric 2x2 (non-differentiable).

    Returns (eigval [2, N] ascending, eigvec [2, 2, N] column vectors),
    matching torch.linalg.eigh conventions used by the reference script path
    (wrapper.py:569-577).
    """
    cov3 = jax.lax.stop_gradient(cov3)
    a, b, c = cov3[0], cov3[1], cov3[2]
    mean = 0.5 * (a + c)
    radius = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    lam0 = mean - radius
    lam1 = mean + radius
    # eigenvector for lam1: (b, lam1 - a) unless b ~ 0
    use_b = jnp.abs(b) > 1e-12
    v1x = jnp.where(use_b, b, jnp.where(a >= c, 1.0, 0.0))
    v1y = jnp.where(use_b, lam1 - a, jnp.where(a >= c, 0.0, 1.0))
    norm = jnp.sqrt(v1x * v1x + v1y * v1y)
    v1x, v1y = v1x / norm, v1y / norm
    # v0 orthogonal to v1
    v0x, v0y = -v1y, v1x
    eigval = jnp.stack([lam0, lam1])
    eigvec = jnp.stack([jnp.stack([v0x, v1x]), jnp.stack([v0y, v1y])])
    return eigval, eigvec


def ndc_to_pixel(ndc_xy, img_h: int, img_w: int):
    """NDC xy -> continuous pixel coordinates.

    pixel = (ndc * 0.5 + 0.5) * size - 0.5, matching binning.cu:315-316 and
    the rasterizer's pixel-center convention (raster.cu:217-218,237).
    Returns [2, N] (x, y).
    """
    px = (ndc_xy[0] * 0.5 + 0.5) * img_w - 0.5
    py = (ndc_xy[1] * 0.5 + 0.5) * img_h - 0.5
    return jnp.stack([px, py])
