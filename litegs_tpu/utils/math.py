"""Camera math and small geometry utilities.

Conventions follow the reference exactly (DX-style row-vector matrices:
``p_clip = p_world @ V @ P`` with V, P stored transposed; see
litegs/data.py:13,43-50 and litegs/utils/__init__.py:33-136).  Host-side
helpers use numpy; device-side helpers use jnp and are jit-safe.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy) camera helpers
# ---------------------------------------------------------------------------

def qvec2rotmat(qvec):
    """COLMAP-convention quaternion (w,x,y,z) -> 3x3 rotation matrix.

    Matches reference litegs/utils/__init__.py:7-17.
    """
    w, x, y, z = qvec[0], qvec[1], qvec[2], qvec[3]
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


def rotmat2qvec(R):
    """3x3 rotation matrix -> quaternion (w,x,y,z); reference :20-31."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = np.asarray(R).flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz]]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def get_view_matrix(R, t) -> np.ndarray:
    """World->view matrix, stored transposed for row-vector use.

    Reference builds Rt (rows = R, last col = t) then transposes at the call
    site (litegs/utils/__init__.py:33-38, litegs/data.py:77).  We return the
    already-transposed row-vector form: ``p_view = p_world_h @ M``.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return np.float32(Rt.T)


def get_project_matrix(z_near: float, z_far: float,
                       recp_tan_half_fov_x: float,
                       recp_tan_half_fov_y: float) -> np.ndarray:
    """Perspective projection (transposed / row-vector form).

    Matches the reference PinHoleCameraInfo matrix (litegs/data.py:43-46):
    column-major entries P[2,2]=zf/(zf-zn), P[2,3]=-zf*zn/(zf-zn), P[3,2]=1
    before the transpose.
    """
    P = np.array([
        [recp_tan_half_fov_x, 0, 0, 0],
        [0, recp_tan_half_fov_y, 0, 0],
        [0, 0, z_far / (z_far - z_near), -z_far * z_near / (z_far - z_near)],
        [0, 0, 1, 0]], dtype=np.float32)
    return P.T.copy()


def fov_to_recp_tan(focal: float, size: int) -> float:
    return focal / (size * 0.5)


# ---------------------------------------------------------------------------
# Frustum planes + AABB culling (device-side, jnp)
# ---------------------------------------------------------------------------

def viewproj_to_frustumplane(viewproj):
    """viewproj [..., 4, 4] -> 6 frustum planes [..., 6, 4].

    Plane extraction in the row-vector convention; matches reference
    litegs/utils/__init__.py:62-107 (left/right/bottom/top/near/far order).
    """
    vp = viewproj
    col = lambda j: vp[..., :, j]
    planes = jnp.stack([
        col(3) + col(0),   # left
        col(3) - col(0),   # right
        col(3) + col(1),   # bottom
        col(3) - col(1),   # top
        col(2),            # near
        col(3) - col(2),   # far
    ], axis=-2)
    return planes


def frustum_culling_aabb(frustumplane, aabb_origin, aabb_ext):
    """AABB-vs-frustum visibility.

    Args:
      frustumplane: [6, 4] (single view) or [V, 6, 4].
      aabb_origin:  [3, M] box centers.
      aabb_ext:     [3, M] box half-extents.
    Returns:
      visibility [M] bool (any view) -- matches reference
      litegs/utils/__init__.py:109-136 (box visible iff no plane has the
      pushed-out center fully behind it).
    """
    fp = jnp.atleast_3d(frustumplane)
    if fp.shape[-2:] != (6, 4):
        fp = frustumplane.reshape((-1, 6, 4))
    normals = fp[..., :3]                              # [V, 6, 3]
    d = fp[..., 3]                                     # [V, 6]
    dist_origin = jnp.einsum("vpc,cm->vpm", normals, aabb_origin)
    dist_ext = jnp.einsum("vpc,cm->vpm", jnp.abs(normals), aabb_ext)
    pushed = dist_origin + dist_ext + d[..., None]     # [V, 6, M]
    outside_any_plane = jnp.any(pushed < 0, axis=-2)   # [V, M]
    return ~jnp.all(outside_any_plane, axis=0) if fp.ndim == 3 else None


# ---------------------------------------------------------------------------
# Image <-> tile layout
# ---------------------------------------------------------------------------

def tile_grid(img_h: int, img_w: int, tile_h: int, tile_w: int):
    """Number of tiles (y, x) covering a padded image."""
    return (math.ceil(img_h / tile_h), math.ceil(img_w / tile_w))


def img_to_tiles(img, tile_h: int, tile_w: int):
    """[C, H, W] -> [T, C, tile_h*tile_w] with zero padding.

    TPU-native layout: each tile's pixels land on the 128-lane minor axis
    (tile_h*tile_w == 128 for the default (8,16) tile).  Functional analogue
    of reference img2tiles_torch (litegs/utils/__init__.py:140-148).
    """
    c, h, w = img.shape
    ty, tx = tile_grid(h, w, tile_h, tile_w)
    pad_h, pad_w = ty * tile_h - h, tx * tile_w - w
    img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w)))
    img = img.reshape(c, ty, tile_h, tx, tile_w)
    img = img.transpose(1, 3, 0, 2, 4)                 # [ty, tx, C, th, tw]
    return img.reshape(ty * tx, c, tile_h * tile_w)


def tiles_to_img(tiles, img_h: int, img_w: int, tile_h: int, tile_w: int):
    """[T, C, tile_h*tile_w] -> [C, H, W], cropping padding."""
    t, c, _ = tiles.shape
    ty, tx = tile_grid(img_h, img_w, tile_h, tile_w)
    img = tiles.reshape(ty, tx, c, tile_h, tile_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, ty * tile_h, tx * tile_w)
    return img[:, :img_h, :img_w]
