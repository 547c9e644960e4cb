"""Numerical cross-validation against the reference implementation itself.

Round 1 validated every Pallas kernel against this repo's own jnp oracle --
self-consistency.  These tests close the loop by comparing the repo's ops
against the *reference's own pure-torch script implementations* running on
CPU (the `call_script` paths that the reference's `validate()` harness uses
as ground truth, litegs/utils/wrapper.py:21-164), plus faithful torch
transcriptions of the CUDA semantics where no script path exists
(speedy-splat binning, raster blend).  This is BASELINE.json config 1.

Ground-truth sources (all pure torch, CPU-runnable):
  * transform matrix   wrapper.py:198-220
  * ray-space Jacobian wrapper.py:243-255
  * cov2d chain        wrapper.py:419-442 (call_script composite)
  * SH -> RGB          spherical_harmonics.py:38-93 via wrapper.py:560-561
  * frustum planes     litegs/utils/__init__.py:62-107
  * AABB culling       litegs/utils/__init__.py:109-136
  * exact tile sets    transcription of speedy_splat.cuh:16-149 +
                       binning.cu:289-385 (no torch script equivalent)
  * blend semantics    transcription of raster.cu:161-332 forward + the
                       straight-through clamp backward (raster.cu:776-778)
"""
from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from litegs_tpu.ops import binning as binning_ops
from litegs_tpu.ops import projection, raster_jnp
from litegs_tpu.utils import math as um
from litegs_tpu.utils import sh as sh_utils

from util_reference import load_reference

REF = load_reference()
WRAP = REF["wrapper"]
RUTILS = REF["utils"]


def t32(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


# ---------------------------------------------------------------------------
# elementwise projection chain
# ---------------------------------------------------------------------------

class TestTransformMatrix:
    def test_forward_and_grad(self):
        rng = np.random.RandomState(0)
        n = 257
        s = (rng.rand(3, n) + 0.3).astype(np.float32)
        q = rng.randn(4, n).astype(np.float32)
        w = rng.randn(3, 3, n).astype(np.float32)

        # reference: normalize + script transform (the fused pipeline
        # normalizes quaternions in cull_compact_activate, compact.cu:944)
        qt = t32(q).requires_grad_(True)
        st = t32(s).requires_grad_(True)
        qn = qt / qt.norm(dim=0, keepdim=True)
        m_ref = WRAP.CreateTransformMatrix._script(st, qn)
        m_ref.backward(t32(w))

        def ours(scale, quat):
            qn = quat / jnp.sqrt(jnp.sum(quat ** 2, axis=0, keepdims=True))
            return projection.create_transform_matrix(scale, qn)

        m_j = ours(jnp.asarray(s), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(m_j), m_ref.detach().numpy(),
                                   atol=1e-5, rtol=1e-5)
        gs, gq = jax.grad(
            lambda sc, qu: jnp.sum(ours(sc, qu) * jnp.asarray(w)),
            argnums=(0, 1))(jnp.asarray(s), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(gs), st.grad.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gq), qt.grad.numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestRayspaceJacobian:
    def test_forward(self):
        rng = np.random.RandomState(1)
        n = 129
        img_h, img_w = 480, 640
        proj = um.get_project_matrix(0.01, 100.0, 1.2, 1.6)
        # view positions inside the 1.3x clamp region (the script path has
        # no clamp; the CUDA kernel clamps -- stay inside so both agree)
        tz = rng.rand(n).astype(np.float32) * 5 + 0.5
        tx = (rng.rand(n).astype(np.float32) - 0.5) * tz / 1.2
        ty = (rng.rand(n).astype(np.float32) - 0.5) * tz / 1.6
        vpos = np.stack([tx, ty, tz, np.ones_like(tz)])

        # reference script takes the *untransposed* proj ([0,0]=recp_tan):
        # proj_matrix[:,0,0] -- our row-vector storage transposes, but the
        # diagonal entries it reads are unchanged by the transpose
        j_ref = WRAP.CreateRaySpaceTransformMatrix._script(
            t32(vpos[None]).clone(), t32(proj[None]), (img_h, img_w))
        j_ours = projection.rayspace_jacobian(
            jnp.asarray(vpos), jnp.asarray(proj), img_h, img_w)
        np.testing.assert_allclose(np.asarray(j_ours), j_ref[0].numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestCov2dChain:
    def test_forward_and_grad(self):
        rng = np.random.RandomState(2)
        n = 193
        s = (rng.rand(3, n) * 0.5 + 0.1).astype(np.float32)
        q = rng.randn(4, n).astype(np.float32)
        q /= np.linalg.norm(q, axis=0, keepdims=True)
        jac = np.zeros((3, 3, n), np.float32)
        jac[0, 0] = rng.rand(n) * 200 + 100
        jac[1, 1] = rng.rand(n) * 200 + 100
        jac[2, 0] = rng.randn(n) * 20
        jac[2, 1] = rng.randn(n) * 20
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        # symmetric cotangent (the reference's custom backwards assume
        # symmetric upstream gradients, wrapper.py:330-332)
        wa = rng.randn(n).astype(np.float32)
        wb = rng.randn(n).astype(np.float32)
        wc = rng.randn(n).astype(np.float32)

        m_t = t32(WRAP.CreateTransformMatrix._script(
            t32(s), t32(q)).detach().numpy()).requires_grad_(True)
        cov_ref = WRAP.CreateCov2dDirectly.call_script(
            t32(jac[None]), t32(view[None]), m_t)
        loss_ref = (cov_ref[0, 0, 0] * t32(wa)
                    + (cov_ref[0, 0, 1] + cov_ref[0, 1, 0]) * t32(wb)
                    + cov_ref[0, 1, 1] * t32(wc)).sum()
        loss_ref.backward()

        m_j = projection.create_transform_matrix(jnp.asarray(s),
                                                 jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(m_j), m_t.detach().numpy(),
                                   atol=1e-6)

        def loss_ours(m):
            cov = projection.cov2d_from_transform(
                jnp.asarray(jac), jnp.asarray(view), m)
            return jnp.sum(cov[0] * jnp.asarray(wa)
                           + 2 * cov[1] * jnp.asarray(wb)
                           + cov[2] * jnp.asarray(wc))

        cov_ours = projection.cov2d_from_transform(
            jnp.asarray(jac), jnp.asarray(view), m_j)
        ref_abc = np.stack([cov_ref[0, 0, 0].detach().numpy(),
                            cov_ref[0, 0, 1].detach().numpy(),
                            cov_ref[0, 1, 1].detach().numpy()])
        np.testing.assert_allclose(np.asarray(cov_ours), ref_abc,
                                   atol=1e-2, rtol=1e-4)
        g_ours = jax.grad(loss_ours)(m_j)
        np.testing.assert_allclose(np.asarray(g_ours), m_t.grad.numpy(),
                                   atol=5e-2, rtol=1e-3)


class TestSphericalHarmonics:
    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_forward_and_grad(self, deg):
        rng = np.random.RandomState(3 + deg)
        n = 65
        k = (deg + 1) ** 2
        sh = rng.randn(max(k, 1), 3, n).astype(np.float32)
        dirs = rng.randn(3, n).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
        w = rng.randn(3, n).astype(np.float32)

        sh_t = t32(sh).requires_grad_(True)
        # wrapper script: sh_to_rgb(deg, cat(base, rest), dirs) + clamp_min(0)
        # (wrapper.py:560-561); dirs layout [V, 3, N]
        rgb_ref = REF["sh"].sh_to_rgb(deg, sh_t, t32(dirs[None])).clamp_min(0)
        rgb_ref[0].backward(t32(w))

        def ours(coeff):
            return jnp.maximum(
                sh_utils.sh_to_rgb(deg, coeff, jnp.asarray(dirs)), 0.0)

        rgb_j = ours(jnp.asarray(sh))
        np.testing.assert_allclose(np.asarray(rgb_j),
                                   rgb_ref[0].detach().numpy(),
                                   atol=1e-5, rtol=1e-5)
        g = jax.grad(lambda c: jnp.sum(ours(c) * jnp.asarray(w)))(
            jnp.asarray(sh))
        np.testing.assert_allclose(np.asarray(g), sh_t.grad.numpy(),
                                   atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# frustum planes + culling
# ---------------------------------------------------------------------------

class TestFrustum:
    def _random_viewproj(self, rng):
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        view[3, :3] = rng.randn(3).astype(np.float32)
        proj = um.get_project_matrix(0.01, 100.0, 1.1, 1.4)
        return (view @ proj).astype(np.float32)

    def test_planes(self):
        rng = np.random.RandomState(4)
        vp = self._random_viewproj(rng)
        planes_ref = RUTILS.viewproj_to_frustumplane(t32(vp[None])).numpy()
        planes_ours = np.asarray(um.viewproj_to_frustumplane(
            jnp.asarray(vp[None])))
        np.testing.assert_allclose(planes_ours, planes_ref, atol=1e-5)

    def test_culling(self):
        rng = np.random.RandomState(5)
        vp = self._random_viewproj(rng)
        m = 513
        origin = rng.randn(3, m).astype(np.float32) * 6
        ext = rng.rand(3, m).astype(np.float32)
        planes = RUTILS.viewproj_to_frustumplane(t32(vp[None]))
        vis_ref = RUTILS.frustum_culling_aabb(
            planes, t32(origin), t32(ext)).numpy()[0, :]
        vis_ours = np.asarray(um.frustum_culling_aabb(
            jnp.asarray(planes.numpy()), jnp.asarray(origin),
            jnp.asarray(ext)))
        assert vis_ref.shape == vis_ours.shape
        np.testing.assert_array_equal(vis_ours, vis_ref.astype(bool))


# ---------------------------------------------------------------------------
# MVP / NDC conventions
# ---------------------------------------------------------------------------

class TestMvpConvention:
    def test_view_ndc(self):
        """Our mvp_transform must realize the reference's DX row-vector
        convention p_view = p_h @ V, p_ndc = (p_view @ P) / w
        (litegs/data.py:13, transform.cu:378-438)."""
        rng = np.random.RandomState(6)
        n = 127
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        view[3, :3] = rng.randn(3).astype(np.float32)
        proj = um.get_project_matrix(0.01, 100.0, 1.2, 1.6)
        xyz = rng.randn(3, n).astype(np.float32) * 3
        xyz_h = np.concatenate([xyz, np.ones((1, n), np.float32)])

        pv_ref = (xyz_h.T @ view).T
        hom = (pv_ref.T @ proj).T
        w = hom[3]
        ndc_ref = hom / np.where(np.abs(w) > 1e-12, w, np.inf)
        ndc_ref[3] = 1.0

        view_pos, ndc = projection.mvp_transform(
            jnp.asarray(xyz_h), jnp.asarray(view), jnp.asarray(proj))
        np.testing.assert_allclose(np.asarray(view_pos), pv_ref, atol=1e-4)
        keep = np.abs(w) > 1e-3
        np.testing.assert_allclose(np.asarray(ndc)[:, keep],
                                   ndc_ref[:, keep], atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# binning: exact speedy-splat tile sets
# ---------------------------------------------------------------------------

def _ellipse_intersection(a, b, c, disc, t, px, py, is_y, coord):
    """Transcription of computeEllipseIntersection (speedy_splat.cuh:16-31)."""
    if is_y:
        p_u, p_v, coeff = py, px, a
    else:
        p_u, p_v, coeff = px, py, c
    h = coord - p_u
    s = math.sqrt(max(disc * h * h + t * coeff, 0.0))
    return ((-b * h - s) / coeff + p_v, (-b * h + s) / coeff + p_v)


def _process_tiles(a, b, c, disc, t, px, py, bbox_min, bbox_max,
                   bbox_argmin, bbox_argmax, rect_min, rect_max,
                   tiles_x, tile_h, tile_w, is_y):
    """Transcription of processTiles (speedy_splat.cuh:33-149).

    bbox_* are (x, y) pairs; rect_* are (x, y) integer tile pairs.
    Returns the set of emitted tile ids (row-major y * tiles_x + x).
    """
    block_u = tile_h if is_y else tile_w
    block_v = tile_w if is_y else tile_h
    if is_y:
        rect_min = (rect_min[1], rect_min[0])
        rect_max = (rect_max[1], rect_max[0])
        bbox_min = (bbox_min[1], bbox_min[0])
        bbox_max = (bbox_max[1], bbox_max[0])
        bbox_argmin = (bbox_argmin[1], bbox_argmin[0])
        bbox_argmax = (bbox_argmax[1], bbox_argmax[0])

    tiles = set()
    isect_max = (bbox_max[1], bbox_min[1])
    min_line = rect_min[0] * block_u
    if bbox_min[0] <= min_line:
        isect_min = _ellipse_intersection(a, b, c, disc, t, px, py, is_y,
                                          min_line)
    else:
        isect_min = isect_max
    for u in range(rect_min[0], rect_max[0]):
        max_line = min_line + block_u
        if max_line <= bbox_max[0]:
            isect_max = _ellipse_intersection(a, b, c, disc, t, px, py,
                                              is_y, max_line)
        if min_line <= bbox_argmin[1] < max_line:
            emin = bbox_min[1]
        else:
            emin = min(isect_min[0], isect_max[0])
        if min_line <= bbox_argmax[1] < max_line:
            emax = bbox_max[1]
        else:
            emax = max(isect_min[1], isect_max[1])
        min_v = max(rect_min[1], min(rect_max[1], int(emin / block_v)))
        max_v = min(rect_max[1], max(rect_min[1], int(emax / block_v + 1)))
        for v in range(min_v, max_v):
            tiles.add(u * tiles_x + v if is_y else v * tiles_x + u)
        isect_min = isect_max
        min_line = max_line
    return tiles


def _reference_tile_set(ndc, z, inv3, opacity, img_h, img_w,
                        tile_h, tile_w, t_scale=1.0):
    """Per-point exact tile sets via the get_allocate_size_kernel semantics
    (binning.cu:289-385); t_scale perturbs the threshold for the
    boundary-tolerant set comparison."""
    tiles_x = math.ceil(img_w / tile_w)
    tiles_y = math.ceil(img_h / tile_h)
    m = ndc.shape[1]
    out = []
    for i in range(m):
        a, b, c = float(inv3[0, i]), float(inv3[1, i]), float(inv3[2, i])
        op = float(opacity[i])
        nx, ny = float(ndc[0, i]), float(ndc[1, i])
        disc = b * b - a * c
        visible = not (nx < -1.3 or nx > 1.3 or ny < -1.3 or ny > 1.3
                       or z[i] <= 0.2 or op < 1.0 / 255)
        visible = visible and a > 0 and c > 0 and disc < 0
        if not visible:
            out.append(set())
            continue
        px = (nx * 0.5 + 0.5) * img_w - 0.5
        py = (ny * 0.5 + 0.5) * img_h - 0.5
        t = 2.0 * math.log(op * 255.0) * t_scale
        x_term = math.sqrt(-(b * b * t) / (disc * a)) if a != 0 else 0.0
        x_term = x_term if b < 0 else -x_term
        y_term = math.sqrt(-(b * b * t) / (disc * c)) if c != 0 else 0.0
        y_term = y_term if b < 0 else -y_term
        argmin = (py - y_term, px - x_term)   # (y@xmin, x@ymin)
        argmax = (py + y_term, px + x_term)
        bbox_min = (
            _ellipse_intersection(a, b, c, disc, t, px, py, True,
                                  argmin[0])[0],
            _ellipse_intersection(a, b, c, disc, t, px, py, False,
                                  argmin[1])[0])
        bbox_max = (
            _ellipse_intersection(a, b, c, disc, t, px, py, True,
                                  argmax[0])[1],
            _ellipse_intersection(a, b, c, disc, t, px, py, False,
                                  argmax[1])[1])
        rect_min = (max(0, min(tiles_x, int(bbox_min[0] / tile_w))),
                    max(0, min(tiles_y, int(bbox_min[1] / tile_h))))
        rect_max = (
            max(0, min(tiles_x, int((bbox_max[0] + tile_w - 1) / tile_w))),
            max(0, min(tiles_y, int((bbox_max[1] + tile_h - 1) / tile_h))))
        y_span = rect_max[1] - rect_min[1]
        x_span = rect_max[0] - rect_min[0]
        if y_span * x_span <= 0:
            out.append(set())
            continue
        is_y = y_span < x_span
        # argmin/argmax keep the CUDA field order (y@xmin, x@ymin) --
        # NOT an (x, y) pair like bbox_min (binning.cu:330-332)
        args = (a, b, c, disc, t, px, py, bbox_min, bbox_max,
                argmin, argmax,
                rect_min, rect_max, tiles_x, tile_h, tile_w)
        tiles = _process_tiles(*args, is_y)
        # direction independence: the exact convex-region walk must give
        # identical sets along either axis (binning.cu:361 picks by span)
        assert tiles == _process_tiles(*args, not is_y), \
            f"direction-dependent tile set for point {i}"
        out.append(tiles)
    return out


def _make_binning_inputs(rng, m, img_h, img_w):
    ndc = np.zeros((4, m), np.float32)
    ndc[0] = rng.uniform(-1.25, 1.25, m)
    ndc[1] = rng.uniform(-1.25, 1.25, m)
    ndc[3] = 1.0
    z = rng.uniform(0.3, 8.0, m).astype(np.float32)
    opacity = rng.uniform(0.02, 0.98, m).astype(np.float32)
    inv3 = np.zeros((3, m), np.float32)
    for i in range(m):
        ang = rng.uniform(0, np.pi)
        s1, s2 = rng.uniform(1.0, 12.0, 2)
        r = np.array([[np.cos(ang), -np.sin(ang)],
                      [np.sin(ang), np.cos(ang)]])
        cov = r @ np.diag([s1 ** 2, s2 ** 2]) @ r.T
        inv = np.linalg.inv(cov)
        inv3[:, i] = [inv[0, 0], inv[0, 1], inv[1, 1]]
    return ndc, z, opacity, inv3


class TestBinningParity:
    def test_exact_tile_sets(self):
        rng = np.random.RandomState(7)
        img_h, img_w, tile_h, tile_w = 64, 96, 8, 16
        m = 160
        ndc, z, opacity, inv3 = _make_binning_inputs(rng, m, img_h, img_w)

        table = binning_ops.build_tile_table(
            jnp.asarray(ndc), jnp.asarray(z), jnp.asarray(inv3),
            jnp.asarray(opacity), jnp.ones(m, bool),
            img_h, img_w, tile_h, tile_w,
            row_capacity=8192, entry_capacity=16384)
        assert not bool(table.overflow)
        ours = [set() for _ in range(m)]
        sp = np.asarray(table.sorted_point)
        st = np.asarray(table.sorted_tile)
        ev = np.asarray(table.entry_valid)
        for p, t, v in zip(sp, st, ev):
            if v:
                ours[p].add(int(t))

        # boundary-tolerant two-sided containment: the f32 pipeline may
        # disagree with the f64 oracle only where a tile boundary grazes
        # the ellipse; shrinking/growing t brackets those cases
        ref_lo = _reference_tile_set(ndc, z, inv3, opacity, img_h, img_w,
                                     tile_h, tile_w, t_scale=1.0 - 1e-3)
        ref_hi = _reference_tile_set(ndc, z, inv3, opacity, img_h, img_w,
                                     tile_h, tile_w, t_scale=1.0 + 1e-3)
        exact = _reference_tile_set(ndc, z, inv3, opacity, img_h, img_w,
                                    tile_h, tile_w)
        n_exact = 0
        for i in range(m):
            assert ref_lo[i] <= ours[i] <= ref_hi[i], (
                f"point {i}: ours={sorted(ours[i])} "
                f"ref=[{sorted(ref_lo[i])}, {sorted(ref_hi[i])}]")
            n_exact += ours[i] == exact[i]
        # the overwhelming majority must match the oracle bit-for-bit
        assert n_exact >= m * 0.95, f"only {n_exact}/{m} exact matches"

    def test_conservative_aabb_superset(self):
        """The reference *script* path bins by eigen-decomposed AABB
        (wrapper.py:659-676) -- a superset of the exact tile set.  Our
        exact sets must be contained in that AABB."""
        rng = np.random.RandomState(8)
        img_h, img_w, tile_h, tile_w = 64, 96, 16, 16
        m = 120
        ndc, z, opacity, inv3 = _make_binning_inputs(rng, m, img_h, img_w)
        tiles_x = math.ceil(img_w / tile_w)

        table = binning_ops.build_tile_table(
            jnp.asarray(ndc), jnp.asarray(z), jnp.asarray(inv3),
            jnp.asarray(opacity), jnp.ones(m, bool),
            img_h, img_w, tile_h, tile_w,
            row_capacity=8192, entry_capacity=16384)
        sp = np.asarray(table.sorted_point)
        st = np.asarray(table.sorted_tile)
        ev = np.asarray(table.entry_valid)

        # reference AABB (craete_2d_AABB, wrapper.py:659-676) from the
        # eigendecomposition of cov2d = inv(inv_cov)
        for i in range(m):
            if z[i] <= 0.2:
                continue
            inv = np.array([[inv3[0, i], inv3[1, i]],
                            [inv3[1, i], inv3[2, i]]], np.float64)
            cov = np.linalg.inv(inv)
            eval_, evec = np.linalg.eigh(cov)
            opc = max(opacity[i], 1 / 255)
            coeff = 2 * np.log(255 * opc)
            axis_len = np.sqrt(coeff * np.abs(eval_))
            # extension = |eigvec @ diag(axis)| row-abs-sum
            ext = np.abs(evec * axis_len[None, :]).sum(axis=1)
            px = (ndc[0, i] * 0.5 + 0.5) * img_w - 0.5
            py = (ndc[1, i] * 0.5 + 0.5) * img_h - 0.5
            lo_x = max(0, int((px - ext[0]) // tile_w))
            lo_y = max(0, int((py - ext[1]) // tile_h))
            hi_x = int(np.ceil((px + ext[0]) / tile_w))
            hi_y = int(np.ceil((py + ext[1]) / tile_h))
            mine = {int(t) for p, t, v in zip(sp, st, ev) if v and p == i}
            for t in mine:
                tx, ty = t % tiles_x, t // tiles_x
                assert lo_x - 1 <= tx <= hi_x + 1
                assert lo_y - 1 <= ty <= hi_y + 1


# ---------------------------------------------------------------------------
# blend semantics: tiny-scene forward + pixel gradients (BASELINE config 1)
# ---------------------------------------------------------------------------

def _torch_blend_oracle(mean_pix, inv3, color, opacity, order, tile_sets,
                        img_h, img_w, tile_h, tile_w):
    """Torch transcription of raster_forward_kernel semantics
    (raster.cu:237-284): front-to-back alpha blending per pixel, alpha =
    op * exp(-0.5 q), skip alpha < 1/256, clamp alpha <= 255/256
    straight-through (the CUDA backward differentiates the unclamped
    product, raster.cu:776-778), freeze once T <= 1/8192.

    Differentiable wrt (mean_pix, inv3, color, opacity).  Vectorized over
    pixels; sequential over gaussians (tiny scenes only).
    """
    ys, xs = torch.meshgrid(torch.arange(img_h, dtype=torch.float32),
                            torch.arange(img_w, dtype=torch.float32),
                            indexing="ij")
    tiles_x = math.ceil(img_w / tile_w)
    tile_of_pixel = ((ys / tile_h).int() * tiles_x + (xs / tile_w).int())
    img = torch.zeros(3, img_h, img_w)
    t_cur = torch.ones(img_h, img_w)
    for gi in order:
        tiles = tile_sets[gi]
        if not tiles:
            continue
        in_tile = torch.zeros(img_h, img_w, dtype=torch.bool)
        for t in tiles:
            mask = tile_of_pixel == t
            in_tile |= mask
        dx = xs - mean_pix[0, gi]
        dy = ys - mean_pix[1, gi]
        q = (inv3[0, gi] * dx * dx + 2 * inv3[1, gi] * dx * dy
             + inv3[2, gi] * dy * dy)
        alpha = opacity[gi] * torch.exp(-0.5 * q)
        ok = (alpha >= 1.0 / 256) & in_tile & (t_cur > 1.0 / 8192).detach()
        alpha_c = alpha + (torch.clamp(alpha, max=255.0 / 256)
                           - alpha).detach()
        alpha_eff = torch.where(ok, alpha_c, torch.zeros(()))
        w = alpha_eff * t_cur
        img = img + color[:, gi, None, None] * w[None]
        t_cur = t_cur * (1 - alpha_eff)
    return img, t_cur


class TestBlendParity:
    def test_tiny_scene_forward_and_pixel_grads(self):
        rng = np.random.RandomState(9)
        img_h, img_w, tile_h, tile_w = 32, 48, 8, 16
        tiles_x = math.ceil(img_w / tile_w)
        tiles_total = (img_h // tile_h) * tiles_x
        m = 48
        ndc, z, opacity, inv3 = _make_binning_inputs(rng, m, img_h, img_w)
        ndc[0] = rng.uniform(-0.95, 0.95, m)
        ndc[1] = rng.uniform(-0.95, 0.95, m)
        color = rng.rand(3, m).astype(np.float32)
        mean_pix = np.stack([(ndc[0] * 0.5 + 0.5) * img_w - 0.5,
                             (ndc[1] * 0.5 + 0.5) * img_h - 0.5])

        table = binning_ops.build_tile_table(
            jnp.asarray(ndc), jnp.asarray(z), jnp.asarray(inv3),
            jnp.asarray(opacity), jnp.ones(m, bool),
            img_h, img_w, tile_h, tile_w,
            row_capacity=4096, entry_capacity=8192)
        assert not bool(table.overflow)

        w_img = rng.randn(3, img_h, img_w).astype(np.float32)
        w_t = rng.randn(img_h, img_w).astype(np.float32)

        def loss_ours(mp, ic, col, op):
            out = raster_jnp.rasterize_reference(
                mp, ic, col, op, table.sorted_point, table.sorted_tile,
                table.entry_valid, table.tile_start, tiles_total, tiles_x,
                tile_h, tile_w)
            img = um.tiles_to_img(out.tiles_color, img_h, img_w,
                                  tile_h, tile_w)
            t_img = um.tiles_to_img(out.tiles_trans[:, None], img_h, img_w,
                                    tile_h, tile_w)[0]
            return (jnp.sum(img * jnp.asarray(w_img))
                    + jnp.sum(t_img * jnp.asarray(w_t)),
                    (img, t_img))

        (loss_j, (img_j, t_j)), grads_j = jax.value_and_grad(
            loss_ours, argnums=(0, 1, 2, 3), has_aux=True)(
            jnp.asarray(mean_pix), jnp.asarray(inv3), jnp.asarray(color),
            jnp.asarray(opacity))

        # torch oracle: same depth order + tile sets as the CUDA pipeline
        order = np.argsort(z, kind="stable")
        tile_sets = _reference_tile_set(ndc, z, inv3, opacity, img_h, img_w,
                                        tile_h, tile_w)
        mp_t = t32(mean_pix).requires_grad_(True)
        ic_t = t32(inv3).requires_grad_(True)
        col_t = t32(color).requires_grad_(True)
        op_t = t32(opacity).requires_grad_(True)
        img_t, t_fin = _torch_blend_oracle(
            mp_t, ic_t, col_t, op_t, order, tile_sets,
            img_h, img_w, tile_h, tile_w)
        loss_t = ((img_t * t32(w_img)).sum() + (t_fin * t32(w_t)).sum())
        loss_t.backward()

        np.testing.assert_allclose(np.asarray(img_j),
                                   img_t.detach().numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(t_j), t_fin.detach().numpy(),
                                   atol=2e-4, rtol=1e-3)
        for g_j, g_t, name in zip(
                grads_j, (mp_t, ic_t, col_t, op_t),
                ("mean_pix", "inv_cov", "color", "opacity")):
            np.testing.assert_allclose(
                np.asarray(g_j), g_t.grad.numpy(), atol=5e-2, rtol=2e-2,
                err_msg=f"gradient mismatch: {name}")


# ---------------------------------------------------------------------------
# Morton codes (spatial resort)
# ---------------------------------------------------------------------------

class TestMortonCodes:
    def test_codes_match_reference_at_10_bits(self):
        """morton.morton_codes must be BIT-EXACT against the reference's
        _gen_morton_code (point.py:27-75) at the same quantization depth.
        (The shipped depth differs -- 10-bit int32 keys vs the reference's
        21-bit int64, a documented TPU sort-width Delta -- but the
        interleave and normalization must agree exactly.)"""
        import pytest
        if REF.get("point") is None:
            pytest.skip("reference litegs.scene.point not importable")
        from litegs_tpu.scene import morton
        rng = np.random.default_rng(17)
        xyz = (rng.standard_normal((3, 700)) *
               np.array([[3.0], [0.5], [40.0]])).astype(np.float32)
        ref_codes = np.asarray(
            REF["point"]._gen_morton_code(t32(xyz), bits=10))
        got = np.asarray(morton.morton_codes(jnp.asarray(xyz)))
        assert (got.astype(np.int64) == ref_codes).all()

    def test_sorted_order_groups_spatially(self):
        """Morton order must place points of the same spatial cell in one
        contiguous run (the property chunk coherence relies on,
        point.py:86-154)."""
        from litegs_tpu.scene import morton
        rng = np.random.default_rng(3)
        # 8 well-separated cluster centers, 32 points each
        centers = rng.standard_normal((3, 8)) * 100.0
        pts = (centers[:, np.repeat(np.arange(8), 32)]
               + 0.01 * rng.standard_normal((3, 256))).astype(np.float32)
        idx = np.asarray(morton.spatial_sort_indices(jnp.asarray(pts)))
        cluster_of = np.repeat(np.arange(8), 32)[idx]
        # each cluster occupies one contiguous block after the sort
        changes = int((np.diff(cluster_of) != 0).sum())
        assert changes == 7, cluster_of


# ---------------------------------------------------------------------------
# lr scheduler (log-lerp xyz schedule)
# ---------------------------------------------------------------------------

class TestLrSchedule:
    def test_xyz_log_lerp_matches_reference(self):
        """training.optimizer.xyz_lr must match the reference Scheduler
        (optimizer.py:46-71) with the spatial_lr_scale wiring of
        get_optimizer (optimizer.py:79,91-93)."""
        import pytest
        if REF.get("opt") is None:
            pytest.skip("reference litegs.training.optimizer not importable")
        from litegs_tpu import config as cfg_mod
        from litegs_tpu.training.optimizer import xyz_lr
        op = cfg_mod.OptimizationParams()
        sls = 3.7
        # construct without torch._LRScheduler.__init__ (its inspect-based
        # override check chokes on the stubbed binary modules); the
        # schedule math lives entirely in the private __helper
        sched = REF["opt"].Scheduler.__new__(REF["opt"].Scheduler)
        sched.max_epochs = op.position_lr_max_steps
        sched.lr_init = op.position_lr_init * sls
        sched.lr_final = op.position_lr_final * sls
        for step in (0, 1, 100, 5000, op.position_lr_max_steps,
                     op.position_lr_max_steps + 999):
            sched.last_epoch = step
            want = sched._Scheduler__helper()
            got = float(xyz_lr(op, sls, jnp.int32(step)))
            np.testing.assert_allclose(got, want, rtol=1e-6), step
