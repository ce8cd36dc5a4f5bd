"""Slab-local sharded raycast: zero per-trip collectives.

Round-4 census finding (SCALING.md §2): letting GSPMD partition the
model raycast over the x-sharded volume turns EVERY march trip's
nearest-neighbor gather into an image-sized masked-gather all-reduce —
~20–45 MB/frame, the communication bound once the solver round shrank to
<1 MB.

The TPU-native fix exploits that x(t) along a ray is MONOTONIC: each ray
crosses each volume x-slab in one contiguous t-interval with a closed
form. So each device marches ONLY the segment of every ray inside its
own slab (plus a static ±HALO of neighbor x-planes, exchanged once per
raycast with two collective-permutes, covering the bracket/refine reach
of ≤ 2 march steps), detects/refines crossings locally via the SAME
``tsdf_ops.march_and_refine`` core as the single-device path, and ONE
(pmin + psum) round resolves ownership and assembles the maps:

- per raycast on the wire: 2 × HALO·D² i16 permutes (~2.1 MB each at
  256³) + a ~0.4 MB psum of (t, found, point, normal) images — instead
  of ~20–45 MB of per-trip all-reduces;
- the march work itself is PARTITIONED by slab (each device marches
  ~1/n of every ray) instead of replicated.

Ownership: the device whose slab contains a bracket's START sample owns
the crossing; brackets spanning a boundary are covered because the next
sample reaches at most 2 march steps (≤ 15.4 voxels < HALO) into the
halo. Near-boundary crossings can be detected by both neighbors (their
brackets differ, so the refined t differs): the global pmin of refined t
picks one, and a secondary pmin on device id breaks exact-tie double
counting.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models.volume import TsdfVolume
from dynamicfusion_tpu.ops import tsdf as tsdf_ops

def _halo_planes(cfg: DynamicFusionConfig) -> int:
    """x-planes of neighbor halo each side: the march/refine reach is at
    most 2 march steps (adaptive doubling) plus one interpolation cell."""
    step = volume_model.trunc_dist(cfg) * cfg.raycast_step_factor
    return int(math.ceil(2.0 * step / cfg.voxel_size)) + 2


def _slab_samplers(ext: jnp.ndarray, x_off: int, d: int):
    """fetch/interp/interp_grad over an extended slab ``ext``
    ((dx_ext, D, D), stored dtype) whose first plane is GLOBAL x-plane
    ``x_off``. Out-of-ext fetches clamp into the ext (their values are
    only ever consumed by rays outside this device's responsibility
    window, which are masked by the march's t-interval)."""
    dx = ext.shape[0]
    flat = ext.reshape(-1)
    scale = volume_model.tsdf_decode_scale(ext.dtype)

    def clampx(i):
        return jnp.clip(i - x_off, 0, dx - 1)

    def fetch_nearest(p_voxels):
        idx = jnp.clip(jnp.round(p_voxels).astype(jnp.int32), 0, d - 1)
        fi = (clampx(idx[..., 0]) * d + idx[..., 1]) * d + idx[..., 2]
        return jnp.take(flat, fi).astype(jnp.float32) * scale

    def _corners(p_voxels):
        g = jnp.floor(p_voxels)
        gi = g.astype(jnp.int32)
        f = p_voxels - g
        oob = (
            (gi[..., 0] < 0) | (gi[..., 0] >= d - 1)
            | (gi[..., 1] < 0) | (gi[..., 1] >= d - 1)
            | (gi[..., 2] < 0) | (gi[..., 2] >= d - 1)
        )
        # clamp GLOBALLY first (like tsdf_ops.interpolate): a negative
        # global x must clamp to plane 0, not wrap into the halo
        gi = jnp.clip(gi, 0, d - 2)
        x0 = clampx(gi[..., 0])
        x1 = clampx(gi[..., 0] + 1)
        cor = {}
        for dxb in (0, 1):
            xb = x0 if dxb == 0 else x1
            for dy in (0, 1):
                for dz in (0, 1):
                    fi = (xb * d + gi[..., 1] + dy) * d + gi[..., 2] + dz
                    cor[(dxb, dy, dz)] = (
                        jnp.take(flat, fi).astype(jnp.float32) * scale
                    )
        return cor, f, oob

    def interpolate(p_voxels):
        cor, f, oob = _corners(p_voxels)
        a, b, c = f[..., 0], f[..., 1], f[..., 2]
        out = 0.0
        for dxb in (0, 1):
            wx = a if dxb else 1.0 - a
            for dy in (0, 1):
                wy = b if dy else 1.0 - b
                for dz in (0, 1):
                    wz = c if dz else 1.0 - c
                    out = out + cor[(dxb, dy, dz)] * (wx * wy * wz)
        return jnp.where(oob, jnp.nan, out)

    def interpolate_with_gradient(p_voxels):
        cor, f, oob = _corners(p_voxels)
        a, b, c = f[..., 0], f[..., 1], f[..., 2]
        wa0, wa1 = 1.0 - a, a
        wb0, wb1 = 1.0 - b, b
        wc0, wc1 = 1.0 - c, c
        val = (
            wa0 * (wb0 * (wc0 * cor[0, 0, 0] + wc1 * cor[0, 0, 1])
                   + wb1 * (wc0 * cor[0, 1, 0] + wc1 * cor[0, 1, 1]))
            + wa1 * (wb0 * (wc0 * cor[1, 0, 0] + wc1 * cor[1, 0, 1])
                     + wb1 * (wc0 * cor[1, 1, 0] + wc1 * cor[1, 1, 1]))
        )
        gx = (
            wb0 * (wc0 * (cor[1, 0, 0] - cor[0, 0, 0]) + wc1 * (cor[1, 0, 1] - cor[0, 0, 1]))
            + wb1 * (wc0 * (cor[1, 1, 0] - cor[0, 1, 0]) + wc1 * (cor[1, 1, 1] - cor[0, 1, 1]))
        )
        gy = (
            wa0 * (wc0 * (cor[0, 1, 0] - cor[0, 0, 0]) + wc1 * (cor[0, 1, 1] - cor[0, 0, 1]))
            + wa1 * (wc0 * (cor[1, 1, 0] - cor[1, 0, 0]) + wc1 * (cor[1, 1, 1] - cor[1, 0, 1]))
        )
        gz = (
            wa0 * (wb0 * (cor[0, 0, 1] - cor[0, 0, 0]) + wb1 * (cor[0, 1, 1] - cor[0, 1, 0]))
            + wa1 * (wb0 * (cor[1, 0, 1] - cor[1, 0, 0]) + wb1 * (cor[1, 1, 1] - cor[1, 1, 0]))
        )
        nanv = jnp.where(oob, jnp.nan, 0.0)
        grad = jnp.stack([gx, gy, gz], axis=-1)
        return val + nanv, grad + nanv[..., None]

    return fetch_nearest, interpolate, interpolate_with_gradient


def make_sharded_raycast(cfg: DynamicFusionConfig, mesh: Mesh, axis: str = "d"):
    """Returns ``raycast_fn`` with tsdf_ops.raycast's signature, running
    the slab-local scheme over the mesh. Requires volume x-shards of at
    least HALO planes (d_loc >= HALO)."""
    n = mesh.shape[axis]
    d = cfg.volume_dims
    d_loc = d // n
    halo = _halo_planes(cfg)
    assert d % n == 0 and d_loc >= halo, (d, n, halo)
    vs = cfg.voxel_size

    def raycast_fn(
        cfg_,
        vol: TsdfVolume,
        cam2vol: jnp.ndarray,
        intr: Intrinsics,
        rows: int,
        cols: int,
        t_seed=None,
        t_band=None,
    ):
        assert cfg_ is cfg or cfg_ == cfg

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None, None), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def rc(tsdf_loc, cam2vol_, lo, hi):
            dev = jax.lax.axis_index(axis)
            # ±HALO neighbor planes, one collective-permute each way
            # (edge shards receive wrapped planes, never read: the
            # global [0, d-1] clamp keeps their indices inside their
            # own slab)
            fwd = [(i, (i - 1) % n) for i in range(n)]
            bwd = [(i, (i + 1) % n) for i in range(n)]
            nxt = jax.lax.ppermute(tsdf_loc[:halo], axis, fwd)
            prv = jax.lax.ppermute(tsdf_loc[-halo:], axis, bwd)
            ext = jnp.concatenate([prv, tsdf_loc, nxt], axis=0)
            x_off = dev * d_loc - halo

            trunc = volume_model.trunc_dist(cfg)
            step = trunc * cfg.raycast_step_factor
            vol_size = vs * d

            r_cv = cam2vol_[:3, :3]
            ray_org = cam2vol_[:3, 3]
            u = jnp.arange(cols, dtype=jnp.float32)[None, :] * jnp.ones(
                (rows, 1), jnp.float32
            )
            v = jnp.arange(rows, dtype=jnp.float32)[:, None] * jnp.ones(
                (1, cols), jnp.float32
            )
            dirs = jnp.stack(
                [(u - intr.cx) / intr.fx, (v - intr.cy) / intr.fy,
                 jnp.ones_like(u)], axis=-1,
            )
            dirs = jnp.matmul(dirs, r_cv.T, precision=jax.lax.Precision.HIGHEST)
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
            )

            box_max = jnp.full((3,), vol_size - vs, jnp.float32)
            tmin, tmax = tsdf_ops._ray_box(ray_org, dirs, box_max)
            tmin = jnp.maximum(tmin, 0.0)
            tmax = tmax - step
            tmin = jnp.maximum(tmin, lo)
            tmax = jnp.minimum(tmax, hi)

            # ray ∩ slab responsibility interval: bracket-START samples
            # with x(t) in [sx0, sx1) belong to this device. x(t) =
            # ox + dx t (meters; slab bounds in meters).
            sx0 = (dev * d_loc) * vs
            sx1 = (dev * d_loc + d_loc) * vs
            ox, dx = ray_org[0], dirs[..., 0]
            dxs = jnp.where(jnp.abs(dx) > 1e-9, dx, 1e-9)
            ta = (sx0 - ox) / dxs
            tb = (sx1 - ox) / dxs
            t_in = jnp.minimum(ta, tb)
            t_out = jnp.maximum(ta, tb)
            # near-axial rays: inside iff ox in the slab
            axial = jnp.abs(dx) <= 1e-9
            inside0 = (ox >= sx0) & (ox < sx1)
            t_in = jnp.where(axial, jnp.where(inside0, tmin, jnp.inf), t_in)
            t_out = jnp.where(axial, jnp.where(inside0, tmax, -jnp.inf), t_out)

            # GLOBAL-GRID snap + FIXED stepping: every device samples
            # t in {tmin + k*step}, so the union of all slab marches is
            # exactly a single-device fixed-step march — no phase
            # divergence across slab boundaries (adaptive doubling is
            # history-dependent and cannot be segmented)
            tmin_l = jnp.maximum(tmin, t_in)
            k0 = jnp.ceil(jnp.maximum(tmin_l - tmin, 0.0) / step - 1e-4)
            tmin_l = tmin + k0 * step
            tmax_l = jnp.minimum(tmax, t_out)

            samplers = _slab_samplers(ext, x_off, d)
            found, ts, vertex, normal, t_behind = tsdf_ops.march_and_refine(
                cfg, samplers, ray_org, dirs, tmin_l, tmax_l, vol_size,
                adaptive_double=False,
            )

            # ownership: global min refined t among finders; device-id
            # pmin breaks exact-value ties. A ray whose FIRST event is
            # exiting geometry (behind: the single-device march would
            # stop and miss) must not report a later slab's crossing —
            # compare against the global first-behind time.
            t_cand = jnp.where(found & jnp.isfinite(ts), ts, jnp.inf)
            t_min = jax.lax.pmin(t_cand, axis)
            behind_min = jax.lax.pmin(jnp.nan_to_num(t_behind, nan=jnp.inf), axis)
            at_min = found & (t_cand == t_min) & (t_min <= behind_min)
            owner = jax.lax.pmin(
                jnp.where(at_min, dev, n).astype(jnp.int32), axis
            )
            mine = at_min & (owner == dev)

            nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
            normal_n = normal / jnp.maximum(nn, 1e-12)
            ok = mine & ~jnp.isnan(normal_n).any(axis=-1) & (nn[..., 0] > 1e-12)
            hi_p = jax.lax.Precision.HIGHEST
            r_vc = r_cv.T
            vertex_cam = jnp.matmul(vertex - ray_org, r_vc.T, precision=hi_p)
            normal_cam = jnp.matmul(normal_n, r_vc.T, precision=hi_p)
            pts = jnp.where(ok[..., None], jnp.nan_to_num(vertex_cam), 0.0)
            nrm = jnp.where(ok[..., None], jnp.nan_to_num(normal_cam), 0.0)
            okf = ok.astype(jnp.float32)
            pts, nrm, okn = jax.lax.psum((pts, nrm, okf), axis)
            hit = okn > 0.5
            return (
                jnp.where(hit[..., None], pts, jnp.nan),
                jnp.where(hit[..., None], nrm, jnp.nan),
            )

        if t_band is not None:
            lo, hi = t_band
            lo = jnp.nan_to_num(lo)
            hi = jnp.nan_to_num(hi)
            if cfg.raycast_band_cap > 0.0:
                hi = jnp.minimum(hi, lo + cfg.raycast_band_cap)
        else:
            lo = jnp.zeros((rows, cols), jnp.float32)
            hi = jnp.full((rows, cols), jnp.inf)
            if t_seed is not None:
                m = cfg.raycast_seed_margin
                seeded = t_seed > 0.0
                ts0 = jnp.nan_to_num(t_seed)
                lo = jnp.where(seeded, jnp.maximum(ts0 - m, 0.0), lo)
                hi = jnp.where(seeded, ts0 + m, hi)

        pts, nrm = rc(vol.tsdf, cam2vol, lo, hi)
        return tsdf_ops.RaycastResult(points=pts, normals=nrm)

    return raycast_fn
