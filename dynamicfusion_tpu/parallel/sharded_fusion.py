"""Communication-free sharded non-rigid fusion: per-shard brick lists.

Round-3 census finding (scripts/collective_bytes.py at the full bench
shape): letting GSPMD partition the brick-sparse integrate costs ~205 MB
of all-reduce per fused frame — ``jnp.take(brick_rows, band_ids)`` with
GLOBAL brick ids over the x-sharded volume makes the partitioner
replicate whole volumes (134 + 67 MB all-reduces), dwarfing the solver's
151 MB Schur round.

The TPU-native design is that brick work is embarrassingly parallel over
the volume's x-shards: each device classifies and fuses ONLY its own
slab's bricks. The inputs a brick needs beyond its own voxels are tiny
and replicated — the dists image (0.6 MB), the DQB-warped coarse corner
grid ((D/s+1)^3 x 3 ~ 0.4 MB) and its blend-quality channel — so the
shard_map body communicates NOTHING. A bonus: each shard holds only
(D/n)/B brick-planes, so the FRONT and BAND per-shard caps are the full
local brick count — those classes never drop. The WIDE fallback path
(footprint larger than the lookup window; pays cap*B^3 unconditional
random gathers, so it cannot be sized at the full local count for free)
keeps a per-shard cap of max(nbr_loc // 8, 16); any truncation is
reported exactly in the returned counts' third element (dropped), same
contract as bricks.integrate_bricks.

The per-frame fusion gate (fusion_interval / icp_ok) is applied INSIDE
via a masked update rather than wrapping the shard_map in lax.cond: a
shard_map under lax.cond makes the XLA-CPU SPMD partitioner take >30 min
(CLAUDE.md); the masked skip-frame waste is ~integrate/n_devices.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.models.volume import TsdfVolume
from dynamicfusion_tpu.ops import bricks, fusion


def _to_bricks_rect(vol: jnp.ndarray, b: int) -> jnp.ndarray:
    """bricks.to_bricks for a non-cubic (dx, dy, dz) slab; brick id =
    ((bi*nby)+bj)*nbz+bk, matching _corner_indices_slab's local ids."""
    dx, dy, dz = vol.shape
    return (
        vol.reshape(dx // b, b, dy // b, b, dz // b, b)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, b * b * b)
    )


def _from_bricks_rect(rows: jnp.ndarray, dx: int, dy: int, dz: int, b: int) -> jnp.ndarray:
    return (
        rows.reshape(dx // b, dy // b, dz // b, b, b, b)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(dx, dy, dz)
    )


def _corner_indices_slab(
    slab_gx: int, gyz: int, b: int, g: int, local_ids: jnp.ndarray, nb_loc: int, nb: int
) -> jnp.ndarray:
    """Flat indices into the LOCAL (slab_gx, gyz, gyz) coarse-corner slab of
    each local brick's (B/g+1)^3 grid points (the slab analogue of
    bricks._corner_indices; local brick id = ((bi_loc*nb)+bj)*nb+bk)."""
    w = b // g
    bi = local_ids // (nb * nb)
    bj = (local_ids // nb) % nb
    bk = local_ids % nb
    a = jnp.arange(w + 1)
    ii = bi[:, None] * w + a[None, :]
    jj = bj[:, None] * w + a[None, :]
    kk = bk[:, None] * w + a[None, :]
    return (
        (ii[:, :, None, None] * gyz + jj[:, None, :, None]) * gyz
        + kk[:, None, None, :]
    ).reshape(local_ids.shape[0], -1)


def make_sharded_integrate(
    cfg: DynamicFusionConfig, mesh: Mesh, axis: str = "d"
):
    """Returns ``integrate_fn(cfg, vol, field, dists, world2cam, intr,
    with_counts, dq_grid, q_grid, enabled)`` matching kinfu.step's
    integrate hook: the DQB coarse-grid warp runs replicated (node-space,
    tiny), then every device fuses its own volume slab's bricks with zero
    collectives. ``enabled`` masks the whole update (fusion interval /
    ICP-health gate)."""
    n = mesh.shape[axis]
    d = cfg.volume_dims
    b = cfg.brick_size
    g = cfg.knn_field_stride
    assert d % n == 0 and (d // n) % b == 0, (
        "volume x-shards must be whole brick planes"
    )
    d_loc = d // n
    nb = d // b
    nb_loc = d_loc // b
    nbr_loc = nb_loc * nb * nb
    bv = b ** 3
    w = b // g
    gyz = d // g + 1
    slab_gx = nb_loc * w + 1

    intr = cfg.intr  # static for the shard_map body (kinfu passes cfg.intr)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(), P(), P(), P(), P()),
        out_specs=(P(axis, None, None), P(axis, None, None), P()),
    )
    def _integrate(tsdf_loc, w_loc, dists, lookup_img, cam_grid, enabled, phase):
        rows, cols = dists.shape
        rect = min(cfg.integrate_rect, 1 << int(math.log2(min(rows, cols))))

        dev = jax.lax.axis_index(axis)
        # local coarse-corner slab from the replicated warped grid (+1
        # overlap row: boundary bricks share corners with the next shard)
        slab = jax.lax.dynamic_slice(
            cam_grid,
            (dev * nb_loc * w, 0, 0, 0),
            (slab_gx, gyz, gyz, cam_grid.shape[-1]),
        )

        levels = int(math.ceil(math.log2(max(rows, cols)))) + 1
        pyr = bricks.build_depth_pyramid(dists, levels)
        bc = bricks.classify(
            cfg, slab[..., :3], g, pyr, intr, rows, cols, rect
        )
        cls = bc.cls
        if cfg.fusion_phase_split > 1:
            # same brick-x-plane phase semantics as bricks.integrate_bricks
            # (GLOBAL x index: shard offset + local plane)
            bx = dev * nb_loc + jnp.arange(nbr_loc, dtype=jnp.int32) // (nb * nb)
            cls = jnp.where(
                (bx % cfg.fusion_phase_split) == phase, cls, bricks.SKIP
            )

        # front/band caps = ALL local bricks: those classes never drop;
        # the wide fallback keeps a cap (see module docstring) with exact
        # truncation reporting below
        wide_cap = max(nbr_loc // 8, 16)
        (front_ids,) = jnp.nonzero(cls == bricks.FRONT, size=nbr_loc, fill_value=nbr_loc)
        (band_ids,) = jnp.nonzero(cls == bricks.BAND, size=nbr_loc, fill_value=nbr_loc)
        (wide_ids,) = jnp.nonzero(cls == bricks.WIDE, size=wide_cap, fill_value=nbr_loc)

        tb = _to_bricks_rect(tsdf_loc, b)
        wb = _to_bricks_rect(w_loc, b)
        slab_flat = slab.reshape(-1, slab.shape[-1])
        lookup_flat = lookup_img.reshape(-1)

        # lookup_img is the raw dists, or pack_depth_conf(dists, conf)
        # when the incidence weight is on (static via cfg)
        def depth_conf(v):
            if not cfg.fusion_incidence_weight:
                return v, 1.0
            return bricks.unpack_depth_conf(v)

        # ---- front bricks ----
        ft = jnp.take(tb, jnp.minimum(front_ids, nbr_loc - 1), axis=0)
        fw = jnp.take(wb, jnp.minimum(front_ids, nbr_loc - 1), axis=0)
        new_ft, new_fw = bricks._fuse_front_rows(cfg, ft, fw)
        tb = tb.at[front_ids].set(new_ft, mode="drop")
        wb = wb.at[front_ids].set(new_fw, mode="drop")

        def fuse(ids_raw, lookup):
            ids = jnp.minimum(ids_raw, nbr_loc - 1)
            corner_idx = _corner_indices_slab(slab_gx, gyz, b, g, ids, nb_loc, nb)
            ptsq = bricks._voxel_positions(slab_flat, corner_idx, b, g)
            pts = ptsq[..., :3]
            qv = ptsq[..., 3] if slab.shape[-1] > 3 else None
            ui, vi, inb, rdist = bricks._project(pts, intr, rows, cols)
            (dp, ow), inw = lookup(ids, ui, vi, inb)
            bt = jnp.take(tb, ids, axis=0)
            bw = jnp.take(wb, ids, axis=0)
            return bricks._fuse_rows(cfg, bt, bw, dp, rdist, inb & inw, qv, ow)

        # ---- band bricks: windowed matmul depth lookup ----
        def band_lookup(ids, ui, vi, inb):
            u0 = jnp.take(bc.u0, ids)
            v0 = jnp.take(bc.v0, ids)
            ri = jnp.clip(vi - v0[:, None], 0, rect - 1)
            ci = jnp.clip(ui - u0[:, None], 0, rect - 1)
            inw = (vi - v0[:, None] == ri) & (ui - u0[:, None] == ci)
            dp = bricks._rect_lookup(lookup_img, u0, v0, ri, ci, rect)
            return depth_conf(dp), inw

        new_bt, new_bw = fuse(band_ids, band_lookup)
        tb = tb.at[band_ids].set(new_bt, mode="drop")
        wb = wb.at[band_ids].set(new_bw, mode="drop")

        # ---- wide bricks: direct gather ----
        def wide_lookup(ids, ui, vi, inb):
            flat = jax.lax.optimization_barrier(vi * cols + ui)
            v = jnp.take(lookup_flat, flat)
            return depth_conf(jax.lax.optimization_barrier(v)), jnp.ones_like(inb)

        new_wt, new_ww = fuse(wide_ids, wide_lookup)
        tb = tb.at[wide_ids].set(new_wt, mode="drop")
        wb = wb.at[wide_ids].set(new_ww, mode="drop")

        new_tsdf = _from_bricks_rect(tb, d_loc, d, d, b)
        new_w = _from_bricks_rect(wb, d_loc, d, d, b)
        # fusion gate (interval / ICP health): masked, not lax.cond — see
        # module docstring
        new_tsdf = jnp.where(enabled, new_tsdf, tsdf_loc)
        new_w = jnp.where(enabled, new_w, w_loc)
        n_wide_loc = jnp.sum(cls == bricks.WIDE)
        counts = jax.lax.psum(
            jnp.stack([
                jnp.sum(cls == bricks.BAND),
                n_wide_loc,
                jnp.maximum(n_wide_loc - wide_cap, 0),
            ]).astype(jnp.int32) * enabled.astype(jnp.int32),
            axis,
        )
        return new_tsdf, new_w, counts

    def integrate_fn(
        cfg_, vol, field, dists, world2cam, intr_, with_counts=False,
        dq_grid=None, q_grid=None, enabled=None, conf=None, phase=None,
    ):
        assert intr_ == intr, "sharded integrate is specialized to cfg.intr"
        assert (conf is not None) == cfg.fusion_incidence_weight
        lookup_img = (
            bricks.pack_depth_conf(dists, conf) if conf is not None else dists
        )
        use_q = cfg_.fusion_quality_weight
        if use_q and (dq_grid is None or q_grid is None):
            dq_grid, q_grid = fusion.coarse_field(cfg_, field)
        warped = fusion.warp_coarse_grid(cfg_, field, dq_grid)
        r = world2cam[:3, :3]
        t = world2cam[:3, 3]
        cam_grid = (
            jnp.dot(warped, r.T, precision=jax.lax.Precision.HIGHEST) + t
        )
        if use_q:
            cam_grid = jnp.concatenate([cam_grid, q_grid[..., None]], axis=-1)
        if enabled is None:
            enabled = jnp.array(True)
        if phase is None:
            phase = jnp.zeros((), jnp.int32)
        new_tsdf, new_w, counts = _integrate(
            vol.tsdf, vol.weight, dists, lookup_img, cam_grid, enabled,
            jnp.asarray(phase, jnp.int32),
        )
        out = TsdfVolume(new_tsdf, new_w)
        if with_counts:
            return out, counts
        return out

    return integrate_fn
