"""Brick-sparse TSDF integration: skip/front/band classification per brick.

The dense projective integrate (ops/tsdf.py, ops/fusion.py) pays one random
image gather per voxel — 16.7M gathers at 256^3 ≈ 145 ms on TPU v5e, the
single largest cost in the frame. But the depth image only constrains a
thin band around the observed surface:

- **skip** bricks (behind the surface band, outside the frustum, or with no
  valid depth in their footprint) receive no update at all;
- **front** bricks (entirely in observed free space) receive the constant
  update tsdf_obs = 1, weight+1 — no per-voxel depth value needed;
- only **band** bricks (straddling the truncation band, or contaminated by
  invalid/edge pixels) need per-voxel depth lookups.

Per-brick classification is conservative, computed from a coarse grid of
camera-frame voxel positions (stride g): the per-voxel positions are the
trilinear prolongation of that grid (exactly the dense path's math — for the
rigid path prolongation of an affine map is exact), so min/max over a
brick's (B/g+1)^3 grid points bound every interior voxel: perspective u, v
are projective-convex for z > 0, z is linear, |p| is convex. Depth min/max
over the projected footprint comes from a conservative min/max image pyramid
(2x2 cells at the covering mip level).

Band bricks resolve their depth lookups without any random gather: each
brick extracts a static RECTxRECT image window with one-hot row/column
matmuls and looks up per-voxel pixels with separable one-hot matmuls — all
MXU work (measured ~4.5 ms for 1024 bricks vs 33 ms for direct gathers vs
149 ms dense). Bricks whose footprint exceeds the window (very close to the
camera) fall back to direct gathers under a small cap.

Replaces the role of the reference's per-voxel z-column march
(TsdfIntegrator, /root/reference/kfusion/src/cuda/tsdf_volume.cu:51-161),
which hides the same cost in texture-cache locality — the TPU-native
equivalent of that locality is the brick window + MXU lookup.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models.volume import TsdfVolume

_ZEPS = 1e-3  # meters; bricks not strictly in front of the camera -> band


@functools.lru_cache(maxsize=8)
def _brick_perm(nbr: int) -> np.ndarray:
    """Fixed fair permutation of brick ids for cap overflow (see the
    prioritized band selection in integrate_bricks). Numpy (a fresh jnp
    constant per trace — caching device arrays across traces leaks)."""
    return np.random.RandomState(1).permutation(nbr).astype(np.int32)


# --------------------------------------------------------------------------
# brick layout
# --------------------------------------------------------------------------


def to_bricks(vol: jnp.ndarray, b: int) -> jnp.ndarray:
    """(D, D, D) -> (NBR, B^3) brick-major rows (brick id = ((bi*nb)+bj)*nb+bk,
    in-brick offset = ((oi*B)+oj)*B+ok)."""
    d = vol.shape[0]
    nb = d // b
    return (
        vol.reshape(nb, b, nb, b, nb, b)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nb * nb * nb, b * b * b)
    )


def from_bricks(rows: jnp.ndarray, d: int, b: int) -> jnp.ndarray:
    nb = d // b
    return (
        rows.reshape(nb, nb, nb, b, b, b)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(d, d, d)
    )


# --------------------------------------------------------------------------
# conservative depth min/max pyramid
# --------------------------------------------------------------------------


class DepthPyramid(NamedTuple):
    dmin: jnp.ndarray     # (T,) concatenated levels; +inf where no valid depth
    dmax: jnp.ndarray     # (T,) -inf where no valid depth
    allvalid: jnp.ndarray  # (T,) float 1.0 iff every covered pixel valid
    offsets: Tuple[int, ...]  # static per-level start index
    widths: Tuple[int, ...]   # static per-level row width (ceil)
    levels: int


def build_depth_pyramid(dists: jnp.ndarray, levels: int) -> DepthPyramid:
    """Min/max/all-valid mip pyramid of the dists image (0 = invalid).
    Level l has cells of 2^l pixels; out-of-image area is neutral
    (+inf/-inf/invalid)."""
    valid = dists > 0.0
    dmin = jnp.where(valid, dists, jnp.inf)
    dmax = jnp.where(valid, dists, -jnp.inf)
    av = valid.astype(jnp.float32)

    mins, maxs, avs, offsets, widths = [], [], [], [], []
    off = 0
    for l in range(levels):
        h, w = dmin.shape
        offsets.append(off)
        widths.append(w)
        mins.append(dmin.reshape(-1))
        maxs.append(dmax.reshape(-1))
        avs.append(av.reshape(-1))
        off += h * w
        if l + 1 < levels:
            ph, pw = (-h) % 2, (-w) % 2
            dmin = jax.lax.reduce_window(
                jnp.pad(dmin, ((0, ph), (0, pw)), constant_values=jnp.inf),
                jnp.inf, jax.lax.min, (2, 2), (2, 2), "VALID")
            dmax = jax.lax.reduce_window(
                jnp.pad(dmax, ((0, ph), (0, pw)), constant_values=-jnp.inf),
                -jnp.inf, jax.lax.max, (2, 2), (2, 2), "VALID")
            av = jax.lax.reduce_window(
                jnp.pad(av, ((0, ph), (0, pw)), constant_values=0.0),
                1.0, jax.lax.min, (2, 2), (2, 2), "VALID")
    return DepthPyramid(
        dmin=jnp.concatenate(mins),
        dmax=jnp.concatenate(maxs),
        allvalid=jnp.concatenate(avs),
        offsets=tuple(offsets),
        widths=tuple(widths),
        levels=levels,
    )


def query_rect(
    pyr: DepthPyramid,
    u0: jnp.ndarray,
    u1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    ncells: int = 4,
):
    """Conservative (dmin, dmax, allvalid) over pixel rect [u0,u1]x[v0,v1]
    (inclusive float bounds, assumed clipped to the image). Uses up to
    ncells x ncells cells at the finest mip level whose cells cover the rect,
    masking cells past the rect edge — the covered area overshoots the rect
    by at most one cell per side (cell <= ext/(ncells-1)), so classification
    stays tight: a looser 2x2 query at the covering level over-covers ~2.2x
    per axis and mis-classes most free-space bricks as band."""
    ext = jnp.maximum(u1 - u0, v1 - v0)
    l = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(ext, 1.0) / (ncells - 1))).astype(jnp.int32),
        0,
        pyr.levels - 1,
    )
    cell = jnp.exp2(l.astype(jnp.float32))
    offs = jnp.take(jnp.asarray(pyr.offsets, jnp.int32), l)
    wids = jnp.take(jnp.asarray(pyr.widths, jnp.int32), l)
    i0 = jnp.floor(u0 / cell).astype(jnp.int32)
    j0 = jnp.floor(v0 / cell).astype(jnp.int32)
    i1 = jnp.floor(u1 / cell).astype(jnp.int32)
    j1 = jnp.floor(v1 / cell).astype(jnp.int32)

    n = pyr.dmin.shape[0]
    dmin = jnp.full(u0.shape, jnp.inf)
    dmax = jnp.full(u0.shape, -jnp.inf)
    av = jnp.ones(u0.shape, jnp.float32)
    for dj in range(ncells):
        for di in range(ncells):
            keep = ((i0 + di) <= i1) & ((j0 + dj) <= j1)
            flat = jnp.clip(offs + (j0 + dj) * wids + (i0 + di), 0, n - 1)
            dmin = jnp.minimum(
                dmin, jnp.where(keep, jnp.take(pyr.dmin, flat), jnp.inf)
            )
            dmax = jnp.maximum(
                dmax, jnp.where(keep, jnp.take(pyr.dmax, flat), -jnp.inf)
            )
            av = jnp.minimum(
                av, jnp.where(keep, jnp.take(pyr.allvalid, flat), 1.0)
            )
    return dmin, dmax, av


# --------------------------------------------------------------------------
# classification
# --------------------------------------------------------------------------


SKIP, FRONT, BAND, WIDE = 0, 1, 2, 3


class BrickClasses(NamedTuple):
    cls: jnp.ndarray   # (NBR,) int32
    u0: jnp.ndarray    # (NBR,) int32 rect origin col (band bricks)
    v0: jnp.ndarray    # (NBR,) int32 rect origin row
    # band-brick priority: the brick's depth range intersects its ray-
    # distance range (it may STRADDLE the surface). Non-surf band bricks
    # are free space contaminated by invalid pixels (under sensor noise
    # the all-valid FRONT test almost never passes, so free space floods
    # the band class); when the band cap overflows, these are the ones
    # to drop — see integrate_bricks.
    surf: jnp.ndarray  # (NBR,) bool


def classify(
    cfg: DynamicFusionConfig,
    cam_grid: jnp.ndarray,  # (G, G, G, 3) camera-frame grid points at voxel stride g
    g: int,
    pyr: DepthPyramid,
    intr: Intrinsics,
    rows: int,
    cols: int,
    rect: int,
) -> BrickClasses:
    b = cfg.brick_size
    trunc = volume_model.trunc_dist(cfg)
    w = b // g  # grid points per brick per axis (window w+1, stride w)

    x, y, z = cam_grid[..., 0], cam_grid[..., 1], cam_grid[..., 2]
    zok = z > _ZEPS
    zs = jnp.where(zok, z, 1.0)
    u = x * intr.fx / zs + intr.cx
    v = y * intr.fy / zs + intr.cy
    u_lo = jnp.where(zok, u, jnp.inf)
    u_hi = jnp.where(zok, u, -jnp.inf)
    v_lo = jnp.where(zok, v, jnp.inf)
    v_hi = jnp.where(zok, v, -jnp.inf)
    r = jnp.sqrt(x * x + y * y + z * z)

    def bmin(a):
        return jax.lax.reduce_window(
            a, jnp.inf, jax.lax.min, (w + 1,) * 3, (w,) * 3, "VALID"
        ).reshape(-1)

    def bmax(a):
        return jax.lax.reduce_window(
            a, -jnp.inf, jax.lax.max, (w + 1,) * 3, (w,) * 3, "VALID"
        ).reshape(-1)

    umin, umax = bmin(u_lo), bmax(u_hi)
    vmin, vmax = bmin(v_lo), bmax(v_hi)
    zmin, zmax = bmin(z), bmax(z)
    rmax = bmax(r)
    # lower bound on |p| over the brick: distance from the camera to the
    # AABB of its grid points (interior voxels are convex combinations of
    # the grid points, hence inside the AABB). Much tighter than zmin at
    # the frustum periphery, where |p| can exceed z by >20%.
    xmin, xmax = bmin(x), bmax(x)
    ymin, ymax = bmin(y), bmax(y)
    dx = jnp.maximum(jnp.maximum(xmin, -xmax), 0.0)
    dy = jnp.maximum(jnp.maximum(ymin, -ymax), 0.0)
    dz = jnp.maximum(jnp.maximum(zmin, -zmax), 0.0)
    rmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)

    zfront = zmin > _ZEPS  # all grid points strictly in front: bounds valid

    # clipped footprint for the depth query
    cu0 = jnp.clip(umin, 0.0, cols - 1.0)
    cu1 = jnp.clip(umax, 0.0, cols - 1.0)
    cv0 = jnp.clip(vmin, 0.0, rows - 1.0)
    cv1 = jnp.clip(vmax, 0.0, rows - 1.0)
    dminv, dmaxv, allvalid = query_rect(pyr, cu0, cu1, cv0, cv1)

    visible = (
        (zmax > _ZEPS)
        & (umax >= 0.0) & (umin <= cols - 1.0)
        & (vmax >= 0.0) & (vmin <= rows - 1.0)
    )
    # no voxel can satisfy psdf >= -trunc (dp <= dmaxv, ray dist >= rmin)
    no_band = dmaxv < rmin - trunc
    inside = (umin >= 0.0) & (umax <= cols - 1.0) & (vmin >= 0.0) & (vmax <= rows - 1.0)
    is_front = inside & (allvalid > 0.5) & (dminv > rmax + trunc) & zfront
    narrow = ((umax - umin) <= rect - 2) & ((vmax - vmin) <= rect - 2) & zfront

    cls = jnp.where(
        ~visible | (zfront & no_band),
        SKIP,
        jnp.where(is_front, FRONT, jnp.where(narrow, BAND, WIDE)),
    )

    u0 = jnp.clip(jnp.floor(umin).astype(jnp.int32), 0, max(cols - rect, 0))
    v0 = jnp.clip(jnp.floor(vmin).astype(jnp.int32), 0, max(rows - rect, 0))
    # surface proximity: the observed depth range over the footprint
    # intersects the brick's ray-distance range (+- truncation)
    surf = (dmaxv + trunc >= rmin) & (dminv - trunc <= rmax)
    return BrickClasses(cls=cls, u0=u0, v0=v0, surf=surf)


# --------------------------------------------------------------------------
# the sparse integrate core
# --------------------------------------------------------------------------


def _prolong_weights(b: int, g: int) -> jnp.ndarray:
    """(B, B/g + 1) trilinear prolongation weights from a brick's grid points
    to its fine voxels (matches ops/fusion._prolong_matrix restricted to one
    brick)."""
    o = jnp.arange(b)
    c = o // g
    f = (o % g).astype(jnp.float32) / g
    w = jnp.zeros((b, b // g + 1), jnp.float32)
    w = w.at[o, c].set(1.0 - f)
    w = w.at[o, c + 1].add(f)
    return w


def _corner_indices(d: int, b: int, g: int, brick_ids: jnp.ndarray) -> jnp.ndarray:
    """Flat indices into the (G^3,) coarse grid of each brick's
    (B/g+1)^3 grid points. brick_ids (K,) -> (K, (B/g+1)^3)."""
    nb = d // b
    gpts = d // g + 1
    w = b // g
    bi = brick_ids // (nb * nb)
    bj = (brick_ids // nb) % nb
    bk = brick_ids % nb
    a = jnp.arange(w + 1)
    ii = bi[:, None] * w + a[None, :]
    jj = bj[:, None] * w + a[None, :]
    kk = bk[:, None] * w + a[None, :]
    return (
        (ii[:, :, None, None] * gpts + jj[:, None, :, None]) * gpts
        + kk[:, None, None, :]
    ).reshape(brick_ids.shape[0], -1)


def _voxel_positions(
    cam_flat: jnp.ndarray,  # (G^3, CH) — 3 position channels (+ optional extras)
    corner_idx: jnp.ndarray,  # (K, C^3)
    b: int,
    g: int,
) -> jnp.ndarray:
    """Per-voxel camera positions (and any extra channels, e.g. the blend
    quality) of K bricks by trilinear prolongation of their grid-point
    values: (K, B^3, CH)."""
    c = b // g + 1
    k = corner_idx.shape[0]
    ch = cam_flat.shape[-1]
    pts = jnp.take(cam_flat, jnp.maximum(corner_idx, 0), axis=0).reshape(k, c, c, c, ch)
    w = _prolong_weights(b, g)  # (B, C)
    # HIGHEST: these einsums produce metric voxel positions; the TPU default
    # (bf16 passes) injects ~1e-2 relative error => ~1 cm position noise,
    # which lands voxels on the wrong depth pixel (measured: 1M corrupted
    # voxels/frame at 256^3 and a diverging warp solve).
    hi = jax.lax.Precision.HIGHEST
    f = jnp.einsum("ia,nabcd->nibcd", w, pts, precision=hi)
    f = jnp.einsum("jb,nibcd->nijcd", w, f, precision=hi)
    f = jnp.einsum("kc,nijcd->nijkd", w, f, precision=hi)
    return f.reshape(k, b * b * b, ch)


PACK_DP = 4000.0   # 0.25 mm depth quantization in the packed image
PACK_C = 16.0      # confidence levels


def pack_depth_conf(dists: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """Pack (depth meters, confidence [0,1]) into ONE f32 whose values are
    exact integers <= 2^23, so the one-hot matmul window lookups
    (_rect_lookup) fetch BOTH per pixel at no extra cost:
    v = round(d * 4000) * 16 + round(c * 15). Depth quantization
    +-0.125 mm (0.3% of the truncation band); 16 confidence levels.
    Invalid pixels (d == 0) pack to v == 0 (conf is forced 0 there)."""
    dq = jnp.round(dists * PACK_DP)
    cq = jnp.round(jnp.clip(jnp.nan_to_num(conf), 0.0, 1.0) * (PACK_C - 1.0))
    return jnp.where(dists > 0.0, dq * PACK_C + cq, 0.0)


def unpack_depth_conf(v: jnp.ndarray):
    dq = jnp.floor(v / PACK_C)
    c = (v - dq * PACK_C) / (PACK_C - 1.0)
    return dq / PACK_DP, c


def incidence_weight_scale(cfg: DynamicFusionConfig, conf):
    """(observation weight, stored-SDF scale) from the RAW per-pixel
    |cos incidence| (0 = invalid). Weight: max(cos, floor) for observed
    pixels (cfg.fusion_incidence_floor keeps grazing-only surface
    accumulating extraction evidence). Scale: the projective-SDF
    correction (cfg.fusion_sdf_incidence_scale docstring) — psdf is an
    along-ray distance; scaling the STORED observation by |cos| (clamped
    at 0.25) stores a true-distance estimate without changing which
    voxels update."""
    if conf is None:
        return 1.0, 1.0
    w = jnp.where(conf > 0.0, jnp.maximum(conf, cfg.fusion_incidence_floor), 0.0)
    if cfg.fusion_sdf_incidence_scale:
        scale = jnp.where(conf > 0.0, jnp.clip(conf, 0.25, 1.0), 1.0)
    else:
        scale = 1.0
    return w, scale


def _fuse_rows(
    cfg: DynamicFusionConfig,
    tsdf_rows: jnp.ndarray,   # (K, BV)
    w_rows: jnp.ndarray,      # (K, BV)
    dp: jnp.ndarray,          # (K, BV) depth at each voxel's pixel
    rdist: jnp.ndarray,       # (K, BV) voxel ray distance |p|
    inb: jnp.ndarray,         # (K, BV) in-image & z>0
    q: jnp.ndarray | None = None,  # (K, BV) observation weight (blend quality)
    conf: jnp.ndarray | None = None,  # (K, BV) raw |cos incidence| (0 invalid)
):
    trunc = volume_model.trunc_dist(cfg)
    psdf = dp - rdist
    update = inb & (dp != 0.0) & (psdf >= -trunc)
    if q is None:
        q = 1.0
    else:
        # voxels essentially unsupported by the warp field carry a garbage
        # DQB blend — do not fuse through it (paper weight, fusion.py doc)
        update = update & (q > cfg.fusion_quality_min)
    obs_w, sdf_scale = incidence_weight_scale(cfg, conf)
    q = q * obs_w
    tsdf_obs = jnp.minimum(1.0, psdf * sdf_scale / trunc)
    t32 = volume_model.decode_tsdf(tsdf_rows)
    w32 = volume_model.decode_weight(w_rows)
    fused = (t32 * w32 + tsdf_obs * q) / jnp.maximum(w32 + q, 1e-12)
    new_t = volume_model.encode_tsdf(
        jnp.where(update & (w32 + q > 1e-12), fused, t32), tsdf_rows.dtype
    )
    new_w = volume_model.encode_weight(
        jnp.where(update, jnp.minimum(w32 + q, float(cfg.tsdf_max_weight)), w32),
        w_rows.dtype,
    )
    return new_t, new_w


def _fuse_front_rows(cfg: DynamicFusionConfig, ft: jnp.ndarray, fw: jnp.ndarray):
    """Front (free-space) brick fuse: constant tsdf_obs = 1, weight + 1
    (shared by integrate_bricks and parallel.sharded_fusion)."""
    t32 = volume_model.decode_tsdf(ft)
    w32 = volume_model.decode_weight(fw)
    new_ft = volume_model.encode_tsdf((t32 * w32 + 1.0) / (w32 + 1.0), ft.dtype)
    new_fw = volume_model.encode_weight(
        jnp.minimum(w32 + 1.0, float(cfg.tsdf_max_weight)), fw.dtype
    )
    return new_ft, new_fw


def _project(cam_pts: jnp.ndarray, intr: Intrinsics, rows: int, cols: int):
    """(..., 3) camera points -> (u_idx, v_idx, inb, rdist)."""
    x, y, z = cam_pts[..., 0], cam_pts[..., 1], cam_pts[..., 2]
    zs = jnp.where(z > 0, z, 1.0)
    u = x * intr.fx / zs + intr.cx
    v = y * intr.fy / zs + intr.cy
    inb = (z > 0) & (u >= 0) & (v >= 0) & (u < cols) & (v < rows)
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, cols - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, rows - 1)
    rdist = jnp.sqrt(x * x + y * y + z * z)
    return ui, vi, inb, rdist


def _rect_lookup(
    dists: jnp.ndarray,   # (H, W)
    u0: jnp.ndarray,      # (K,) rect origins
    v0: jnp.ndarray,
    ri: jnp.ndarray,      # (K, BV) in-rect row index
    ci: jnp.ndarray,      # (K, BV) in-rect col index
    rect: int,
    chunk: int = 64,
) -> jnp.ndarray:
    """Gather-free depth lookup: one-hot matmul window extraction + separable
    one-hot voxel selection (all MXU; see module docstring).

    REJECTED alternative (measured, do not revisit without profiling): a
    row-gather window extraction + 3-way bf16-split one-hot matmuls looks
    ~10x cheaper on paper (no (rect, H) @ (H, W) full-image matmul), but
    measured 38 -> 60 ms on the integrate phase at bench shape — the v5e
    runs these one-hot matmuls near MXU rate, while the 2D-index
    row gather + tripled dot count + (BV, rect) f32 intermediates lose on
    bandwidth.

    REJECTED (round 5, measured): int8 BYTE-PLANE window matmuls (bitcast
    the f32 image into 4 int8 planes, transport bytes with s32-accumulate
    one-hot dots — exact for any payload). The byte planes QUADRUPLE the
    MAC count, which cancels the int8 MXU rate advantage exactly: the
    band-lookup while-loop measured 10.1 -> 14.2 ms/step device time on
    the rigid trace. The six-pass f32-HIGHEST dot moves 32 bits per MAC;
    int8 planes move 8 — byte-planing only wins where the payload is
    genuinely narrow."""
    h, w = dists.shape
    k, bv = ri.shape

    pad = (-k) % chunk
    v0p = jnp.pad(v0, (0, pad))
    u0p = jnp.pad(u0, (0, pad))
    rip = jnp.pad(ri, ((0, pad), (0, 0)))
    cip = jnp.pad(ci, ((0, pad), (0, 0)))
    n = (k + pad) // chunk
    dp = jax.lax.map(
        lambda t: _rect_window_chunk(dists, t[0], t[1], t[2], t[3], rect),
        (
            v0p.reshape(n, chunk),
            u0p.reshape(n, chunk),
            rip.reshape(n, chunk, bv),
            cip.reshape(n, chunk, bv),
        ),
    )
    return dp.reshape(-1, bv)[:k]


def _rect_window_chunk(
    dists: jnp.ndarray,  # (H, W)
    v0: jnp.ndarray,     # (C,) rect origins of one brick chunk
    u0: jnp.ndarray,
    ri: jnp.ndarray,     # (C, BV)
    ci: jnp.ndarray,
    rect: int,
) -> jnp.ndarray:
    """One chunk of the one-hot window depth lookup (vmapped per-brick
    selection; see _rect_lookup). Also the body of integrate_bricks'
    count-proportional band while-loop."""
    h, w = dists.shape
    bv = ri.shape[-1]

    hi = jax.lax.Precision.HIGHEST  # exact one-hot selection of f32 depths

    def per_brick(v0i, u0i, rii, cii):
        rows_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (rect, h), 1)
            == (v0i + jax.lax.broadcasted_iota(jnp.int32, (rect, h), 0))
        ).astype(jnp.float32)
        rect_rows = jnp.dot(
            rows_oh, dists, preferred_element_type=jnp.float32, precision=hi
        )
        cols_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (w, rect), 0)
            == (u0i + jax.lax.broadcasted_iota(jnp.int32, (w, rect), 1))
        ).astype(jnp.float32)
        rct = jnp.dot(
            rect_rows, cols_oh, preferred_element_type=jnp.float32, precision=hi
        )
        row_sel = (
            jax.lax.broadcasted_iota(jnp.int32, (bv, rect), 1) == rii[:, None]
        ).astype(jnp.float32)
        col_sel = (
            jax.lax.broadcasted_iota(jnp.int32, (bv, rect), 1) == cii[:, None]
        ).astype(jnp.float32)
        t = jnp.dot(row_sel, rct, preferred_element_type=jnp.float32, precision=hi)
        return jnp.sum(t * col_sel, axis=-1)

    return jax.vmap(per_brick)(v0, u0, ri, ci)


def integrate_bricks(
    cfg: DynamicFusionConfig,
    vol: TsdfVolume,
    dists: jnp.ndarray,
    cam_grid: jnp.ndarray,  # (G, G, G, 3) camera-frame voxel-grid points at stride g
    g: int,
    intr: Intrinsics,
    with_counts: bool = False,
    q_grid: jnp.ndarray | None = None,
    conf: jnp.ndarray | None = None,
    phase: jnp.ndarray | int | None = None,
    split: int = 1,
):
    """Brick-sparse projective TSDF fusion. ``cam_grid`` holds camera-frame
    positions of the voxel grid at stride ``g`` (g = brick_size for the rigid
    path — affine prolongation is exact; g = knn_field_stride for the
    DQB-warped path). Semantically equivalent to the dense integrate /
    integrate_nonrigid up to brick caps (overflowing bricks keep their old
    values for one frame). With ``with_counts`` also returns a (3,) int32
    array of (band, wide, dropped) where ``dropped`` is the exact number of
    bricks past the static caps whose update was skipped this frame — so
    callers detect overflow directly instead of comparing against caps.

    ``q_grid``: optional (G, G, G) per-grid-point observation weight (DQB
    blend quality, fusion.coarse_field) prolonged to voxels alongside the
    positions; band/wide voxels fuse with weight q and skip q below
    cfg.fusion_quality_min. Front (free-space) bricks keep unit weight:
    carving away stale geometry is exactly what low-quality regions need,
    and free space has no meaningful blend quality.

    ``conf``: optional (H, W) per-pixel observation confidence in [0, 1]
    (e.g. |cos| of viewing incidence). Fetched through the SAME window
    lookups as the depth by packing both into one exact-integer f32 image
    (pack_depth_conf) — no extra matmul cost; scales each band/wide
    observation's weight (front free-space carving stays unit-weight)."""
    d = cfg.volume_dims
    b = cfg.brick_size
    nbr = (d // b) ** 3
    bv = b ** 3
    rows, cols = dists.shape
    rect = min(cfg.integrate_rect, 1 << int(math.log2(min(rows, cols))))

    levels = int(math.ceil(math.log2(max(rows, cols)))) + 1
    pyr = build_depth_pyramid(dists, levels)
    bc = classify(cfg, cam_grid, g, pyr, intr, rows, cols, rect)
    cls = bc.cls
    if split > 1:
        # phase-split (cfg.fusion_phase_split): only bricks whose x-plane
        # index is in this phase participate — bricks outside the phase
        # classify as SKIP, so the caps (and with them the STATIC
        # processing cost, which follows the cap) divide by `split`
        nb_x = d // b
        bx = jnp.arange(nbr, dtype=jnp.int32) // (nb_x * nb_x)
        cls = jnp.where((bx % split) == phase, cls, SKIP)

    # Per-phase caps divide by `split` — that division IS the latency win
    # (static processing cost follows the cap). Bricks are NOT guaranteed
    # to distribute evenly across x-plane phases: a phase holding more than
    # cap/split bricks drops the excess (stale for one interval) even when
    # the unsplit integrate at the same caps would have processed them.
    # The drop is never silent — it lands in the exact `dropped` count
    # below (StepOutputs.brick_counts / bench's brick_overflow flag);
    # phase-split deployments must size the caps per phase via
    # brick_counts. tests/test_fusion.py asserts dropped == 0 at a
    # cap-stressed shape.
    band_cap = min(max(cfg.integrate_band_cap // split, 1), nbr)
    wide_cap = min(max(cfg.integrate_wide_cap // split, 1), nbr)

    # fill_value must be positive-out-of-bounds: scatter mode="drop" drops
    # index nbr, while -1 would WRAP (negative indexing) and corrupt the
    # last brick
    (front_ids,) = jnp.nonzero(cls == FRONT, size=nbr, fill_value=nbr)
    # PRIORITIZED band selection (round 5): surface-straddling bricks
    # first, then free-space band bricks in a FIXED fair permutation.
    # Without this, a cap overflow drops bricks from the END of the
    # x-major brick order — measured wiping the +x half of a scene's
    # surface (hinge hold-out: the +x sphere at 0.60 coverage because
    # sensor noise floods the band class with free-space bricks and the
    # cap overflowed at frame 0). Surface bricks are only dropped once
    # THEY alone exceed the cap; dropped free-space bricks merely delay
    # carving and are spatially uniform. The exact `dropped` count below
    # still reports every truncation.
    band = cls == BAND
    (ids_hi,) = jnp.nonzero(band & bc.surf, size=band_cap, fill_value=nbr)
    n_hi = jnp.minimum(jnp.sum(band & bc.surf), band_cap)
    perm = _brick_perm(nbr)
    lo_mask = jnp.take(band & ~bc.surf, perm)
    (ids_lo_p,) = jnp.nonzero(lo_mask, size=band_cap, fill_value=nbr)
    ids_lo = jnp.where(
        ids_lo_p < nbr, jnp.take(perm, jnp.minimum(ids_lo_p, nbr - 1)), nbr
    )
    slot = jnp.arange(band_cap)
    band_ids = jnp.where(
        slot < n_hi,
        ids_hi,
        jnp.take(ids_lo, jnp.clip(slot - n_hi, 0, band_cap - 1)),
    )
    (wide_ids,) = jnp.nonzero(cls == WIDE, size=wide_cap, fill_value=nbr)

    tb = to_bricks(vol.tsdf, b)
    wb = to_bricks(vol.weight, b)
    cam_flat = cam_grid.reshape(-1, 3)
    if q_grid is not None:
        cam_flat = jnp.concatenate([cam_flat, q_grid.reshape(-1, 1)], axis=-1)
    lookup_img = dists if conf is None else pack_depth_conf(dists, conf)
    lookup_flat = lookup_img.reshape(-1)

    def depth_conf(v):
        """(dp, obs_w) from a looked-up value of lookup_img."""
        if conf is None:
            return v, 1.0
        return unpack_depth_conf(v)

    # ---- front bricks: constant free-space observation ----
    ft = jnp.take(tb, jnp.minimum(front_ids, nbr - 1), axis=0)
    fw = jnp.take(wb, jnp.minimum(front_ids, nbr - 1), axis=0)
    new_ft, new_fw = _fuse_front_rows(cfg, ft, fw)
    tb = tb.at[front_ids].set(new_ft, mode="drop")
    wb = wb.at[front_ids].set(new_fw, mode="drop")

    # ---- band bricks: windowed matmul depth lookup ----
    # COUNT-PROPORTIONAL (round 5): this block used to pay its full static
    # CAP every frame — nonzero(size=cap), cap-row prolongation einsums,
    # cap window-matmul chunks, cap-row fuse — regardless of how many band
    # bricks actually exist; at typical clean-scene frames (~650 real band
    # bricks vs cap 2048) ~2/3 of the rigid integrate was phantom work on
    # clamped sentinel rows. The real ids form a PREFIX of band_ids
    # (surface-straddling first, then permuted free-space, sentinel fill
    # after), so a lax.while_loop over 64-brick chunks with the DYNAMIC
    # trip count ceil(n_real/64) runs the whole band pipeline only for
    # chunks that hold real bricks; the cap is now a safety bound, not the
    # per-frame price. Whole-frame A/B (v5e rigid bench): 32.4 -> see
    # round-5 notes.
    if band_cap > 0:
        chunk = 64
        pad_c = (-band_cap) % chunk
        ids_pad = (
            jnp.concatenate([band_ids, jnp.full((pad_c,), nbr, jnp.int32)])
            if pad_c
            else band_ids
        )
        n_real = jnp.sum((band_ids < nbr).astype(jnp.int32))
        n_chunks = (n_real + (chunk - 1)) // chunk

        def band_body(carry):
            i, tb, wb = carry
            ids_c = jax.lax.dynamic_slice(ids_pad, (i * chunk,), (chunk,))
            ids = jnp.minimum(ids_c, nbr - 1)
            corner_idx = _corner_indices(d, b, g, ids)
            ptsq = _voxel_positions(cam_flat, corner_idx, b, g)  # (c, BV, 3[+1])
            pts, qv = ptsq[..., :3], (ptsq[..., 3] if q_grid is not None else None)
            ui, vi, inb, rdist = _project(pts, intr, rows, cols)
            u0 = jnp.take(bc.u0, ids)
            v0 = jnp.take(bc.v0, ids)
            ri = jnp.clip(vi - v0[:, None], 0, rect - 1)
            ci = jnp.clip(ui - u0[:, None], 0, rect - 1)
            # voxels projecting outside the brick's window cannot be inb
            # band voxels (classification bounds every inb voxel into it)
            inw = (vi - v0[:, None] == ri) & (ui - u0[:, None] == ci)
            dp, ow = depth_conf(
                _rect_window_chunk(lookup_img, v0, u0, ri, ci, rect)
            )
            bt = jnp.take(tb, ids, axis=0)
            bw = jnp.take(wb, ids, axis=0)
            new_bt, new_bw = _fuse_rows(cfg, bt, bw, dp, rdist, inb & inw, qv, ow)
            return (
                i + 1,
                tb.at[ids_c].set(new_bt, mode="drop"),
                wb.at[ids_c].set(new_bw, mode="drop"),
            )

        _, tb, wb = jax.lax.while_loop(
            lambda c: c[0] < n_chunks, band_body, (jnp.int32(0), tb, wb)
        )

    # ---- wide bricks (footprint > window, near camera): direct gather ----
    if wide_cap > 0:
        def _wide_update(tb, wb):
            ids = jnp.minimum(wide_ids, nbr - 1)
            corner_idx = _corner_indices(d, b, g, ids)
            ptsq = _voxel_positions(cam_flat, corner_idx, b, g)
            pts, qv = ptsq[..., :3], (ptsq[..., 3] if q_grid is not None else None)
            ui, vi, inb, rdist = _project(pts, intr, rows, cols)
            flat = jax.lax.optimization_barrier(vi * cols + ui)
            v = jnp.take(lookup_flat, flat)
            dp, ow = depth_conf(jax.lax.optimization_barrier(v))
            bt = jnp.take(tb, ids, axis=0)
            bw = jnp.take(wb, ids, axis=0)
            new_bt, new_bw = _fuse_rows(cfg, bt, bw, dp, rdist, inb, qv, ow)
            return (
                tb.at[wide_ids].set(new_bt, mode="drop"),
                wb.at[wide_ids].set(new_bw, mode="drop"),
            )

        # wide bricks only occur with surface very close to the camera
        # (footprint > the rect window); on typical frames there are NONE,
        # yet the cap-sized random gather + fuse ran unconditionally
        # (~4 ms/frame static cost, round-5 rigid trace). lax.cond executes
        # the branch only when wide bricks exist.
        tb, wb = jax.lax.cond(
            jnp.any(cls == WIDE), _wide_update, lambda tb, wb: (tb, wb), tb, wb
        )

    out = TsdfVolume(from_bricks(tb, d, b), from_bricks(wb, d, b))
    if with_counts:
        n_band = jnp.sum(cls == BAND)
        n_wide = jnp.sum(cls == WIDE)
        dropped = jnp.maximum(n_band - band_cap, 0) + jnp.maximum(
            n_wide - wide_cap, 0
        )
        counts = jnp.stack([n_band, n_wide, dropped]).astype(jnp.int32)
        return out, counts
    return out


def brick_counts(
    cfg: DynamicFusionConfig,
    vol_dims: int,
    cam_grid: jnp.ndarray,
    g: int,
    dists: jnp.ndarray,
    intr: Intrinsics,
):
    """Debug/monitoring: per-class brick counts (skip, front, band, wide) —
    use to size integrate_band_cap / integrate_wide_cap for a workload."""
    rows, cols = dists.shape
    rect = min(cfg.integrate_rect, 1 << int(math.log2(min(rows, cols))))
    levels = int(math.ceil(math.log2(max(rows, cols)))) + 1
    pyr = build_depth_pyramid(dists, levels)
    bc = classify(cfg, cam_grid, g, pyr, intr, rows, cols, rect)
    return tuple(jnp.sum(bc.cls == c) for c in (SKIP, FRONT, BAND, WIDE))
