#!/usr/bin/env python3
"""Sustained-pan tracking-drift diagnostic (round-5 open item).

Reproduces and decomposes the camera-pan drift that scripts/
turnover_run.py --episodes 0 exposes (and that round 4 recorded as "the
12-frame orbit is unstable even under secant"):

- default: full rigid pipeline under a yaw pan; prints per-frame pose
  error vs the known orbit ground truth. Measured (v5e, 100 frames,
  1.8 deg/frame): rotation tracks to <0.3 deg while TRANSLATION drifts
  monotonically ~0.6 mm/frame, almost entirely along +z, and does NOT
  unwind when the pan reverses — fusion has baked the biased pose into
  the model (ratchet).
- --freeze: integration disabled after frame 0 (track against the
  frozen frame-0 model). The z-error then stays BOUNDED (2-10 mm,
  oscillating with pan angle) — proving the per-frame bias is small and
  angle-dependent, and the monotonic drift needs the fusion feedback.
- --raycast-bias: no ICP at all; raycasts the frozen frame-0 volume from
  yawed ground-truth poses and measures returned-surface error against
  the analytic scene. Measured: ~0.3-1.1 mm median, plane-z bias up to
  +1.4 mm, NON-monotonic in angle; interior-only masking (8 voxels off
  the volume faces) does not change it — the bias is in the oblique
  march/refine, not boundary clamping, and not the temporal band or
  seeding (all A/B'd equal).

Conclusion recorded in CLAUDE.md: per-frame oblique-raycast bias
(~1 mm class, <0.3 voxel) -> ICP z-offset -> per-frame fusion writes the
shifted surface -> model slides -> ICP follows: a ratchet that
integrates the small bias into unbounded drift on sustained pans. The
open fix is the oblique-incidence refine bias (the same family as the
rejected newton8/hybrid16 grazing bias, much smaller magnitude).

Usage: python scripts/diag_pan.py [--frames 100] [--freeze]
       [--raycast-bias] [--set k=v]
"""

import argparse
import ast
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.ops import tsdf as tsdf_ops
from dynamicfusion_tpu.pipeline import kinfu

CENTER = np.array([0.0, 0.0, 0.95])
R = 0.2
SIDE = [dict(center=(-0.34, 0.0, 1.05), radius=0.1),
        dict(center=(0.34, 0.1, 1.05), radius=0.1)]


def gt_pose(t, n, amp=0.38):
    ang = amp * np.sin(2.0 * np.pi * t / (0.75 * n))
    return synthetic.orbit_pose(ang, target=tuple(CENTER))


def render(cfg, pose):
    return synthetic.scene_depth(
        cfg.intr, cfg.rows, cfg.cols, pose,
        spheres=[dict(center=tuple(CENTER), radius=R)] + SIDE, plane_z=1.35,
    )


def build_cfg(args):
    over = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        over[k] = v
    return dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(),
        max_nodes=640, rigid_only=True, raycast_refine="secant", **over,
    )


def pose_drift(args):
    cfg = build_cfg(args)
    if args.freeze:
        real_integrate = tsdf_ops.integrate
        frozen = [False]

        def gated(cfg_, vol, dists, vol2cam, intr, **kw):
            if frozen[0]:
                if kw.get("with_counts"):
                    return vol, jnp.zeros((3,), jnp.int32)
                return vol
            return real_integrate(cfg_, vol, dists, vol2cam, intr, **kw)

        kinfu.tsdf_ops.integrate = gated
    df = kinfu.DynamicFusion(cfg)
    n = args.frames
    df(jnp.asarray(render(cfg, gt_pose(0, n))))
    if args.freeze:
        frozen[0] = True  # the step path traces AFTER this -> identity fusion
    for t in range(1, n):
        df(jnp.asarray(render(cfg, gt_pose(t, n))))
        if t % 10 == 9 or t < 3:
            est = np.asarray(df.state.pose)
            gt = np.asarray(gt_pose(t, n))
            d_rot = est[:3, :3] @ gt[:3, :3].T
            ang = np.degrees(
                np.arccos(np.clip((np.trace(d_rot) - 1) / 2, -1, 1))
            )
            dt = (est[:3, 3] - gt[:3, 3]) * 1000.0
            print(f"t={t:3d} rot_err={ang:6.3f} deg  dt_xyz={dt} mm", flush=True)


def raycast_bias(args):
    cfg = build_cfg(args)
    df = kinfu.DynamicFusion(cfg)
    df(jnp.asarray(render(cfg, np.eye(4))))
    vol = df.state.vol
    for ang in (0.0, 0.1, 0.2, 0.38):
        pose = jnp.asarray(
            synthetic.orbit_pose(ang, target=tuple(CENTER)), jnp.float32
        )
        (pts, _), _, _ = kinfu._model_maps(
            cfg, vol, df.state.warp, pose, t_seed=None, t_band=None
        )
        p = np.asarray(se3.transform_points(pose, pts[0]).reshape(-1, 3))
        p = p[np.isfinite(p).all(axis=1)]
        errs = [np.abs(np.linalg.norm(p - CENTER, axis=1) - R)]
        for s in SIDE:
            errs.append(
                np.abs(np.linalg.norm(p - np.array(s["center"]), axis=1) - s["radius"])
            )
        errs.append(np.abs(p[:, 2] - 1.35))
        e = np.min(np.stack(errs), axis=0)
        on_plane = np.abs(p[:, 2] - 1.35) < 0.02
        zb = np.mean(p[on_plane, 2] - 1.35) * 1000 if on_plane.any() else float("nan")
        print(
            f"ang={ang:4.2f} n={len(p):6d} med={np.median(e)*1000:6.3f} mm "
            f"p95={np.percentile(e, 95)*1000:6.3f} plane_z_bias={zb:+7.3f} mm",
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--freeze", action="store_true",
                    help="disable integration after frame 0")
    ap.add_argument("--raycast-bias", action="store_true",
                    help="static raycast-vs-analytic bias sweep (no ICP)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    if args.raycast_bias:
        raycast_bias(args)
    else:
        pose_drift(args)


if __name__ == "__main__":
    main()
