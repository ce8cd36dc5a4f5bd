"""Benchmark: full non-rigid DynamicFusion pipeline throughput on TPU.

Runs the complete per-frame pipeline (preprocess -> rigid ICP -> canonical
raycast -> non-rigid GN warp solve -> DQB-warped TSDF fusion -> node
insertion -> model raycast) at the reference workload shape (640x480 depth,
256^3 voxels over 1 m^3, up to 1024 warp nodes, LM3 x direct Cholesky) on a
synthetic deforming scene, and prints ONE JSON line.

Baseline: the reference (mihaibujanca/dynamicfusion) publishes no numbers;
its architecture (full-frame host downloads + per-pixel CPU loops per
frame, kinfu.cpp:353-381) puts it in the seconds-per-frame class — the
driver-characterized ~10 s/frame => 0.1 fps is used as vs_baseline
denominator (see BASELINE.md).

Usage: python bench.py [--frames N] [--small] [--dims D] [--nodes N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"), exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu

REFERENCE_FPS = 0.1  # seconds-per-frame-class reference (BASELINE.md)


def build_cfg(args) -> DynamicFusionConfig:
    if args.small:
        return dataclasses.replace(
            DynamicFusionConfig.small(dims=64, rows=120, cols=160),
            max_nodes=256,
            node_sample_step=7,
            solver_nonlinear_iters=args.solver_iters,
        )
    return dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(),
        volume_dims=args.dims,
        max_nodes=args.nodes,
        solver_nonlinear_iters=args.solver_iters,
        solver_point_stride=args.point_stride,
    )


def frames(cfg, n):
    """Deforming synthetic scene: one large + one oscillating sphere over a
    plane — same workload shape as the umbrella sequence (dense depth,
    smooth non-rigid motion)."""
    out = []
    for t in range(n):
        sp = [
            dict(center=(0.0, 0.0, 0.95), radius=0.22),
            dict(center=(0.2 + 0.008 * np.sin(0.4 * t), 0.1, 0.8), radius=0.1),
        ]
        out.append(
            jnp.asarray(
                synthetic.scene_depth(
                    cfg.intr, cfg.rows, cfg.cols, spheres=sp, plane_z=1.25
                )
            )
        )
    return out


BG_SPHERE = dict(center=(0.32, -0.18, 1.0), radius=0.1)
HINGE = dict(h=np.array([0.0, 0.0, 0.95]), d=0.16, r=0.12)
CONTACT = dict(z=0.92, r=0.11)


def _visible_sphere_samples(center, radius, m=2048, occluders=()):
    """Fibonacci-lattice samples of the camera-VISIBLE part of an analytic
    sphere (camera at the origin looking +z): a sample x is visible iff its
    outward normal faces the camera (dot(x - c, x) < 0) and no occluder
    sphere intersects the ray to it first. Ground-truth support for the
    surface-coverage metric — the reconstructible region, nothing more."""
    c = np.asarray(center, np.float64)
    i = np.arange(m, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    y = 1.0 - 2.0 * (i + 0.5) / m
    rr = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    n = np.stack([rr * np.cos(phi), y, rr * np.sin(phi)], -1)
    x = c + radius * n
    vis = np.sum(n * x, axis=-1) < 0.0
    t_x = np.linalg.norm(x, axis=-1)
    d = x / np.maximum(t_x[:, None], 1e-9)
    for oc in occluders:
        co = np.asarray(oc["center"], np.float64)
        b = -2.0 * (d @ co)
        cc = float(co @ co) - oc["radius"] ** 2
        disc = b * b - 4.0 * cc
        t_oc = np.where(disc >= 0, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, np.inf)
        vis &= ~((t_oc > 0) & (t_oc < t_x - 1e-6))
    # the incidence cosine at the sample = |n . d| (normal vs view ray)
    cos_inc = np.abs(np.sum(n * d, axis=-1))
    return x[vis], cos_inc[vis]


def _coverage(pts, samples, tol):
    """Fraction of ground-truth surface samples with an extracted point
    within `tol` meters (guards quality 'improvements' that work by
    extracting less surface — VERDICT r3 weak #2)."""
    if len(samples) == 0:
        return 1.0
    if len(pts) == 0:
        return 0.0
    hit = np.zeros(len(samples), bool)
    for i in range(0, len(samples), 256):
        s = samples[i : i + 256]
        d2 = np.sum((s[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        hit[i : i + 256] = np.sqrt(d2.min(axis=1)) < tol
    return float(hit.mean())


def _hinge_centers(t):
    """Scissor articulation: two spheres about a hinge, angles +theta and
    pi - theta from +x in the x/y plane — genuinely non-rigid relative
    motion (zero net rotation) for the HELD-OUT quality scene. theta(0)=0:
    the canonical model is the spheres at +-d along x."""
    th = 0.2 * np.sin(0.25 * t)
    h, d = HINGE["h"], HINGE["d"]
    ca = h + d * np.array([np.cos(th), np.sin(th), 0.0])
    cb = h + d * np.array([-np.cos(th), np.sin(th), 0.0])
    return ca, cb


def _contact_centers(t):
    """Two spheres TOUCHING at t=0 (surface distance zero — topology-
    adjacent contact), then separating along x: HELD-OUT scene (round 5,
    VERDICT r4 #8) stressing self-occlusion + association across a
    closing/opening contact. Never used to tune any default."""
    r, z = CONTACT["r"], CONTACT["z"]
    d = r + 0.05 * (1.0 - np.cos(0.2 * t)) / 2.0
    return np.array([-d, 0.0, z]), np.array([d, 0.0, z])


def _quality_frame(cfg, t, scene):
    """One clean depth frame of a quality scene ('sphere' tuned family;
    'hinge'/'bulge'/'contact'/'cloth' hold-outs), uint16 mm."""
    if scene == "bulge":
        return synthetic.bulge_depth(cfg.intr, cfg.rows, cfg.cols, t)
    if scene == "cloth":
        return synthetic.cloth_depth(cfg.intr, cfg.rows, cfg.cols, t)
    if scene == "contact":
        ca, cb = _contact_centers(t)
        return synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols,
            spheres=[dict(center=tuple(ca), radius=CONTACT["r"]),
                     dict(center=tuple(cb), radius=CONTACT["r"])],
            plane_z=1.3,
        )
    if scene == "hinge":
        ca, cb = _hinge_centers(t)
        return synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols,
            spheres=[dict(center=tuple(ca), radius=HINGE["r"]),
                     dict(center=tuple(cb), radius=HINGE["r"])],
            plane_z=1.3,
        )
    center, radius = (0.0, 0.0, 0.9), 0.25
    sphere = synthetic.deforming_sphere_depth(
        cfg.intr, cfg.rows, cfg.cols,
        t=0.0 if cfg.rigid_only else 0.35 * t, center=center,
        radius=radius, amp=0.0 if cfg.rigid_only else 0.04,
    )
    bg = synthetic.scene_depth(
        cfg.intr, cfg.rows, cfg.cols, spheres=[BG_SPHERE], plane_z=1.3,
    )
    return np.where((sphere > 0) & ((bg == 0) | (sphere < bg)), sphere, bg)


def run_quality(cfg, n, noise, seed=0, scene="sphere", df=None):
    """Reconstruct a deforming scene; the canonical model must match the
    t=0 analytic geometry. Prints + returns the median absolute surface
    error (mm) AND the surface-coverage fraction (ground-truth samples
    within one voxel of an extracted point). vs_baseline = voxel_size /
    error (>= 1 means sub-voxel accuracy, the parity class the reference's
    visual validation implies).

    scene="sphere": the deforming sphere + background the defaults were
    tuned on. scene="hinge": the HELD-OUT articulated two-sphere scissor
    (never used for tuning any default — see _hinge_centers)."""
    from dynamicfusion_tpu.ops import tsdf as tsdf_ops

    center, radius = (0.0, 0.0, 0.9), 0.25
    if df is None:
        df = kinfu.DynamicFusion(cfg)
    else:
        df.reset()
    for t in range(n):
        # deforming foreground over a static background (plane [+ off-axis
        # sphere]) — the background conditions all 6 ICP dof, like real
        # scenes. Rigid mode reconstructs the STATIC sphere instead (no
        # warp field to absorb deformation).
        d = _quality_frame(cfg, t, scene)
        if noise:
            d = synthetic.kinect_noise(d, cfg.intr, seed=1000 * seed + t)
        df(jnp.asarray(d), block=False)
    _ = float(df.last_outputs.solver_cost1)

    cloud = tsdf_ops.extract_cloud(cfg, df.state.vol, max_points=1 << 19)
    pts = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    voxel_mm = cfg.voxel_size * 1000.0
    if scene == "bulge":
        # evaluate the bulge region (the flat plane is trivial surface)
        near = np.sqrt((pts[:, 0] + 0.1) ** 2 + pts[:, 1] ** 2) < 2.5 * 0.06
        pts = pts[near]
        err = synthetic.bulge_surface_error_m(pts)
        samples, cos_inc = synthetic.bulge_surface_samples()
        metric = "holdout_bulge_error_mm"
        unit = "mm (median |surface - analytic|, traveling-bulge-on-plane hold-out)"
    elif scene == "cloth":
        # evaluate the sheet region (margin inside the edges)
        p = synthetic.CLOTH
        near = (
            (pts[:, 0] > p["x0"] + 0.02) & (pts[:, 0] < p["x1"] - 0.02)
            & (pts[:, 1] > p["y0"] + 0.02) & (pts[:, 1] < p["y1"] - 0.02)
            & (pts[:, 2] < 1.2)
        )
        pts = pts[near]
        err = synthetic.cloth_surface_error_m(pts)
        samples, cos_inc = synthetic.cloth_surface_samples()
        metric = "holdout_cloth_error_mm"
        unit = "mm (median |surface - analytic|, articulated+wave cloth hold-out)"
    elif scene == "contact":
        ca, cb = _contact_centers(0)
        r = CONTACT["r"]
        da = np.linalg.norm(pts - ca, axis=-1)
        db = np.linalg.norm(pts - cb, axis=-1)
        near = (da < r + 0.08) | (db < r + 0.08)
        pts = pts[near & (pts[:, 2] < 1.2)]
        err = np.minimum(np.abs(np.linalg.norm(pts - ca, axis=-1) - r),
                         np.abs(np.linalg.norm(pts - cb, axis=-1) - r))
        sa, ca_i = _visible_sphere_samples(ca, r, occluders=[dict(center=cb, radius=r)])
        sb, cb_i = _visible_sphere_samples(cb, r, occluders=[dict(center=ca, radius=r)])
        samples = np.concatenate([sa, sb], axis=0)
        cos_inc = np.concatenate([ca_i, cb_i], axis=0)
        metric = "holdout_contact_error_mm"
        unit = "mm (median |surface - analytic|, touching-spheres contact hold-out)"
    elif scene == "hinge":
        ca, cb = _hinge_centers(0)
        r = HINGE["r"]
        da = np.linalg.norm(pts - ca, axis=-1)
        db = np.linalg.norm(pts - cb, axis=-1)
        near = (da < r + 0.1) | (db < r + 0.1)
        pts = pts[near & (pts[:, 2] < 1.2)]
        err = np.minimum(np.abs(np.linalg.norm(pts - ca, axis=-1) - r),
                         np.abs(np.linalg.norm(pts - cb, axis=-1) - r))
        sa, ca_i = _visible_sphere_samples(ca, r, occluders=[dict(center=cb, radius=r)])
        sb, cb_i = _visible_sphere_samples(cb, r, occluders=[dict(center=ca, radius=r)])
        samples = np.concatenate([sa, sb], axis=0)
        cos_inc = np.concatenate([ca_i, cb_i], axis=0)
        metric = "holdout_hinge_error_mm"
        unit = "mm (median |surface - analytic|, articulated two-sphere hold-out)"
    else:
        # evaluate only the deforming object's surface: inside its own band
        # AND away from the background sphere, whose near side falls inside
        # the inclusion radius and previously leaked up to 120 mm of
        # "error" into the tail percentiles
        near = np.linalg.norm(pts - np.asarray(center), axis=-1) < radius + 0.12
        bg = np.linalg.norm(pts - np.asarray(BG_SPHERE["center"]), axis=-1) < 0.16
        pts = pts[near & ~bg]
        err = np.abs(np.linalg.norm(pts - np.asarray(center), axis=-1) - radius)
        samples, cos_inc = _visible_sphere_samples(center, radius, occluders=[BG_SPHERE])
        metric = ("rigid_" if cfg.rigid_only else "") + "canonical_reconstruction_error_mm"
        unit = "mm (median |surface - analytic|, deforming sphere)"
    med_mm = float(np.median(err)) * 1000.0 if len(err) else float("inf")
    p95_mm = float(np.percentile(err, 95)) * 1000.0 if len(err) else float("inf")
    # coverage support = samples the (simulated) sensor can actually
    # observe: the Kinect noise model drops ALL pixels beyond 84 deg
    # incidence and ramps from 70 deg (io.synthetic.kinect_noise), so
    # surface seen only past ~81 deg (cos < 0.15) is absent from the INPUT
    # — unreconstructable by any pipeline. `surface_coverage` gates quality
    # changes; `surface_coverage_all` (no incidence cut) rides along so the
    # cut itself can't hide survivorship.
    cov = _coverage(pts, samples[cos_inc >= 0.15], cfg.voxel_size)
    cov_all = _coverage(pts, samples, cfg.voxel_size)
    result = {
        "metric": metric + ("_kinect_noise" if noise else ""),
        "value": round(med_mm, 3),
        "unit": unit,
        "vs_baseline": round(voxel_mm / max(med_mm, 1e-6), 2),
        "p95_mm": round(p95_mm, 3),
        "voxel_mm": round(voxel_mm, 3),
        "frames": n,
        "seed": seed,
        "surface_points": int(len(pts)),
        "surface_coverage": round(cov, 4),
        "surface_coverage_all": round(cov_all, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--dims", type=int, default=256)
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--solver-iters", type=int, default=3)
    ap.add_argument("--point-stride", type=int, default=2)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--rigid", action="store_true",
                    help="plain KinectFusion path (identity warp, BASELINE config 1)")
    ap.add_argument("--quality", action="store_true",
                    help="report reconstruction error vs analytic ground truth "
                         "(deforming-sphere sequence; BASELINE config 3 parity check)")
    ap.add_argument("--noise", action="store_true",
                    help="with --quality: apply the Kinect sensor-noise model "
                         "(io.synthetic.kinect_noise) to every input frame")
    ap.add_argument("--scene", default="sphere",
                    choices=["sphere", "hinge", "bulge", "contact", "cloth"],
                    help="with --quality: 'sphere' = the tuned deforming-"
                         "sphere family; 'hinge' (articulated scissor), "
                         "'bulge' (traveling bump on a plane), 'contact' "
                         "(touching-then-separating spheres) and 'cloth' "
                         "(articulated+wave sheet) are HELD-OUT families")
    ap.add_argument("--seed", type=int, default=0,
                    help="noise-model seed base for --quality runs")
    ap.add_argument("--no-quality", action="store_true",
                    help="skip the quality line the default run emits "
                         "alongside the fps line (faster iteration)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="override any DynamicFusionConfig field (repeatable); "
                         "values parsed as Python literals")
    args = ap.parse_args()

    cfg = build_cfg(args)
    if args.rigid:
        # rigid tracking depends directly on raycast crossing accuracy;
        # the newton8 refine's grazing-incidence bias measurably hurts it
        # (config.raycast_refine) — rigid mode runs the secant refine,
        # like the default_kinfu preset
        cfg = dataclasses.replace(cfg, rigid_only=True, raycast_refine="secant")
    if args.set:
        import ast

        over = {}
        for kv in args.set:
            k, v = kv.split("=", 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass  # keep as string (e.g. solver_linear=direct)
            over[k] = v
        cfg = dataclasses.replace(cfg, **over)
    if args.quality:
        run_quality(cfg, args.frames, args.noise, seed=args.seed, scene=args.scene)
        return
    df = kinfu.DynamicFusion(cfg)
    seq = frames(cfg, args.frames + 2)

    t0 = time.time()
    df(seq[0])              # frame 0 (init path compile)
    df(seq[1])              # first full step (step compile)
    _ = float(df.last_outputs.solver_cost1)  # force
    compile_s = time.time() - t0

    t0 = time.time()
    for d in seq[2:]:
        df(d, block=False)  # streaming mode: frames pipeline on device
    # force the chained computation to finish
    cost = float(df.last_outputs.solver_cost1)
    icp_ok = bool(df.last_outputs.icp_ok)
    band, wide, dropped = (int(x) for x in np.asarray(df.last_outputs.brick_counts))
    elapsed = time.time() - t0
    fps = args.frames / elapsed

    result = {
        "metric": "rigid_kinfu_fps" if args.rigid else "full_nonrigid_pipeline_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 1),
        "config": {
            "frame": f"{cfg.cols}x{cfg.rows}",
            "volume": f"{cfg.volume_dims}^3",
            "nodes": cfg.max_nodes,
            "solver": f"LM{cfg.solver_nonlinear_iters}x{cfg.solver_linear}{cfg.solver_linear_iters if cfg.solver_linear == 'pcg' else ''}",
        },
        "ms_per_frame": round(1000.0 * elapsed / args.frames, 1),
        "compile_s": round(compile_s, 1),
        "final_solver_cost": cost,
        "icp_ok": icp_ok,
        "brick_overflow": dropped > 0,
        "device": str(jax.devices()[0]),
    }
    # quality lines (Kinect noise ON) ride along with every default run so
    # the per-round BENCH artifacts record throughput AND quality AND
    # surface coverage: the tuned sphere family at 20 frames (the coverage
    # gate's horizon) plus the HELD-OUT hinge scene. Printed BEFORE the fps
    # line — the driver parses the last line as the headline metric.
    # --rigid reconstructs a static sphere instead.
    if not (args.no_quality or args.small):
        run_quality(cfg, max(args.frames, 20), noise=True, df=df)
        if not args.rigid:
            for sc in ("hinge", "bulge", "contact", "cloth"):
                run_quality(cfg, max(args.frames, 20), noise=True, scene=sc, df=df)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
