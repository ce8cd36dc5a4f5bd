#!/usr/bin/env python3
"""Dataset demo app — equivalent of the reference's ``apps/demo.cpp``.

Runs DynamicFusion over a VolumeDeform-layout dataset directory
(``<dir>/depth/*.png`` 16-bit mm, optional ``<dir>/color``), or over a
synthetic deforming scene with ``--synthetic N``. Renders the fused model
per frame (Phong + normal colors, the reference's mode 3) and optionally
saves frames/checkpoints/a final PLY cloud.

Usage:
  python apps/demo.py <data-dir> [--out out_dir] [--frames N] [--small]
  python apps/demo.py --synthetic 50 --out /tmp/out
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(".jax_cache"))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu
from dynamicfusion_tpu.utils import checkpoint, metrics


def build_cfg(args) -> DynamicFusionConfig:
    if args.small:
        return dataclasses.replace(
            DynamicFusionConfig.small(dims=64, rows=120, cols=160),
            max_nodes=256,
            node_sample_step=7,
        )
    return DynamicFusionConfig.default_dynamicfusion()


def frame_source(args, cfg):
    """Open a FrameSource (io.capture): dataset dir, synthetic, or OpenNI."""
    from dynamicfusion_tpu.io import capture

    spec = f"synthetic:{args.synthetic}" if args.synthetic else args.data_dir
    src = capture.open_source(spec, cfg=cfg)
    n = len(src)
    if args.frames is not None:
        n = min(args.frames, n)
    return ((f[0], f[1]) for _, f in zip(range(n), src)), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?", help="dataset dir with depth/ (and color/)")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="run N synthetic deforming frames instead of a dataset")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--out", default=None, help="save rendered frames + artifacts here")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--show-warp", action="store_true",
                    help="overlay the warp-field nodes on saved frames "
                         "(the reference's 't' show_warp view, demo.cpp:65,108-114)")
    ap.add_argument("--orbit", type=int, default=0, metavar="N",
                    help="after the run, save N turntable renders of the "
                         "canonical model from orbiting viewpoints")
    args = ap.parse_args()
    if not args.synthetic and not args.data_dir:
        ap.error("need a data dir or --synthetic N")

    cfg = build_cfg(args)
    frames, n = frame_source(args, cfg)
    df = kinfu.DynamicFusion(cfg)
    timer = metrics.PhaseTimer()

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    t_start = time.time()
    for i, (depth, color) in enumerate(frames):
        with timer.phase("frame", sync=None):
            ok = df(jnp.asarray(depth, jnp.uint16))
        if i > 0 and not ok:
            print(f"[{i}] tracking failed — reset", flush=True)
            df.reset()
            df(jnp.asarray(depth, jnp.uint16))
            continue
        if args.out:
            from dynamicfusion_tpu.pipeline import render as render_mod

            img = np.asarray(df.render(mode=3))
            if args.show_warp and i > 0:
                img = render_mod.overlay_nodes(cfg, img, df.state)
            if color is not None and color.ndim == 3 and color.shape[0] == img.shape[0]:
                # RGB panel alongside the render — the reference shows the
                # color stream in its own window next to the scene
                # (demo.cpp:83-88, display-only: the algorithm is
                # depth-only in both implementations)
                img = np.concatenate(
                    [np.ascontiguousarray(color[..., :3], dtype=np.uint8), img],
                    axis=1,
                )
            from PIL import Image

            Image.fromarray(img).save(os.path.join(args.out, f"frame_{i:05d}.png"))
        if args.checkpoint_every and i and i % args.checkpoint_every == 0:
            checkpoint.save(os.path.join(args.out or ".", f"ckpt_{i:05d}.npz"), df.state)
        if i > 0:
            band, wide, dropped = (
                int(x) for x in np.asarray(df.last_outputs.brick_counts)
            )
            if dropped > 0:
                # dropped bricks keep stale TSDF this frame (see
                # config.integrate_band_cap/integrate_wide_cap) — surface it
                print(
                    f"[{i}] WARNING: brick cap overflow ({dropped} bricks "
                    f"dropped; band {band}, wide {wide}) — part of the "
                    f"surface kept stale values; raise the caps", flush=True,
                )
        if i % 10 == 0 and i > 0:
            o = df.last_outputs
            print(
                f"[{i}/{n}] {i / (time.time() - t_start):.2f} fps  "
                f"nodes={int(o.node_count)} solver {float(o.solver_cost0):.4f}->"
                f"{float(o.solver_cost1):.4f}",
                flush=True,
            )

    elapsed = time.time() - t_start
    print(json.dumps({"frames": n, "fps": round(n / elapsed, 3), "seconds": round(elapsed, 1)}))

    if args.out:
        from dynamicfusion_tpu.io import export as export_mod
        from dynamicfusion_tpu.ops import tsdf as tsdf_ops

        cloud = tsdf_ops.extract_cloud(cfg, df.state.vol, max_points=1 << 20)
        normals = tsdf_ops.extract_normals(cfg, df.state.vol, cloud.points)
        export_mod.save_ply(
            os.path.join(args.out, "canonical_cloud.ply"),
            np.asarray(cloud.points),
            np.asarray(normals),
        )
        checkpoint.save(os.path.join(args.out, "final_state.npz"), df.state)
        df.save_mesh(os.path.join(args.out, "canonical_mesh.ply"))
        df.save_mesh(os.path.join(args.out, "live_mesh.ply"), live=True)
        if args.orbit > 0:
            # turntable dump of the canonical model (renderImage-at-pose,
            # kinfu.cpp:408-436 — the reference's interactive viz is a GUI;
            # headless equivalent: dump orbiting viewpoints)
            from PIL import Image

            center = np.asarray(cfg.volume_origin) + cfg.volume_size / 2.0
            for k in range(args.orbit):
                a = 2.0 * np.pi * k / args.orbit
                pose = synthetic.orbit_pose(a, target=center)
                img = np.asarray(df.render(mode=3, pose=pose))
                if args.show_warp:
                    from dynamicfusion_tpu.pipeline import render as render_mod

                    img = render_mod.overlay_nodes(cfg, img, df.state, pose=pose)
                Image.fromarray(img).save(
                    os.path.join(args.out, f"orbit_{k:03d}.png")
                )
        print(f"saved canonical cloud + meshes + state to {args.out}")


if __name__ == "__main__":
    main()
