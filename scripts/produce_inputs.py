#!/usr/bin/env python
"""Produce the flow/ + monodep/ inputs the pipeline consumes from RAW frames.

Fills the onboarding gap for real data (e.g. SCARED once access exists):
the reference assumes precomputed RAFT flow and mono-depth ``.npz`` files
(layout at ``scene/pose_optimizer.py:396-414``) and ships NO producer.
This script takes a directory that has only ``<root>/input/*.png`` (+
optional ``poses/``) and writes

  <root>/flow/flow_fw_<stem>.npz   {'pred': (2, H, W) float32 px}
  <root>/flow/flow_bw_<stem>.npz
  <root>/monodep/depth_<stem>.npz  {'pred': (H, W) float32 disparity}

exactly as ``freesurgs_tpu.data.scared.load_scared`` expects.

Backends:
  --flow hs        multi-scale Horn-Schunck (built-in, jnp, no deps) [default]
  --flow <module>  any python module exposing
                       flow(img0_3hw: np.ndarray, img1_3hw) -> (2, H, W)
                   (adapter point for RAFT or any learned model)
  --depth parallax median-compensated flow-parallax disparity proxy
                   (built-in; relative structure only — the loader
                   min-max normalizes, so scale is irrelevant) [default]
  --depth <module> any python module exposing
                       depth(img_3hw: np.ndarray) -> (H, W) disparity
                   (adapter point for MiDaS/DepthAnything etc.)

Usage:
  python scripts/produce_inputs.py --root /path/to/seq [--flow hs]
"""

import argparse
import glob
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _load_frames(root):
    from PIL import Image
    paths = sorted(glob.glob(os.path.join(root, "input", "*.png"))
                   + glob.glob(os.path.join(root, "input", "*.jpg"))
                   + glob.glob(os.path.join(root, "input", "*.jpeg")))
    if not paths:
        raise SystemExit(f"no frames under {root}/input")
    imgs = [np.asarray(Image.open(p), np.float32).transpose(2, 0, 1) / 255.0
            for p in paths]
    stems = [os.path.basename(p).split(".")[0] for p in paths]
    return imgs, stems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--flow", default="hs")
    ap.add_argument("--depth", default="parallax")
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    import jax

    if not os.environ.get("FSTPU_PRODUCE_DEVICE"):
        # Host-side preprocessing: run on CPU by default (the container
        # pins JAX_PLATFORMS to the tunneled TPU, which may be busy with
        # a training run; set FSTPU_PRODUCE_DEVICE=1 to use it anyway).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from freesurgs_tpu.data.flow_hs import hs_flow, parallax_disparity

    if args.flow == "hs":
        def flow_fn(a, b):
            return np.asarray(hs_flow(jnp.asarray(a), jnp.asarray(b),
                                      levels=args.levels))
    else:
        mod = importlib.import_module(args.flow)
        flow_fn = lambda a, b: np.asarray(mod.flow(a, b))  # noqa: E731

    depth_fn = None
    if args.depth != "parallax":
        mod = importlib.import_module(args.depth)
        depth_fn = lambda a: np.asarray(mod.depth(a))  # noqa: E731

    imgs, stems = _load_frames(args.root)
    os.makedirs(os.path.join(args.root, "flow"), exist_ok=True)
    os.makedirs(os.path.join(args.root, "monodep"), exist_ok=True)

    flows = {}
    for t in range(len(imgs) - 1):
        fw_path = os.path.join(args.root, "flow",
                               f"flow_fw_{stems[t]}.npz")
        bw_path = os.path.join(args.root, "flow",
                               f"flow_bw_{stems[t]}.npz")
        if os.path.exists(fw_path) and not args.overwrite:
            flows[t] = (np.load(fw_path)["pred"], np.load(bw_path)["pred"])
            continue
        fw = flow_fn(imgs[t], imgs[t + 1]).astype(np.float32)
        bw = flow_fn(imgs[t + 1], imgs[t]).astype(np.float32)
        np.savez(fw_path, pred=fw)
        np.savez(bw_path, pred=bw)
        flows[t] = (fw, bw)
        print(f"flow {stems[t]}: |fw| median "
              f"{np.median(np.hypot(fw[0], fw[1])):.2f}px", flush=True)

    for t in range(len(imgs)):
        dpath = os.path.join(args.root, "monodep",
                             f"depth_{stems[t]}.npz")
        if os.path.exists(dpath) and not args.overwrite:
            continue
        if depth_fn is not None:
            disp = depth_fn(imgs[t])
        else:
            # parallax proxy needs a flow pair; endpoints reuse their
            # single neighbour edge
            fw, _ = flows.get(t, flows[len(imgs) - 2])
            _, bw = flows.get(t - 1, flows[0])
            disp = np.asarray(parallax_disparity(jnp.asarray(fw),
                                                 jnp.asarray(bw)))
        np.savez(dpath, pred=disp.astype(np.float32))
    print(f"wrote {len(imgs) - 1} flow pairs + {len(imgs)} disparity maps "
          f"under {args.root}", flush=True)


if __name__ == "__main__":
    main()
