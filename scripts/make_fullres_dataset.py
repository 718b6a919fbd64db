#!/usr/bin/env python
"""Generate a full-resolution synthetic sequence in SCARED layout.

BASELINE configs 3-4 need a full-length 1280x1024 sequence; the real
SCARED dataset is access-gated (BASELINE.md), so the highest-fidelity
obtainable stand-in is the framework's own synthetic video at native
resolution: a dense Gaussian scene rendered with the production Pallas
kernels, analytic optical flow from true depth + GT relative poses, and
the reference's mono-depth normalization (data/synthetic.py).

Usage: python scripts/make_fullres_dataset.py --out /tmp/fullres \
           [--frames 60] [--n 20000] [--hw 1024 1280]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 1280])
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--nonrigid", action="store_true",
                    help="adversarial variant: a deforming patch + a "
                         "moving specular highlight with epipolar-"
                         "violating analytic flow (the rigidity-mask "
                         "stress sequence; GT non-rigid masks are saved "
                         "as <out>/nonrigid_mask.npz)")
    args = ap.parse_args()

    from freesurgs_tpu.data.scared import save_synthetic_as_scared
    from freesurgs_tpu.data.synthetic import make_nonrigid_scene, make_scene

    t0 = time.time()
    # scale_range sized for ~10-30 px screen radii at 1280x1024
    # (fx ~ 1.1*W, depths 1.0-2.5)
    common = dict(num_frames=args.frames, n_gaussians=args.n,
                  height=args.hw[0], width=args.hw[1],
                  seed=args.seed, impl="pallas",
                  scale_range=(0.004, 0.012),
                  max_instances=393_216)
    aux = None
    if args.nonrigid:
        # deformation/highlight speeds scale with the trajectory's
        # per-frame motion (~0.015), staying in the same regime
        scene, aux = make_nonrigid_scene(patch_amp=0.02, spec_speed=0.02,
                                         **common)
    else:
        scene = make_scene(**common)
    print(f"rendered {args.frames} frames {args.hw[1]}x{args.hw[0]} "
          f"in {time.time() - t0:.1f}s")
    save_synthetic_as_scared(scene, args.out)
    if aux is not None:
        import numpy as np
        np.savez_compressed(
            os.path.join(args.out, "nonrigid_mask.npz"),
            nonrigid_mask=np.asarray(aux["nonrigid_mask"]),
            member_patch=np.asarray(aux["member_patch"], np.float16),
            member_spec=np.asarray(aux["member_spec"], np.float16))
    print(f"wrote {args.out} ({time.time() - t0:.1f}s total)")


if __name__ == "__main__":
    main()
