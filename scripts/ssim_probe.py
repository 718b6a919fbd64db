#!/usr/bin/env python
"""SSIM numerics probe for the CURRENT backend (run it on the TPU).

The SSIM variance terms ``E[x^2] - mu^2`` cancel to ~C2 = 9e-4 scale on
low-texture windows; any bf16 truncation in the blur makes the SSIM
denominator cross zero there (SSIM > 1, negative rgb loss, divergence —
rounds 2 AND 4 both hit this through different implementations). This
probe evaluates the implementation against a float64 numpy reference on
the worst case — smooth, low-texture, full-res images — and prints a
PASS/FAIL line. Run after ANY change to ops/ssim.py, ON THE CHIP:

  python scripts/ssim_probe.py            # default backend (TPU here)
  python scripts/ssim_probe.py --platform cpu

Checks:
  1. ssim(x, x) == 1 to 1e-4 (identical smooth images);
  2. mean SSIM matches the f64 reference to 1e-4 on smooth pairs;
  3. the minimum on-device SSIM denominator stays positive;
  4. max on-device |ssim_map| <= 1 + 1e-3 (no blown windows).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def f64_ssim_stats(a, b, window=11, sigma=1.5):
    import numpy as np
    x = np.arange(window) - window // 2
    w = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    w = (w / w.sum()).astype(np.float64)

    def blur(img):
        from scipy.ndimage import correlate1d
        out = correlate1d(img.astype(np.float64), w, axis=1, mode="constant")
        return correlate1d(out, w, axis=2, mode="constant")

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 * mu1
    s2 = blur(b * b) - mu2 * mu2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    return (num / den).mean(), den.min()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1280)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from freesurgs_tpu.ops import ssim as ssim_mod

    H, W = args.height, args.width
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rng = np.random.default_rng(0)
    # smooth low-texture pair: gentle gradients + faint structure + tiny
    # noise — the regime where variance cancellation is most fragile
    base = 0.4 + 0.2 * np.sin(xx / 391.0) * np.cos(yy / 277.0)
    a = np.stack([base + 0.01 * np.sin(xx / 53.0 + i) for i in range(3)])
    b = a + rng.normal(0, 3e-3, a.shape)
    a = a.astype(np.float32)
    b = np.clip(b, 0, 1).astype(np.float32)

    ja, jb = jnp.asarray(a), jnp.asarray(b)
    dev_self = float(jax.jit(ssim_mod.ssim)(ja, ja))
    dev_pair = float(jax.jit(ssim_mod.ssim)(ja, jb))

    # on-device internals: min denominator + max |ssim_map|
    def internals(img1, img2):
        stacked = jnp.concatenate(
            [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
        bl = ssim_mod._blur(stacked)
        c = img1.shape[0]
        mu1, mu2 = bl[0:c], bl[c:2 * c]
        s1 = bl[2 * c:3 * c] - mu1 * mu1
        s2 = bl[3 * c:4 * c] - mu2 * mu2
        s12 = bl[4 * c:5 * c] - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        den = (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
        num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
        return jnp.min(den), jnp.max(jnp.abs(num / den))

    den_min, map_max = (float(v) for v in jax.jit(internals)(ja, jb))

    try:
        ref_pair, ref_den_min = f64_ssim_stats(a, b)
        have_ref = True
    except ImportError:
        ref_pair, ref_den_min, have_ref = float("nan"), float("nan"), False

    ok = (abs(dev_self - 1.0) < 1e-4 and den_min > 0.0
          and map_max <= 1.0 + 1e-3
          and (not have_ref or abs(dev_pair - ref_pair) < 1e-4))
    print(f"backend={jax.default_backend()} ssim(x,x)={dev_self:.6f} "
          f"ssim(a,b)={dev_pair:.6f} ref={ref_pair:.6f} "
          f"den_min={den_min:.3e} (ref {ref_den_min:.3e}) "
          f"map_max={map_max:.4f} -> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
