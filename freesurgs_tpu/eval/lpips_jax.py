"""AlexNet-LPIPS v0.1 in pure jax/jnp (reference ``utils/general_utils.py:
24-50``: ``lpips.LPIPS(net='alex', version='0.1')``).

Exact architecture parity with the ``lpips`` package's AlexNet v0.1 head:

  input (N, 3, H, W) in [-1, 1]
  -> per-channel shift/scale normalization (the package's ScalingLayer)
  -> torchvision AlexNet ``features`` trunk, tapping the 5 ReLU outputs:
       conv1 11x11/4 p2 -> relu   (tap 1)   maxpool 3x3/2
       conv2  5x5/1 p2  -> relu   (tap 2)   maxpool 3x3/2
       conv3  3x3/1 p1  -> relu   (tap 3)
       conv4  3x3/1 p1  -> relu   (tap 4)
       conv5  3x3/1 p1  -> relu   (tap 5)
  -> per-tap: channel-unit-normalize both images' features, squared diff,
     1x1 non-negative linear head (``lin_k``), spatial mean, sum of taps.

Weight values: the pretrained AlexNet + LPIPS linear weights cannot be
bundled in a zero-egress build. ``load_weights`` reads an .npz exported
once by ``scripts/export_lpips_weights.py`` on any machine with
``torchvision`` + ``lpips`` installed. When no weight file exists,
``random_weights`` provides a fixed-seed He-initialized trunk with
uniform linear heads: LPIPS-with-random-features is a known, usable
perceptual distance (random convolutional features correlate with
perceptual judgements), but its VALUES are not comparable with published
LPIPS numbers — callers must surface which backend produced the metric
(see ``eval/image_metrics.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, in_ch, kh, kw, stride, pad), torchvision AlexNet .features
CONVS = (
    (64, 3, 11, 11, 4, 2),
    (192, 64, 5, 5, 1, 2),
    (384, 192, 3, 3, 1, 1),
    (256, 384, 3, 3, 1, 1),
    (256, 256, 3, 3, 1, 1),
)
# maxpool 3x3 stride 2 after taps 1 and 2
POOL_AFTER = (True, True, False, False, False)

# lpips.ScalingLayer constants (lpips/lpips.py v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

WEIGHTS_ENV = "FREESURGS_LPIPS_WEIGHTS"
_DEFAULT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "weights",
    "lpips_alex_v01.npz")


def load_weights(path: str | None = None) -> dict | None:
    """Load {convK_w, convK_b, linK} arrays from an exported .npz."""
    path = path or os.environ.get(WEIGHTS_ENV, _DEFAULT_PATH)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    w = {k: jnp.asarray(z[k]) for k in z.files}
    for i, (co, ci, kh, kw, _, _) in enumerate(CONVS):
        assert w[f"conv{i}_w"].shape == (co, ci, kh, kw), path
        assert w[f"lin{i}"].shape == (co,), path
    return w


def random_weights(seed: int = 0) -> dict:
    """Fixed-seed He-init trunk + uniform heads (random-feature LPIPS)."""
    rng = np.random.default_rng(seed)
    w = {}
    for i, (co, ci, kh, kw, _, _) in enumerate(CONVS):
        fan_in = ci * kh * kw
        w[f"conv{i}_w"] = jnp.asarray(
            rng.normal(0.0, np.sqrt(2.0 / fan_in),
                       (co, ci, kh, kw)).astype(np.float32))
        w[f"conv{i}_b"] = jnp.zeros((co,), jnp.float32)
        w[f"lin{i}"] = jnp.full((co,), 1.0 / co, jnp.float32)
    return w


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        "VALID")


def _features(x, w):
    """The 5 tapped ReLU outputs for input (N, 3, H, W) in [-1, 1]."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
        / jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    for i, (co, ci, kh, kw, stride, pad) in enumerate(CONVS):
        x = jax.nn.relu(_conv(x, w[f"conv{i}_w"], w[f"conv{i}_b"],
                              stride, pad))
        taps.append(x)
        if POOL_AFTER[i]:
            x = _maxpool3s2(x)
    return taps


def _unit(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips_pairs(a: jnp.ndarray, b: jnp.ndarray, weights: dict
                ) -> jnp.ndarray:
    """Per-pair LPIPS distance for (N, 3, H, W) stacks in [-1, 1]."""
    fa = _features(a, weights)
    fb = _features(b, weights)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit(xa) - _unit(xb)) ** 2               # (N, C, h, w)
        lin = weights[f"lin{i}"][None, :, None, None]  # 1x1 conv, no bias
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total


def lpips_alex(gts: np.ndarray, preds: np.ndarray,
               weights: dict | None = None, batch: int = 8) -> float:
    """Mean AlexNet-LPIPS over (T, 3, H, W) stacks in [0, 1]."""
    if weights is None:
        weights = load_weights() or random_weights()
    vals = []
    for s in range(0, gts.shape[0], batch):
        a = jnp.asarray(2.0 * np.asarray(gts[s:s + batch], np.float32) - 1.0)
        b = jnp.asarray(2.0 * np.asarray(preds[s:s + batch],
                                         np.float32) - 1.0)
        vals.append(np.asarray(lpips_pairs(a, b, weights)))
    return float(np.concatenate(vals).mean())
