import jax.numpy as jnp
import numpy as np
import pytest

from freesurgs_tpu.core import sh as shlib


def _torch_eval_sh(deg, sh_np, dirs_np):
    """Independent oracle: the reference's eval_sh run via torch on CPU
    (reference utils/sh_utils.py:57-112). sh layout there is (..., C, K)."""
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.sh_utils import eval_sh as ref_eval_sh
    sh_t = torch.from_numpy(np.swapaxes(sh_np, -1, -2).copy())  # (..., C, K)
    out = ref_eval_sh(deg, sh_t, torch.from_numpy(dirs_np))
    return out.numpy()


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_matches_reference(rng, deg):
    n, k = 64, (deg + 1) ** 2
    sh = rng.normal(size=(n, k, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ours = np.asarray(shlib.eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
    ref = _torch_eval_sh(deg, sh, dirs)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(10, 3)).astype(np.float32)
    back = np.asarray(shlib.sh2rgb(shlib.rgb2sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_deg0_constant_color(rng):
    rgb = rng.uniform(size=(5, 3)).astype(np.float32)
    sh = np.asarray(shlib.rgb2sh(jnp.asarray(rgb)))[:, None, :]
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = np.asarray(shlib.sh_to_rgb_clamped(0, jnp.asarray(sh),
                                             jnp.asarray(dirs)))
    np.testing.assert_allclose(out, rgb, atol=1e-6)
