#!/usr/bin/env python
"""Export pretrained AlexNet-LPIPS v0.1 weights to weights/lpips_alex_v01.npz.

Run ONCE on any machine with ``torch`` + ``lpips`` (and network access for
the first download); copy the resulting .npz into the repo's ``weights/``
directory (or point FREESURGS_LPIPS_WEIGHTS at it). After that,
``freesurgs_tpu.eval.lpips_jax`` computes reference-parity LPIPS
(``utils/general_utils.py:31`` in the reference) without torch at runtime.

Usage: python scripts/export_lpips_weights.py [out.npz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import lpips  # noqa: F401  (pulls torchvision AlexNet weights)

    from freesurgs_tpu.eval.lpips_jax import CONVS

    metric = lpips.LPIPS(net="alex", version="0.1", verbose=False)
    convs = [m for m in metric.net.modules()
             if m.__class__.__name__ == "Conv2d"]
    lins = [metric.lins[i] for i in range(5)]
    out = {}
    for i, ((co, ci, kh, kw, _, _), conv) in enumerate(zip(CONVS, convs)):
        w = conv.weight.detach().numpy()
        b = conv.bias.detach().numpy()
        assert w.shape == (co, ci, kh, kw), (i, w.shape)
        out[f"conv{i}_w"] = w.astype(np.float32)
        out[f"conv{i}_b"] = b.astype(np.float32)
        lw = lins[i].model[-1].weight.detach().numpy().reshape(-1)
        assert lw.shape == (co,), (i, lw.shape)
        out[f"lin{i}"] = lw.astype(np.float32)

    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weights", "lpips_alex_v01.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez(dst, **out)
    print("wrote", dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
