"""Gradient finiteness on degenerate-but-legal field states.

Round-2's full-res run saturated the nonfinite-gradient diagnostic with
exactly 3 * (capacity - active) NaN entries per mapping iteration: every
NEVER-USED capacity slot holds exactly-zero means, and the SH
view-direction normalization ``x / max(norm(x), eps)`` has a 0 * inf = NaN
cotangent at x == 0 (sqrt'(0) is infinite before the max can mask it).
The renderer now uses rsqrt(max(|x|^2, eps^2)); this test pins that the
full render gradient is finite with zero-mean inactive slots present.
"""

import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.ops.render import render

CAM = Camera(height=32, width=32, fx=30.0, fy=30.0, cx=16.0, cy=16.0)


def test_zero_mean_inactive_slots_have_finite_grads(rng):
    n = 8
    means = jnp.asarray(np.concatenate(
        [rng.normal(0, 0.3, (4, 3)) + [0, 0, 1.5],
         np.zeros((4, 3))]).astype(np.float32))
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    logs = jnp.full((n, 3), -2.5)
    opac = jnp.zeros((n,))
    sh = jnp.asarray(rng.normal(0, 0.2, (n, 4, 3)).astype(np.float32))
    active = jnp.arange(n) < 4

    def loss(params):
        means, quats, logs, opac, sh = params
        out = render(means, quats, logs, opac, sh, jnp.eye(4), CAM,
                     active=active, sh_degree=1, impl="pallas_interpret",
                     max_instances=1024, gs_grad=True, cam_grad=False)
        return jnp.sum(out["render"]) + jnp.sum(out["render_dep"])

    grads = jax.grad(loss)((means, quats, logs, opac, sh))
    bad = sum(int(jnp.sum(~jnp.isfinite(g))) for g in grads)
    assert bad == 0, f"{bad} nonfinite gradient entries on a legal state"
