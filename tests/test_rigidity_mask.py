"""The Sampson rigidity mask against ADVERSARIAL non-rigid content.

The paper's signature mechanism for surgical scenes (reference
``scene/pose_optimizer.py:732-746`` + the mean+2sigma threshold
``utils/general_utils.py:96-116``) had only ever been exercised on fully
rigid synthetic data, where it cannot fail (round-4 verdict weak #5).
``make_nonrigid_scene`` adds a deforming patch and a moving specular
highlight whose analytic flow violates the epipolar constraint.

Measured properties these tests pin (CPU probe, 192x240, patch_amp=0.06,
spec_speed=0.03):
- the fast bright specular cluster is excluded ~100% at every frame;
- rigid pixels are kept at ~99.9% (the threshold does not over-trigger);
- the deforming patch is only PARTIALLY excluded (10-42% depending on
  its instantaneous velocity): a uniform patch translation projects
  largely ALONG epipolar lines, and the Sampson distance — like any
  epipolar test — is blind to that component by construction. This is a
  property of the reference's mechanism itself, not of this
  implementation; the adaptive mean+2sigma threshold also rises when
  extreme outliers (the highlight) coexist, which further spares
  moderate violators.
- the mask still causally improves the GN flow-PnP solve on this
  content, and tracking survives (pose error well under the init error).

The test resolution is 192x240 (f=264): at the tiny 64x80 test size the
same physical motions are sub-pixel in flow and undetectable by any
method — epipolar violation in pixels scales with focal length.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from freesurgs_tpu.data.synthetic import make_nonrigid_scene
from freesurgs_tpu.models.pose import (PoseTable, adaptive_threshold_mask,
                                       epipolar_rigidity)

# patch sway velocity peaks near t=3 for the period-10 sinusoid
T_PATCH_FAST = 3


@pytest.fixture(scope="module")
def nonrigid():
    scene, aux = make_nonrigid_scene(num_frames=6, n_gaussians=500,
                                     height=192, width=240, seed=4,
                                     patch_amp=0.06, spec_speed=0.03)
    return scene, aux


def _mask_for(scene, t):
    """The production mask computation for the frame-(t -> t+1) pair at
    ground-truth poses (Trainer._rigid_mask uses the same chain on the
    tracked poses of frames t-2/t-1)."""
    poses = PoseTable(quats=scene.gt_quats, trans=scene.gt_trans)
    K = jnp.asarray(scene.cam.intrinsic_matrix())
    _, sampson = epipolar_rigidity(poses, t, t + 1, scene.flows_fw[t],
                                   scene.cam, K)
    return np.asarray(adaptive_threshold_mask(sampson))


def test_mask_excludes_specular_and_keeps_rigid(nonrigid):
    scene, aux = nonrigid
    for t in range(5):
        mask = _mask_for(scene, t)
        spec = np.asarray(aux["member_spec"][t]) > 0.3
        rigid = ~np.asarray(aux["nonrigid_mask"][t])
        excl_spec = 1.0 - mask[spec].mean()
        keep = mask[rigid].mean()
        assert excl_spec > 0.9, (t, excl_spec)
        assert keep > 0.95, (t, keep)


def test_mask_partially_excludes_deforming_patch(nonrigid):
    """At the patch's peak sway velocity a substantial fraction of it is
    excluded; the remainder is the along-epipolar-line component no
    epipolar test can see (see module docstring — measured 0.42 here,
    ~0.1 at low-velocity frames)."""
    scene, aux = nonrigid
    mask = _mask_for(scene, T_PATCH_FAST)
    patch = np.asarray(aux["member_patch"][T_PATCH_FAST]) > 0.3
    excl_patch = 1.0 - mask[patch].mean()
    assert excl_patch > 0.25, excl_patch


def test_mask_keeps_everything_on_rigid_content():
    """Specificity control: on fully rigid content the thresholded map
    keeps essentially every pixel."""
    from freesurgs_tpu.data.synthetic import make_scene
    scene = make_scene(num_frames=3, n_gaussians=400, height=64, width=80,
                       seed=4)
    poses = PoseTable(quats=scene.gt_quats, trans=scene.gt_trans)
    K = jnp.asarray(scene.cam.intrinsic_matrix())
    _, sampson = epipolar_rigidity(poses, 0, 1, scene.flows_fw[0],
                                   scene.cam, K)
    mask = np.asarray(adaptive_threshold_mask(sampson))
    assert mask.mean() > 0.9


def test_tracking_survives_and_mask_helps_gn(nonrigid):
    """flow-PnP on the adversarial scene: tracking survives (pose error
    ~10% of init at t=0), and at the patch's peak velocity the Sampson
    mask's exclusions measurably improve the solve vs all-pixels
    (measured 4.99e-3 vs 6.07e-3)."""
    from freesurgs_tpu.train.flow_pnp import flow_pnp_refine

    scene, aux = nonrigid

    def solve(t, m):
        q0, t0 = scene.gt_quats[t], scene.gt_trans[t]  # const-position
        _, tr, diag = flow_pnp_refine(q0, t0, scene.depths[t],
                                      scene.gt_w2c[t], scene.flows_fw[t],
                                      scene.cam, rigid_mask=m, iters=8)
        err = np.linalg.norm(np.asarray(tr)
                             - np.asarray(scene.gt_trans[t + 1]))
        return err, float(diag[1])

    # survival: big camera motion frame, masked solve lands near GT
    err0, w0 = solve(0, jnp.asarray(_mask_for(scene, 0), jnp.float32))
    init0 = np.linalg.norm(np.asarray(scene.gt_trans[0] - scene.gt_trans[1]))
    assert w0 > 64.0            # degenerate-frame guard did not trip
    assert err0 < 0.2 * init0, (err0, init0)

    # causality: at peak patch velocity, masked beats unmasked
    t = T_PATCH_FAST
    err_m, _ = solve(t, jnp.asarray(_mask_for(scene, t), jnp.float32))
    err_a, _ = solve(t, None)
    assert err_m < 0.95 * err_a, (err_m, err_a)
