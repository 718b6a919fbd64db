"""freesurgs_tpu — a TPU-native SfM-free 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wrld/Free-SurGS (MICCAI 2024): joint camera-pose + 3D-Gaussian scene
optimization from monocular surgical video, with a tile-based
differentiable rasterizer implemented as Pallas TPU kernels, jitted
tracking/mapping/global-refinement loops, fixed-capacity densification
under jit, and mesh-sharded multi-chip rendering.

Package layout (see SURVEY.md section 7 for the design rationale):

- ``core``      camera models, SE(3)/quaternion transforms, spherical harmonics
- ``ops``       compute kernels: projection, tile binning, Pallas rasterizer,
                reference (oracle) rasterizer, KNN, SSIM
- ``models``    learnable state pytrees: GaussianField, PoseTable
- ``train``     losses, optimizers/schedules, densification, tracking /
                mapping / global loops, orchestrator
- ``parallel``  device mesh + sharded rendering / training step
- ``data``      SCARED-format dataset loader + synthetic test scenes
- ``eval``      image metrics (PSNR/SSIM/LPIPS) and pose metrics (ATE/RPE)
- ``io``        checkpointing (orbax), PLY import/export, config
- ``viz``       optional web viewer (gated on viser availability)
"""

__version__ = "0.1.0"

# f32 math must MEAN f32 on TPU: the default matmul/conv precision
# truncates operands to bf16 on the MXU, which (a) corrupts variance-style
# cancellations (SSIM's E[x^2] - mu^2 vs C2 = 9e-4 — the round-2 full-res
# divergence), and (b) injects ~2^-9 relative noise into the world->camera
# transform (~2 px of screen jitter at SCARED focal lengths). Every
# performance-critical matmul in this package passes an EXPLICIT precision
# (the Pallas kernels and ops/binning* manage their own bf16 splits), so
# this default only governs the numerically-sensitive jnp call sites.
# Opt out with FSTPU_NO_PRECISION_OVERRIDE=1 (A/B experiments only).
import os as _os

if not _os.environ.get("FSTPU_NO_PRECISION_OVERRIDE"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")
