"""TPU-native sparse visual SLAM engine (ORB-SLAM2 capability class).

A brand-new JAX/XLA/Pallas implementation of a full sparse feature-based SLAM
system for Monocular, Stereo and RGB-D cameras, designed TPU-first:

- struct-of-arrays, fixed-capacity, masked state instead of pointer graphs
- batched/vmapped RANSAC hypothesis scoring instead of sequential early-exit
- a Schur-complement Levenberg-Marquardt bundle-adjustment engine (the g2o
  replacement) built from segment reductions + matrix-free PCG
- Hamming matching / FAST / BRIEF as vectorized integer kernels
- multi-chip scaling via `jax.sharding` meshes with psum/all_gather collectives

Reference capability map: see SURVEY.md (structural analysis of
zackLiuzz/MY_ORB_SLAM2, i.e. ORB-SLAM2, mounted at /root/reference).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (pose chains, Jacobian accumulation, Schur reduction) needs f32
# accuracy: on TPU the default matmul precision is bf16, which injects ~1e-3
# relative error into point transforms — unacceptable for centimeter-level
# ATE targets. Hot integer/robust kernels (Hamming popcount, SAD, BoW
# scoring) don't go through the MXU and are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

from my_orb_slam2_tpu.utils.config import SlamConfig  # noqa: F401
