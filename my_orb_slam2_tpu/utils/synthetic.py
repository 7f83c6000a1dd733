"""Synthetic trajectory simulator — the test fake backend.

The reference has no test infrastructure (SURVEY.md §4); its quality gate is
"run a dataset and eyeball the trajectory". This module replaces datasets
for unit/integration tests: a random 3D landmark field plus a camera path,
projected through the pinhole model with configurable noise, dropout and
per-landmark synthetic ORB descriptors (stable across frames so Hamming
matching behaves like real tracking).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from my_orb_slam2_tpu.models.frame import FrameData
from my_orb_slam2_tpu.ops import lie
from my_orb_slam2_tpu.utils.config import SlamConfig


class SyntheticWorld:
    def __init__(
        self,
        cfg: SlamConfig,
        n_landmarks: int = 2000,
        seed: int = 0,
        extent=(20.0, 8.0, 30.0),
        depth_range=(2.0, 40.0),
    ):
        self.cfg = cfg
        rng = np.random.default_rng(seed)
        self.rng = rng
        # Landmarks in a box around/ahead of the initial camera.
        self.landmarks = np.stack(
            [
                rng.uniform(-extent[0], extent[0], n_landmarks),
                rng.uniform(-extent[1], extent[1], n_landmarks),
                rng.uniform(depth_range[0], depth_range[1], n_landmarks),
            ],
            axis=1,
        )
        # Stable random descriptor per landmark + small per-observation noise.
        self.desc = rng.integers(0, 2 ** 32, size=(n_landmarks, 8), dtype=np.uint32)
        # A distinguishable per-landmark "scale" so octaves vary.
        self.base_octave = rng.integers(0, 3, n_landmarks)
        # Physical scale model: the octave a landmark is detected at follows
        # its distance (a feature detected at octave o at distance d appears
        # at octave o+1 at distance d/1.2), exactly like a real pyramid
        # detector. z_ref anchors each landmark at base_octave when seen
        # from the origin — this keeps PredictScale / the motion-model
        # octave windows consistent across the synthetic sequence.
        self.z_ref = np.maximum(
            np.linalg.norm(self.landmarks, axis=1), 1.0
        ) * (1.2 ** self.base_octave)
        # Fixed per-landmark detection priority (the "corner response"):
        # frames select the strongest visible landmarks, so overlapping
        # frames share most of their keypoints like a real extractor.
        self.priority = rng.random(n_landmarks)

    def circular_trajectory(self, n_frames: int, radius: float = 5.0,
                            forward_per_frame: float = 0.06, yaw_per_frame: float = 0.0):
        """Simple forward motion with optional yaw; returns (n, 4, 4) Tcw."""
        poses = []
        Twc = np.eye(4)
        for i in range(n_frames):
            d = np.array([0.0, 0.0, forward_per_frame])
            Twc = Twc @ np.asarray(
                lie.se3_from_Rt(
                    np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw_per_frame, 0.0]))),
                    d,
                )
            )
            poses.append(np.linalg.inv(Twc))
        return np.stack(poses)

    def observe(
        self,
        Tcw: np.ndarray,
        capacity: int,
        noise_px: float = 0.3,
        desc_noise_bits: int = 4,
        dropout: float = 0.05,
        stereo: bool = True,
        stereo_fraction: float = 1.0,
        seed: int | None = None,
    ) -> tuple[FrameData, np.ndarray]:
        """Render a FrameData of up to `capacity` visible landmarks.

        Returns (frame, landmark_ids (capacity,) — ground-truth landmark per
        keypoint slot, -1 for padding).
        """
        cam = self.cfg.camera
        rng = np.random.default_rng(seed) if seed is not None else self.rng
        pc = self.landmarks @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = cam.fx * pc[:, 0] / z + cam.cx
            v = cam.fy * pc[:, 1] / z + cam.cy
        vis = (z > 0.3) & (u >= 10) & (u < cam.width - 10) & (v >= 10) & (v < cam.height - 10)
        vis &= rng.random(len(z)) > dropout
        ids = np.nonzero(vis)[0]
        # Strongest-first selection (stable across frames).
        ids = ids[np.argsort(-self.priority[ids])][:capacity]
        k = len(ids)

        uv = np.zeros((capacity, 2), np.float32)
        ur = np.full((capacity,), -1.0, np.float32)
        depth = np.full((capacity,), -1.0, np.float32)
        octave = np.zeros((capacity,), np.int32)
        angle = np.zeros((capacity,), np.float32)
        desc = np.zeros((capacity, 8), np.uint32)
        valid = np.zeros((capacity,), bool)
        lm = np.full((capacity,), -1, np.int32)

        uv[:k, 0] = u[ids] + rng.normal(0, noise_px, k)
        uv[:k, 1] = v[ids] + rng.normal(0, noise_px, k)
        if stereo:
            has_st = rng.random(k) < stereo_fraction
            ur[:k] = np.where(
                has_st,
                uv[:k, 0] - cam.bf / z[ids] + rng.normal(0, noise_px, k),
                -1.0,
            )
            depth[:k] = np.where(
                has_st, cam.bf / np.maximum(uv[:k, 0] - ur[:k], 1e-6), -1.0
            )
        with np.errstate(divide="ignore", invalid="ignore"):
            oct_f = np.log(self.z_ref[ids] / np.maximum(z[ids], 0.1)) / np.log(
                self.cfg.orb.scale_factor
            )
        octave[:k] = np.clip(
            np.round(oct_f).astype(np.int32), 0, self.cfg.orb.n_levels - 1
        )
        d = self.desc[ids].copy()
        # flip a few random bits per observation
        for _ in range(desc_noise_bits):
            word = rng.integers(0, 8, k)
            bit = rng.integers(0, 32, k).astype(np.uint32)
            d[np.arange(k), word] ^= (np.uint32(1) << bit)
        desc[:k] = d
        valid[:k] = True
        lm[:k] = ids
        frame = FrameData(
            uv=jnp.asarray(uv), ur=jnp.asarray(ur), depth=jnp.asarray(depth),
            octave=jnp.asarray(octave), angle=jnp.asarray(angle),
            desc=jnp.asarray(desc), valid=jnp.asarray(valid),
        )
        return frame, lm


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True,
             align_scale: bool = False) -> float:
    """Absolute trajectory error (RMSE of translation) after optional SE3
    alignment (Horn), the TUM evaluation metric used by the reference's
    baselines (BASELINE.md). align_scale=True additionally aligns the
    similarity scale — the monocular evaluation convention (the reference's
    mono baselines are scale-aligned, BASELINE.md)."""
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est_poses])
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt_poses])
    if align:
        from my_orb_slam2_tpu.ops.horn import horn_align

        R, t, s = horn_align(
            jnp.asarray(gt_c), jnp.asarray(est_c), fix_scale=not align_scale
        )
        est_c = float(s) * (est_c @ np.asarray(R).T) + np.asarray(t)
    err = est_c - gt_c
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))
