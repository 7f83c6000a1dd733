"""Per-frame feature container + frame builders.

Replaces reference Frame (src/Frame.cc): a Frame here is a plain pytree of
fixed-capacity arrays (`FrameData`), produced either by the image front-end
(`FrameFactory`, wrapping ORB extraction + stereo/RGB-D depth association,
reference src/Frame.cc:72-241) or by the synthetic simulator
(utils/synthetic.py) for dataset-free pipeline tests.

The reference's 64x48 feature grid (AssignFeaturesToGrid,
src/Frame.cc:243-258) has no analog: candidate windowing on TPU is done by
dense masked distance tests in the matcher, which is cheaper than gather-by-
bucket at these sizes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops.frontend import GAP, OrbExtractor
from my_orb_slam2_tpu.ops import stereo as stereo_ops
from my_orb_slam2_tpu.utils.config import SlamConfig


class FrameData(NamedTuple):
    """Fixed-capacity per-frame features (N = padded keypoint capacity)."""

    uv: jnp.ndarray  # (N, 2) undistorted level-0 pixel coords
    ur: jnp.ndarray  # (N,) stereo right-u, -1 if none
    depth: jnp.ndarray  # (N,) keypoint depth, -1 if unknown
    octave: jnp.ndarray  # (N,) i32
    angle: jnp.ndarray  # (N,) f32 radians
    desc: jnp.ndarray  # (N, 8) u32
    valid: jnp.ndarray  # (N,) bool


class FrameFactory:
    """Builds FrameData from images; jitted per sensor type."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        cam = cfg.camera
        self.extractor = OrbExtractor(cfg.orb, cam.height, cam.width)
        self.capacity = self.extractor.capacity
        self._stereo = jax.jit(self._build_stereo_impl)
        self._rgbd = jax.jit(self._build_rgbd_impl)
        self._mono = jax.jit(self._build_mono_impl)

    # -- builders ----------------------------------------------------------

    def _undistort(self, uv):
        cam = self.cfg.camera
        if cam.k1 == cam.k2 == cam.p1 == cam.p2 == cam.k3 == 0.0:
            return uv
        from my_orb_slam2_tpu.ops.projection import undistort_points

        return undistort_points(
            uv, cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2, cam.p1, cam.p2, cam.k3
        )

    def _build_stereo_impl(self, imgL, imgR):
        cam = self.cfg.camera
        ex = self.extractor
        # Two sequential extractions inside ONE jit: measured faster than a
        # vmapped batch (XLA interleaves the independent programs; vmapping
        # pessimizes the patch slice-gathers into batched gathers).
        kpsL, atlasL = ex._extract_impl(imgL)
        kpsR, atlasR = ex._extract_impl(imgR)
        u_right, depth = stereo_ops.match_stereo(
            kpsL.uv,
            kpsL.uv_level,
            kpsL.octave,
            kpsL.valid,
            kpsR.uv,
            kpsR.octave,
            kpsR.valid,
            kpsL.desc,
            kpsR.desc,
            atlasL,
            atlasR,
            ex.level_offsets,
            ex.level_w,
            ex.level_h,
            ex.scale_factors,
            min_d=0.0,
            max_d=cam.fx,
            bf=cam.bf,
            col_offset=GAP,  # atlas column margin
        )
        uv = self._undistort(kpsL.uv)
        return FrameData(
            uv=uv,
            ur=u_right,
            depth=depth,
            octave=kpsL.octave,
            angle=kpsL.angle,
            desc=kpsL.desc,
            valid=kpsL.valid,
        )

    def _build_rgbd_impl(self, img, depth_map):
        cam = self.cfg.camera
        kps, _ = self.extractor._extract_impl(img)
        u_right, depth = stereo_ops.depth_to_uright(
            kps.uv, kps.valid, depth_map, cam.depth_map_factor, cam.bf
        )
        uv = self._undistort(kps.uv)
        return FrameData(
            uv=uv, ur=u_right, depth=depth, octave=kps.octave,
            angle=kps.angle, desc=kps.desc, valid=kps.valid,
        )

    def _build_mono_impl(self, img):
        kps, _ = self.extractor._extract_impl(img)
        n = kps.uv.shape[0]
        uv = self._undistort(kps.uv)
        return FrameData(
            uv=uv,
            ur=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0),
            octave=kps.octave,
            angle=kps.angle,
            desc=kps.desc,
            valid=kps.valid,
        )

    def build_stereo(self, imgL, imgR) -> FrameData:
        # Keep the host->device transfer narrow: uint8 images upload 4x less
        # than float32 (the extractor casts on device).
        return self._stereo(jnp.asarray(imgL), jnp.asarray(imgR))

    def build_rgbd(self, img, depth) -> FrameData:
        return self._rgbd(jnp.asarray(img), jnp.asarray(depth, jnp.float32))

    def build_mono(self, img) -> FrameData:
        return self._mono(jnp.asarray(img))
