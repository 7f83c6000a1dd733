"""Feature front-end tests: FAST vs OpenCV, descriptor invariance, stereo."""

import numpy as np
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.ops.frontend import (
    OrbExtractor,
    fast_score_map,
    nms3x3,
    blur_shift_add,
    hamming_distance,
)
from my_orb_slam2_tpu.utils.config import OrbConfig

cv2 = pytest.importorskip("cv2")


def make_texture(rng, h=480, w=640):
    img = rng.uniform(0, 60, (h, w)).astype(np.float32)
    # blobs
    for _ in range(300):
        y, x = rng.integers(20, h - 20), rng.integers(20, w - 20)
        s = rng.integers(2, 6)
        img[y - s : y + s, x - s : x + s] = rng.uniform(80, 255)
    return img


def test_fast_matches_opencv(rng):
    img = make_texture(rng)
    th = 20
    score = np.asarray(fast_score_map(jnp.asarray(img), float(th)))
    ours = set(zip(*np.nonzero(score > 0)))
    fast = cv2.FastFeatureDetector_create(threshold=th, nonmaxSuppression=False)
    kps = fast.detect(img.astype(np.uint8), None)
    theirs = set((int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps)
    # Compare on the interior (cv2 has its own border handling).
    interior = lambda s: {(y, x) for (y, x) in s if 10 <= y < 470 and 10 <= x < 630}
    ours_i, theirs_i = interior(ours), interior(theirs)
    inter = len(ours_i & theirs_i)
    union = len(ours_i | theirs_i)
    iou = inter / max(union, 1)
    assert iou > 0.9, f"FAST corner IoU vs OpenCV: {iou} ({len(ours_i)} vs {len(theirs_i)})"


def test_extractor_basic(rng):
    img = make_texture(rng)
    ex = OrbExtractor(OrbConfig(n_features=500), 480, 640)
    kps, atlas = ex(jnp.asarray(img))
    n = int(kps.valid.sum())
    assert n > 300, n
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 640).all()
    assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 480).all()
    # multiple octaves populated
    octs = np.asarray(kps.octave)[np.asarray(kps.valid)]
    assert len(np.unique(octs)) >= 3


def test_descriptor_rotation_invariance(rng):
    """Descriptors should be stable under in-plane rotation of the image."""
    img = make_texture(rng)
    h, w = img.shape
    angle = 30.0
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    img_rot = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    ex = OrbExtractor(OrbConfig(n_features=500), h, w)
    k1, _ = ex(jnp.asarray(img))
    k2, _ = ex(jnp.asarray(img_rot))
    # Ground-truth correspondence by rotating k1 positions.
    uv1 = np.asarray(k1.uv)
    uv1_h = np.concatenate([uv1, np.ones((len(uv1), 1))], axis=1)
    uv1_in2 = uv1_h @ M.T  # (K, 2)
    uv2 = np.asarray(k2.uv)
    v1 = np.asarray(k1.valid)
    v2 = np.asarray(k2.valid)
    d = np.asarray(hamming_distance(k1.desc, k2.desc))
    matched = same = 0
    for i in np.nonzero(v1)[0]:
        dist2 = np.linalg.norm(uv2 - uv1_in2[i], axis=1)
        dist2[~v2] = 1e9
        j = np.argmin(dist2)
        if dist2[j] < 2.0:  # same physical corner
            matched += 1
            if d[i, j] < 80:
                same += 1
    assert matched > 50, matched
    frac = same / matched
    assert frac > 0.7, f"rotation-invariant match fraction {frac} ({same}/{matched})"


def test_descriptor_distinctiveness(rng):
    img = make_texture(rng)
    ex = OrbExtractor(OrbConfig(n_features=500), 480, 640)
    kps, _ = ex(jnp.asarray(img))
    v = np.asarray(kps.valid)
    d = np.asarray(hamming_distance(kps.desc, kps.desc)).astype(float)
    d_valid = d[np.ix_(v, v)]
    np.fill_diagonal(d_valid, np.nan)
    # Random distinct corners should be far apart in Hamming space.
    assert np.nanmean(d_valid) > 80, np.nanmean(d_valid)


def test_stereo_depth_accuracy(rng):
    """Render a stereo pair of known-depth blobs; matched depths must agree."""
    from my_orb_slam2_tpu.utils.config import SlamConfig, CameraConfig, Sensor
    from my_orb_slam2_tpu.models.frame import FrameFactory

    H, W = 480, 640
    fx = fy = 500.0
    cx, cy, bf = 320.0, 240.0, 40.0
    n = 300
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(3, 15, n)], 1
    )
    inten = rng.uniform(80, 255, n)

    base = rng.uniform(0, 40, (H, W)).astype(np.float32)

    def render(shift):
        # Anti-aliased Gaussian splats at sub-pixel positions: integer
        # painting would quantize the true disparity by up to 1px, which at
        # 4px disparity is a 25% depth error in the *ground truth*.
        img = base.copy()
        u = fx * (pts[:, 0] - shift) / pts[:, 2] + cx
        v = fy * pts[:, 1] / pts[:, 2] + cy
        for i in range(n):
            if 20 < u[i] < W - 20 and 20 < v[i] < H - 20:
                ui, vi = int(round(u[i])), int(round(v[i]))
                s = 4
                yy, xx = np.mgrid[vi - s : vi + s + 1, ui - s : ui + s + 1]
                sig = 1.2 + 0.3 * (i % 3)
                img[vi - s : vi + s + 1, ui - s : ui + s + 1] += inten[i] * np.exp(
                    -(((xx - u[i]) ** 2 + (yy - v[i]) ** 2) / (2 * sig * sig))
                )
        return np.clip(img, 0, 255)

    imL, imR = render(0.0), render(bf / fx)
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=fx, fy=fy, cx=cx, cy=cy, bf=bf, width=W, height=H),
        orb=OrbConfig(n_features=500),
    )
    f = FrameFactory(cfg)
    frame = f.build_stereo(imL, imR)
    uv = np.asarray(frame.uv)
    depth = np.asarray(frame.depth)
    valid = np.asarray(frame.valid) & (depth > 0)
    assert valid.sum() > 80, valid.sum()
    # For each matched keypoint, find the nearest rendered blob; depth err.
    errs, errs_close = [], []
    u_gt = fx * pts[:, 0] / pts[:, 2] + cx
    v_gt = fy * pts[:, 1] / pts[:, 2] + cy
    for i in np.nonzero(valid)[0]:
        d2 = (u_gt - uv[i, 0]) ** 2 + (v_gt - uv[i, 1]) ** 2
        j = np.argmin(d2)
        if d2[j] < 9.0:
            rel = abs(depth[i] - pts[j, 2]) / pts[j, 2]
            errs.append(rel)
            if pts[j, 2] < 6.0:
                errs_close.append(rel)
    assert len(errs) > 50
    # Keypoints are integer-pixel (FAST, same as the reference), so the left
    # coordinate alone carries +-0.5px disparity quantization: at z=9m
    # (disparity ~4.4px) that bounds relative depth error around 7%.
    assert np.median(errs) < 0.10, np.median(errs)
    assert np.median(errs_close) < 0.05, np.median(errs_close)
