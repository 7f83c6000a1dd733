"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Replaces the reference example mains' ad-hoc loaders
(Examples/Monocular/mono_tum.cc LoadImages, Examples/Stereo/stereo_kitti.cc,
Examples/RGB-D/rgbd_tum.cc association pairing,
Examples/Stereo/stereo_euroc.cc online rectification).

Each loader yields (data..., timestamp) tuples and exposes `frames()` as a
generator so drivers can stream without holding a sequence in memory.
Image decoding uses OpenCV when available (host-side IO only — the compute
path never touches cv2), with a PGM/PPM numpy fallback.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


def _stream_images(paths: list[str], n_threads: int = 3, window: int = 12):
    """Yield decoded grayscale frames, using the native C++ prefetcher when
    built (decode happens in worker threads ahead of the consumer), else
    synchronous per-frame decode."""
    try:
        from my_orb_slam2_tpu.utils import native_io

        if native_io.available():
            pf = native_io.NativePrefetcher(paths, n_threads=n_threads, window=window)
            try:
                for i in range(len(paths)):
                    img = pf.get(i)
                    yield img if img is not None else _imread_gray(paths[i])
            finally:
                pf.close()
            return
    except Exception:
        pass
    for p in paths:
        yield _imread_gray(p)


def _imread_gray(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        return _read_pnm(path)


def _imread_depth(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        return _read_pnm(path)


def _read_pnm(path: str) -> np.ndarray:
    """Minimal PGM/PPM (P2/P3/P5/P6) reader."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        def next_token():
            tok = b""
            while True:
                c = f.read(1)
                if c in b" \t\r\n":
                    if tok:
                        return tok
                elif c == b"#":
                    f.readline()
                else:
                    tok += c
        w = int(next_token()); h = int(next_token()); maxv = int(next_token())
        dtype = np.uint8 if maxv < 256 else np.dtype(">u2")
        if magic in (b"P5", b"P6"):
            ch = 1 if magic == b"P5" else 3
            data = np.frombuffer(f.read(), dtype=dtype, count=w * h * ch)
            img = data.reshape(h, w, ch) if ch == 3 else data.reshape(h, w)
        else:
            data = np.loadtxt(f, dtype=np.int32).reshape(h, -1)
            img = data.astype(dtype)
        if img.ndim == 3:
            img = img.mean(axis=2).astype(dtype)
        return np.asarray(img)


class TumRgbdDataset:
    """TUM RGB-D: rgb.txt + depth.txt paired by nearest timestamp, or a
    precomputed association file (reference rgbd_tum.cc:LoadImages)."""

    def __init__(self, seq_dir: str, association_file: Optional[str] = None,
                 max_dt: float = 0.02):
        self.dir = seq_dir
        if association_file and os.path.exists(association_file):
            self.pairs = []
            for line in open(association_file):
                if line.startswith("#"):
                    continue
                p = line.split()
                if len(p) >= 4:
                    self.pairs.append((float(p[0]), p[1], p[3]))
        else:
            rgb = self._read_list(os.path.join(seq_dir, "rgb.txt"))
            depth = self._read_list(os.path.join(seq_dir, "depth.txt"))
            d_ts = np.array([t for t, _ in depth])
            self.pairs = []
            for t, rp in rgb:
                j = int(np.argmin(np.abs(d_ts - t)))
                if abs(d_ts[j] - t) < max_dt:
                    self.pairs.append((t, rp, depth[j][1]))

    @staticmethod
    def _read_list(path):
        out = []
        for line in open(path):
            if line.startswith("#"):
                continue
            p = line.split()
            if len(p) >= 2:
                out.append((float(p[0]), p[1]))
        return out

    def __len__(self):
        return len(self.pairs)

    def frames(self) -> Iterator[tuple]:
        rgb_paths = [os.path.join(self.dir, r) for _, r, _ in self.pairs]
        depth_paths = [os.path.join(self.dir, d) for _, _, d in self.pairs]
        for (t, _, _), rgb, depth in zip(
            self.pairs, _stream_images(rgb_paths), _stream_images(depth_paths)
        ):
            yield rgb, depth, t


class TumMonoDataset(TumRgbdDataset):
    def frames(self):
        for t, rgb_rel, _ in self.pairs:
            yield _imread_gray(os.path.join(self.dir, rgb_rel)), t


class KittiStereoDataset:
    """KITTI odometry: image_0/image_1 + times.txt
    (reference stereo_kitti.cc:LoadImages)."""

    def __init__(self, seq_dir: str):
        self.dir = seq_dir
        self.times = [float(x) for x in open(os.path.join(seq_dir, "times.txt"))]
        self.left = sorted(os.listdir(os.path.join(seq_dir, "image_0")))

    def __len__(self):
        return len(self.left)

    def frames(self):
        lp = [os.path.join(self.dir, "image_0", n) for n in self.left]
        rp = [os.path.join(self.dir, "image_1", n) for n in self.left]
        for i, (l, r) in enumerate(zip(_stream_images(lp), _stream_images(rp))):
            yield l, r, self.times[i] if i < len(self.times) else i / 10.0


class EurocStereoDataset:
    """EuRoC MAV: cam0/cam1 with a timestamp file + optional stereo
    rectification maps from the YAML LEFT/RIGHT K,D,R,P blocks
    (reference stereo_euroc.cc:72-137)."""

    def __init__(self, cam0_dir: str, cam1_dir: str, timestamp_file: str,
                 rectify: Optional[dict] = None):
        self.cam0 = cam0_dir
        self.cam1 = cam1_dir
        self.stamps = []
        for line in open(timestamp_file):
            s = line.strip()
            if s and not s.startswith("#"):
                self.stamps.append(s.split(",")[0].split(".")[0])
        self.maps = None
        if rectify is not None:
            import cv2

            m0 = cv2.initUndistortRectifyMap(
                rectify["K_l"], rectify["D_l"], rectify["R_l"],
                rectify["P_l"][:3, :3], tuple(rectify["size"]), cv2.CV_32F,
            )
            m1 = cv2.initUndistortRectifyMap(
                rectify["K_r"], rectify["D_r"], rectify["R_r"],
                rectify["P_r"][:3, :3], tuple(rectify["size"]), cv2.CV_32F,
            )
            self.maps = (m0, m1)

    def __len__(self):
        return len(self.stamps)

    def frames(self):
        import glob

        for s in self.stamps:
            p0 = os.path.join(self.cam0, s + ".png")
            p1 = os.path.join(self.cam1, s + ".png")
            l = _imread_gray(p0)
            r = _imread_gray(p1)
            if self.maps is not None:
                import cv2

                l = cv2.remap(l, *self.maps[0], cv2.INTER_LINEAR)
                r = cv2.remap(r, *self.maps[1], cv2.INTER_LINEAR)
            yield l, r, float(s) * 1e-9
