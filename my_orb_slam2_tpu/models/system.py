"""System facade: the user-facing entry point (reference src/System.cc).

Wires the Tracker, LocalMapper, KeyFrameDatabase, Relocalizer and LoopCloser
together and exposes the reference's public API surface
(include/System.h:63-124):

- track_stereo / track_rgbd / track_mono (per-frame entry points)
- activate/deactivate_localization_mode (tracking-only, no map mutation)
- reset, shutdown
- save_trajectory_tum / save_keyframe_trajectory_tum / save_trajectory_kitti
- get_tracking_state, get_tracked_map_points, map_changed
- save_map / load_map — a real feature here (npz snapshot of the SoA map);
  the reference left it as a TODO (include/System.h:116-118)

The reference decouples Tracking / LocalMapping / LoopClosing with three
threads + queues; on a single accelerator the device serializes compute
anyway, so the pipeline runs synchronously per keyframe with async dispatch
providing the overlap (see bench.py's pipelined loop).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import keyframe_db as kdb
from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.models.frame import FrameData, FrameFactory
from my_orb_slam2_tpu.models.local_mapping import LocalMapper
from my_orb_slam2_tpu.models.loop_closing import LoopCloser
from my_orb_slam2_tpu.models.relocalization import Relocalizer
from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState
from my_orb_slam2_tpu.ops import bow as bow_ops
from my_orb_slam2_tpu.ops import lie
from my_orb_slam2_tpu.utils.config import SlamConfig, Sensor


class _MappingChain:
    """Per-keyframe pipeline: local mapping -> keyframe database insert ->
    loop closing (the synchronous analog of the two consumer threads)."""

    def __init__(self, system: "SlamSystem"):
        self.sys = system
        self.n_docs = 0  # host mirror of db.n_docs (no device readback)
        self._db_add = None  # lazy fused words+insert dispatch

    def process(
        self, state: ms.MapState, kf_id: int, queue_pressure: bool = False
    ) -> ms.MapState:
        sys = self.sys
        if not sys.tracker.only_tracking:
            state = sys.local_mapper.process(state, kf_id, queue_pressure=queue_pressure)
            culled = getattr(sys.local_mapper, "last_culled_mask", None)
            if culled is not None:
                sys.db = kdb.erase_mask(sys.db, culled)
        # BoW insert (reference LocalMapping passes KFs on to LoopClosing,
        # which inserts into the database after processing). One fused
        # dispatch: eager `state.kf_desc[kf_id]` slices each cost ~5 ms of
        # device time through the tunnel (a materialized copy scheduled as
        # its own tiny program) — measured 3x the cost of the jitted
        # slice+transform+insert chain itself.
        if self._db_add is None:
            vocab = sys.vocab

            def _add(db, st, kf):
                return kdb.add_keyframe(
                    db, kf, vocab.words(st.kf_desc[kf]), st.kf_kp_valid[kf]
                )

            # Donating db lets XLA update the (KF, n_words) count matrix
            # row in place instead of copying it per insert.
            self._db_add = jax.jit(_add, donate_argnums=(0,))
        sys.db = self._db_add(sys.db, state, jnp.int32(kf_id))
        self.n_docs += 1
        if sys.enable_loop_closing and not sys.tracker.only_tracking:
            state, closed = sys.loop_closer.process(
                state, sys.db, kf_id, n_docs=self.n_docs
            )
            if closed:
                sys.map_change_idx += 1
        return state


class SlamSystem:
    def __init__(
        self,
        cfg: SlamConfig,
        use_images: bool = True,
        vocab=None,
        enable_loop_closing: bool = True,
        run_global_ba_on_loop: bool = True,
        capacity: Optional[int] = None,
        pipeline_depth: int = 0,
    ):
        """pipeline_depth > 0 enables pipelined tracking: per-frame readbacks
        resolve that many frames later so dispatches never wait on the
        host<->device round-trip (keyframe decisions lag accordingly, like
        the reference's asynchronous mapping thread). 0 = synchronous."""
        self.cfg = cfg
        self.factory = FrameFactory(cfg) if use_images else None
        if capacity is None:
            capacity = self.factory.capacity if use_images else cfg.orb.padded_n_features
        self.capacity = capacity
        if vocab is None:
            # Packed k=10/L=4 tree asset (the reference loads ORBvoc.txt
            # here, src/System.cc:64-72); LSH fallback if absent.
            from my_orb_slam2_tpu.utils.vocab_io import default_vocabulary

            vocab = default_vocabulary()
        self.vocab = vocab
        # Direct-index word-bucket gating (reference FeatureVector joins at
        # a fixed tree level): only meaningful for a real k-ary tree.
        from my_orb_slam2_tpu.ops.bow import TreeVocabulary

        # Direct-index GATE vocabulary: may differ from the place-recognition
        # vocabulary. The gate needs a view-STABLE coarse quantizer (true
        # correspondences must share a depth-2 bucket or triangulation
        # starves — measured: gating from the 100k L5 tree's depth-2 nodes
        # deterministically loses tracking on the KITTI-format driver E2E,
        # while the 10k L4 tree's buckets hold), whereas the database wants
        # a DISCRIMINATIVE fine one (the 100k tree: recall 1.0 at 2,080
        # rendered keyframes, VOCAB_SCALE_r05.json). The reference derives
        # both roles from one tree (FeatureVector at depth 2 of ORBvoc,
        # src/Frame.cc:425) — the roles split here because each is an
        # independent quantizer choice, not a semantic coupling.
        self.gate_vocab = vocab
        if isinstance(vocab, TreeVocabulary) and vocab.depth > 4:
            from my_orb_slam2_tpu.utils.vocab_io import (
                _FALLBACK_ASSET, load_packed,
            )

            if os.path.exists(_FALLBACK_ASSET):
                self.gate_vocab = load_packed(_FALLBACK_ASSET)
        if isinstance(self.gate_vocab, TreeVocabulary) and cfg.matcher.bow_gate_div == 0:
            import dataclasses

            # Buckets = the k^2 (=100 for k=10) tree nodes at depth 2, the
            # same ABSOLUTE depth the reference's direct index joins at
            # (transform(..., levelsup=4) on its L=6 tree -> depth 2,
            # src/Frame.cc:425): div = k^(L-2) leaf ids per depth-2 node.
            # SLAM_BOW_GATE_DIV overrides for ablation (0 keeps the auto).
            gv = self.gate_vocab
            div = int(os.environ.get("SLAM_BOW_GATE_DIV", "0") or 0)
            if div == 0:
                div = gv.k ** max(gv.depth - 2, 1)
            cfg = dataclasses.replace(
                cfg,
                matcher=dataclasses.replace(cfg.matcher, bow_gate_div=div),
            )
            self.cfg = cfg
        self.db = kdb.init_db(cfg.capacity.max_keyframes, capacity, self.vocab.n_words)
        self.local_mapper = LocalMapper(cfg)
        self.loop_closer = LoopCloser(cfg, self.vocab, run_global_ba=run_global_ba_on_loop)
        self.relocalizer = Relocalizer(cfg, self.vocab)
        self.enable_loop_closing = enable_loop_closing
        self.pipeline_depth = pipeline_depth
        self.tracker = Tracker(cfg, capacity, local_mapper=_MappingChain(self))
        if isinstance(self.gate_vocab, TreeVocabulary):
            # kf_words (stored per keypoint, consumed by the triangulation
            # and loop-join word-bucket gates) come from the GATE vocabulary
            # — see the gate_vocab comment above.
            self.tracker.vocab_pack = (
                self.gate_vocab.centers,
                self.gate_vocab.children,
                self.gate_vocab.leaf_word,
            )
            self.tracker.vocab_depth = self.gate_vocab.depth
        if pipeline_depth > 0:
            self.tracker.pipelined = True
            self.tracker.pipeline_depth = pipeline_depth
        self.map_change_idx = 0
        self.timing = []
        self._init_factory = None  # lazy 2x-feature mono-init extractor

    # -- per-frame entry points (reference System::Track*) -----------------

    def track_stereo(self, img_left, img_right, timestamp: float) -> dict:
        frame = self.factory.build_stereo(img_left, img_right)
        return self._track(frame, timestamp)

    def track_rgbd(self, img, depth, timestamp: float) -> dict:
        frame = self.factory.build_rgbd(img, depth)
        return self._track(frame, timestamp)

    def track_mono(self, img, timestamp: float) -> dict:
        # While monocular-uninitialized the reference extracts 2x features
        # (mpIniORBextractor, src/Tracking.cc:274-277): the initializer only
        # consumes level-0 keypoints, and the doubled budget is what makes
        # the 100-match bootstrap gate reachable. The initializer compacts
        # the two init frames back to the pipeline capacity on success.
        if self.tracker.state == TrackingState.NOT_INITIALIZED:
            if self._init_factory is None:
                import dataclasses

                orb2 = dataclasses.replace(
                    self.cfg.orb, n_features=2 * self.cfg.orb.n_features
                )
                self._init_factory = FrameFactory(
                    dataclasses.replace(self.cfg, orb=orb2)
                )
            frame = self._init_factory.build_mono(img)
        else:
            frame = self.factory.build_mono(img)
        return self._track(frame, timestamp)

    def track_frame_data(self, frame: FrameData, timestamp: float) -> dict:
        """Synthetic / precomputed-feature entry point (fake backend)."""
        return self._track(frame, timestamp)

    def _track(self, frame: FrameData, timestamp: float) -> dict:
        t0 = time.perf_counter()
        tr = self.tracker
        if tr.state == TrackingState.OK and tr.only_tracking and tr.mb_vo:
            # Localization-mode VO: the map lost sight of us — run
            # relocalization alongside VO tracking and let a successful
            # reloc win (reference src/Tracking.cc:386-421 runs both and
            # prefers the relocalization result).
            ok, Tcw, cur_mp, n, kf = self.relocalizer.relocalize(tr.map, self.db, frame)
            if ok:
                tr.reset_motion(Tcw)
                tr.last_frame = frame
                tr.last_mp = cur_mp
                tr.ref_kf = kf
                tr.last_reloc_frame_id = tr.frame_id
                tr._ref_pose_host = np.asarray(tr.map.kf_Tcw[kf])
                tr.mb_vo = False
        if tr.state == TrackingState.LOST:
            ok, Tcw, cur_mp, n, kf = self.relocalizer.relocalize(tr.map, self.db, frame)
            if ok:
                tr.state = TrackingState.OK
                tr.reset_motion(Tcw)
                tr.last_frame = frame
                tr.last_mp = cur_mp
                tr.ref_kf = kf
                tr.last_reloc_frame_id = tr.frame_id
                tr._ref_pose_host = np.asarray(tr.map.kf_Tcw[kf])
        info = tr.track(frame, timestamp)
        if self.enable_loop_closing:
            # Advance a pending asynchronous global BA by one LM iteration
            # per frame; fold the result in when it completes (reference
            # GBA thread + propagation, src/LoopClosing.cc:759-865).
            tr.map, applied = self.loop_closer.tick(tr.map)
            if applied:
                self.map_change_idx += 1
                info["gba_applied"] = True
        if tr.needs_reset:
            # Lost within the first keyframes: restart from scratch
            # (reference src/Tracking.cc:519-527 "Track lost soon after
            # initialisation, reseting...").
            self.reset()
            info["reset"] = True
        info["track_ms"] = (time.perf_counter() - t0) * 1000.0
        self.timing.append(info["track_ms"])
        return info

    # -- modes / control (reference System.h:79-97) ------------------------

    def activate_localization_mode(self):
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        self.tracker.only_tracking = False

    def reset(self):
        cfg = self.cfg
        self.db = kdb.init_db(
            cfg.capacity.max_keyframes, self.capacity, self.vocab.n_words
        )
        self.tracker = Tracker(cfg, self.capacity, local_mapper=_MappingChain(self))
        if self.pipeline_depth > 0:
            self.tracker.pipelined = True
            self.tracker.pipeline_depth = self.pipeline_depth
        self.loop_closer = LoopCloser(cfg, self.vocab)
        self.map_change_idx += 1

    def shutdown(self):
        self.tracker.flush()  # drain in-flight pipelined frames
        if self.enable_loop_closing and not self.tracker.only_tracking:
            # Resolve detections still in the loop closer's readback pipeline
            # (the last detect_depth keyframes of the sequence).
            self.tracker.map, closed = self.loop_closer.drain(self.tracker.map)
            if closed:
                self.map_change_idx += 1
            # Run any in-flight chunked global BA to completion (the
            # reference joins its GBA thread on Shutdown, src/System.cc:301).
            while self.loop_closer.pending_gba is not None:
                self.tracker.map, applied = self.loop_closer.tick(self.tracker.map)
                if applied:
                    self.map_change_idx += 1

    def get_tracking_state(self) -> int:
        return self.tracker.state

    def get_tracked_map_points(self):
        lm = self.tracker.last_mp
        return np.asarray(lm)[np.asarray(lm) >= 0] if lm is not None else np.array([])

    def map_changed(self) -> bool:
        idx = self.map_change_idx
        changed = getattr(self, "_last_seen_change", -1) < idx
        self._last_seen_change = idx
        return changed

    # -- trajectory export (reference System.cc:322-472) -------------------

    def save_trajectory_tum(self, path: str):
        """TUM format: `t tx ty tz qx qy qz qw` per frame (camera-to-world)."""
        with open(path, "w") as f:
            for fid, ts, Tcw, lost in self.tracker.trajectory_poses():
                if lost:
                    continue
                Twc = np.linalg.inv(Tcw)
                q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.tracker.map
        valid = np.asarray(m.kf_valid)
        ts_all = np.asarray(m.kf_timestamp)
        Tcw_all = np.asarray(m.kf_Tcw)
        with open(path, "w") as f:
            for k in np.nonzero(valid)[0]:
                Twc = np.linalg.inv(Tcw_all[k])
                q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                f.write(
                    f"{ts_all[k]:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 entries of the 3x4 camera-to-world matrix."""
        with open(path, "w") as f:
            for fid, ts, Tcw, lost in self.tracker.trajectory_poses():
                Twc = np.linalg.inv(Tcw)
                r = Twc[:3, :4].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in r) + "\n")

    # -- map persistence (reference TODO System.h:116-118) -----------------

    def save_map(self, path: str, include_session: bool = True):
        """Snapshot the map + BoW database (+ optionally the live tracking
        session: trajectory log, pose, ids) to one npz. The reference left
        SaveMap as a TODO (include/System.h:116-118); here it doubles as a
        checkpoint enabling restarts mid-sequence."""
        tr = self.tracker
        tr.flush()
        m = tr.map
        arrays = {f: np.asarray(getattr(m, f)) for f in m._fields}
        db_arrays = {f"db_{f}": np.asarray(getattr(self.db, f)) for f in self.db._fields}
        sess = {}
        if include_session:
            traj = tr.trajectory
            sess = {
                "sess_scalars": np.asarray(
                    [tr.state, tr.frame_id, tr.last_kf_frame_id, tr.ref_kf,
                     tr.n_kf, tr.kf_counter, tr.last_reloc_frame_id],
                    np.int64,
                ),
                "sess_Tcw": tr.Tcw,
                "sess_ref_pose": getattr(tr, "_ref_pose_host", np.eye(4, dtype=np.float32)),
                "sess_traj_fid": np.asarray([t[0] for t in traj], np.int64),
                "sess_traj_ts": np.asarray([t[1] for t in traj], np.float64),
                "sess_traj_ref": np.asarray([t[2] for t in traj], np.int64),
                "sess_traj_Trel": (
                    np.stack([t[3] for t in traj]) if traj else np.zeros((0, 4, 4), np.float32)
                ),
                "sess_traj_lost": np.asarray([t[4] for t in traj], bool),
            }
        np.savez_compressed(path, **arrays, **db_arrays, **sess)

    def load_map(self, path: str):
        data = np.load(path)
        m = self.tracker.map
        tr = self.tracker
        vals = {}
        missing = False
        for f in m._fields:
            if f in data:
                vals[f] = jnp.asarray(data[f])
            else:  # snapshot from an older schema: take the initial value
                vals[f] = getattr(m, f)
                missing = True
        tr.map = ms.MapState(**vals)
        if missing:
            # derive the inverted observation index etc. from kf_mp
            tr.map = ms.rebuild_obs_index(tr.map)
        if all(f"db_{f}" in data for f in self.db._fields):
            self.db = kdb.KfDatabase(
                **{f: jnp.asarray(data[f"db_{f}"]) for f in self.db._fields}
            )
        else:
            # snapshot from an older db schema: rebuild the database by
            # re-encoding every live keyframe's descriptors
            self.db = kdb.init_db(
                tr.map.kf_valid.shape[0], tr.map.kf_desc.shape[1],
                self.vocab.n_words,
            )
            for k in np.nonzero(np.asarray(tr.map.kf_valid))[0]:
                words = self.vocab.words(tr.map.kf_desc[int(k)])
                self.db = kdb.add_keyframe(
                    self.db, jnp.int32(int(k)), words,
                    tr.map.kf_kp_valid[int(k)],
                )
        tr.n_kf = int(tr.map.n_kf)
        if "sess_scalars" in data:
            s = data["sess_scalars"]
            tr.state = int(s[0])
            tr.frame_id = int(s[1])
            tr.last_kf_frame_id = int(s[2])
            tr.ref_kf = int(s[3])
            tr.n_kf = int(s[4])
            tr.kf_counter = int(s[5])
            tr.last_reloc_frame_id = int(s[6])
            tr.reset_motion(data["sess_Tcw"])
            tr._ref_pose_host = data["sess_ref_pose"]
            tr.trajectory = [
                (int(f), float(t), int(r), T, bool(l))
                for f, t, r, T, l in zip(
                    data["sess_traj_fid"], data["sess_traj_ts"],
                    data["sess_traj_ref"], data["sess_traj_Trel"],
                    data["sess_traj_lost"],
                )
            ]
            # Resuming mid-run: the motion model and last-frame association
            # are gone — continue via reference-KF tracking / relocalization,
            # exactly like the reference after a tracking gap.
            if tr.state == TrackingState.OK:
                tr.state = TrackingState.LOST

    # -- stats -------------------------------------------------------------

    def timing_summary(self) -> dict:
        t = np.asarray(self.timing[4:]) if len(self.timing) > 8 else np.asarray(self.timing)
        return {
            "median_ms": float(np.median(t)) if len(t) else 0.0,
            "mean_ms": float(np.mean(t)) if len(t) else 0.0,
        }
