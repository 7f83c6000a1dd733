"""Loop-closure machinery at KITTI scale on the real chip.

Probes the two map-wide solvers a loop closure triggers, at full static
capacity (KF=1536, P=262144, O=262144):
  - Sim3 essential-graph optimization (reference Optimizer.cc:787-1068)
  - global bundle adjustment          (reference Optimizer.cc:49-243)

Measured (single v5e chip via tunnel, warm):
  essential graph, 3 GN iters:  ~100 ms   (reference: seconds on CPU)
  global BA, per LM iter:       ~820 ms   (10-iter GBA ~8 s, async-safe)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_loop_scale.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    from my_orb_slam2_tpu.ops import ba, lie, pose_graph

    # --- essential graph at KF=1536 ---------------------------------------
    KF = 1536
    S = np.tile(np.eye(4, dtype=np.float32), (KF, 1, 1))
    T = np.eye(4)
    step = np.asarray(lie.se3_exp(jnp.asarray([0, 0, 0.5, 0, 2 * np.pi / KF, 0])))
    for k in range(KF):
        T = T @ step
        S[k] = np.linalg.inv(T).astype(np.float32)
    ei = np.concatenate([np.arange(KF - 1), [KF - 1]]).astype(np.int32)
    ej = np.concatenate([np.arange(1, KF), [0]]).astype(np.int32)
    Sji = np.stack([S[b] @ np.linalg.inv(S[a]) for a, b in zip(ei, ej)]).astype(np.float32)
    E = 4096
    em = np.zeros(E, bool); em[: len(ei)] = True
    ei_p = np.zeros(E, np.int32); ei_p[: len(ei)] = ei
    ej_p = np.zeros(E, np.int32); ej_p[: len(ej)] = ej
    Sji_p = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1)); Sji_p[: len(ei)] = Sji
    fixed = np.zeros(KF, bool); fixed[0] = True

    def run_pg():
        out = pose_graph.optimize_pose_graph(
            jnp.asarray(S), jnp.ones(KF, bool), jnp.asarray(fixed),
            jnp.asarray(ei_p), jnp.asarray(ej_p), jnp.asarray(Sji_p),
            jnp.asarray(em), n_iters=3, cg_iters=32, fix_scale=True,
        )
        jax.block_until_ready(out)
        return out

    out = run_pg()
    t0 = time.perf_counter(); out = run_pg()
    print(f"essential_graph_kf1536_3gn_ms={round((time.perf_counter()-t0)*1000)}")
    assert bool(jnp.isfinite(out).all())

    # --- global BA at C=1536, P=262144, O=262144 ---------------------------
    C, P, O = 1536, 262144, 262144
    rng = np.random.default_rng(0)
    fx = fy = 718.0; cx, cy, bf = 607.0, 185.0, 386.0
    pts = np.stack(
        [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 600, P)], 1
    ).astype(np.float32)
    cams = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    T = np.eye(4); step = np.asarray(lie.se3_exp(jnp.asarray([0, 0, 0.4, 0, 0.002, 0])))
    for c in range(C):
        T = T @ step
        cams[c] = np.linalg.inv(T).astype(np.float32)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    obs_pt = rng.integers(0, P, O).astype(np.int32)
    pc = np.einsum("oij,oj->oi", cams[obs_cam][:, :3, :3], pts[obs_pt]) + cams[obs_cam][:, :3, 3]
    z = np.maximum(pc[:, 2], 0.5)
    uv = np.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], 1).astype(np.float32)
    prob = ba.BAProblem(
        cam_Tcw=jnp.asarray(cams), cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        pt_pos=jnp.asarray(pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05),
        pt_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv), obs_ur=jnp.asarray(uv[:, 0] - bf / z),
        obs_inv_sigma2=jnp.ones(O), obs_mask=jnp.asarray(pc[:, 2] > 0.5),
    )

    def run_gba():
        out = ba.bundle_adjust(prob, fx, fy, cx, cy, bf, n_iters=2, cg_iters=48)
        jax.block_until_ready(out.cam_Tcw)
        return out

    out = run_gba()
    t0 = time.perf_counter(); out = run_gba()
    dt = time.perf_counter() - t0
    print(f"global_ba_per_lm_iter_ms={round(dt / 2 * 1000)}")
    assert bool(jnp.isfinite(out.cam_Tcw).all() & jnp.isfinite(out.pt_pos).all())
    print("LOOP SCALE PROBE OK")


if __name__ == "__main__":
    main()
