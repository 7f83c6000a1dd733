"""Multi-process distributed-optimizer harness — the "fake cluster" of
SURVEY §4.

Spawns N separate Python processes on the CPU backend; each becomes one
`jax.distributed` process with ONE local device, so the mesh spans real
process boundaries (the CPU stand-in for N TPU hosts: collectives cross the
distributed runtime, not shared memory). Two workloads:

- ba: camera-sharded (map-partitioned) distributed bundle adjustment
  (parallel/dist_ba.py) on a seeded synthetic problem; result checked
  against the single-process solver.
- pg: edge-sharded Sim3 pose graph (parallel/dist_pose_graph.py) on a
  seeded drifted loop; result checked against the single-process solver.

Usage (parent):
  python tools/dist_fake_cluster.py [--sizes 1,2] [--kind ba|pg|both]
      [--cams 64] [--pts 6000] [--obs-per-cam 0 (uncapped)] [--json out.json]
Internal (child):
  python tools/dist_fake_cluster.py --child I --procs N --port P ...

NOTE on efficiency numbers: this box has 2 host CPUs — runs with N > 2
oversubscribe cores and measure correctness + communication overhead, not
genuine scaling. The methodology field in the JSON says so.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 7
FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 40.0
BA_ITERS = 8
PG_ITERS = 15


def build_problem(n_cams: int, n_pts: int, obs_per_cam: int):
    """Seeded synthetic BA problem, identical in every process."""
    import jax.numpy as jnp

    from my_orb_slam2_tpu.ops import lie
    from my_orb_slam2_tpu.ops.ba import BAProblem

    rng = np.random.default_rng(SEED)
    # Landmarks along the camera path so every camera sees structure even
    # at KITTI-window camera counts.
    span = 0.1 * n_cams + 30.0
    pts = np.stack(
        [
            rng.uniform(-8, 8, n_pts),
            rng.uniform(-3, 3, n_pts),
            rng.uniform(1.0, span, n_pts),
        ],
        axis=1,
    )
    cams_true = []
    for i in range(n_cams):
        xi = np.concatenate([[0.0, 0.0, 0.1 * i], rng.normal(size=3) * 0.01])
        cams_true.append(np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float32))
    obs_cam, obs_pt, obs_uv, obs_ur = [], [], [], []
    for c, T in enumerate(cams_true):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = FX * pc[:, 0] / z + CX + rng.normal(0, 0.4, n_pts)
            v = FY * pc[:, 1] / z + CY + rng.normal(0, 0.4, n_pts)
        sel = (z > 0.5) & (z < 40.0) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        idx = np.nonzero(sel)[0]
        if obs_per_cam and len(idx) > obs_per_cam:
            idx = idx[np.argsort(z[idx])[:obs_per_cam]]
        obs_cam.extend([c] * len(idx))
        obs_pt.extend(idx.tolist())
        obs_uv.extend(np.stack([u[idx], v[idx]], 1).tolist())
        obs_ur.extend((u[idx] - BF / z[idx]).tolist())
    O = len(obs_cam)
    cams0 = []
    for c, T in enumerate(cams_true):
        if c < 2:
            cams0.append(T)
        else:
            d = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.02)), np.float32)
            cams0.append(d @ T)
    pts0 = (pts + rng.normal(size=pts.shape) * 0.05).astype(np.float32)
    prob = BAProblem(
        cam_Tcw=np.stack(cams0).astype(np.float32),
        cam_fixed=np.asarray([c < 2 for c in range(n_cams)]),
        pt_pos=pts0,
        pt_valid=np.ones(n_pts, bool),
        obs_cam=np.asarray(obs_cam, np.int32),
        obs_pt=np.asarray(obs_pt, np.int32),
        obs_uv=np.asarray(obs_uv, np.float32),
        obs_ur=np.asarray(obs_ur, np.float32),
        obs_inv_sigma2=np.ones(O, np.float32),
        obs_mask=np.ones(O, bool),
    )
    return prob


def build_pg_problem(n_kf: int):
    """Seeded drifted loop for the Sim3 pose graph (identical everywhere)."""
    import jax.numpy as jnp

    from my_orb_slam2_tpu.ops import lie

    rng = np.random.default_rng(SEED + 1)
    gt = []
    T = np.eye(4)
    step = np.asarray(
        lie.se3_exp(jnp.asarray([0.0, 0.0, 0.5, 0.0, 2 * np.pi / n_kf, 0.0]))
    )
    for _ in range(n_kf):
        gt.append(np.linalg.inv(T))
        T = T @ np.linalg.inv(step)
    gt = np.stack(gt)
    est = [gt[0]]
    for k in range(1, n_kf):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.01)))
        est.append(rel @ noise @ est[k - 1])
    est = np.stack(est).astype(np.float32)
    # Edges: odometry chain + skip-2/skip-5 "covisibility" edges + loop.
    ei, ej = [], []
    for k in range(n_kf - 1):
        ei.append(k); ej.append(k + 1)
    for s in (2, 5):
        for k in range(0, n_kf - s, s):
            ei.append(k); ej.append(k + s)
    ei.append(n_kf - 1); ej.append(0)
    meas = []
    for a, b in zip(ei, ej):
        if b == (a + 1) or (b - a) in (2, 5):
            meas.append(est[b] @ np.linalg.inv(est[a]))
        else:  # loop edge: drift-free constraint
            meas.append(gt[b] @ np.linalg.inv(gt[a]))
    return (
        est,
        np.ones(n_kf, bool),
        np.zeros(n_kf, bool) | (np.arange(n_kf) == 0),
        np.asarray(ei, np.int32),
        np.asarray(ej, np.int32),
        np.stack(meas).astype(np.float32),
        np.ones(len(ei), bool),
    )


def child(args):
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.procs,
        process_id=args.child,
    )
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_procs = args.procs
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == n_procs

    if args.kind == "ba":
        from my_orb_slam2_tpu.parallel.dist_ba import (
            make_camera_sharded_ba, partition_by_camera,
        )
        from my_orb_slam2_tpu.ops import ba as ba_ops

        mesh = jax.make_mesh((n_procs,), ("kf",))
        prob_np = build_problem(args.cams, args.pts, args.obs_per_cam)
        prob_p, Cd = partition_by_camera(prob_np, n_procs)

        def to_global(x, spec):
            sh = NamedSharding(mesh, spec)
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        po, pr = P("kf"), P()
        prob_g = prob_p.__class__(
            cam_Tcw=to_global(prob_p.cam_Tcw, po),
            cam_fixed=to_global(prob_p.cam_fixed, po),
            pt_pos=to_global(prob_p.pt_pos, pr),
            pt_valid=to_global(prob_p.pt_valid, pr),
            obs_cam=to_global(prob_p.obs_cam, po),
            obs_pt=to_global(prob_p.obs_pt, po),
            obs_uv=to_global(prob_p.obs_uv, po),
            obs_ur=to_global(prob_p.obs_ur, po),
            obs_inv_sigma2=to_global(prob_p.obs_inv_sigma2, po),
            obs_mask=to_global(prob_p.obs_mask, po),
        )
        dist = make_camera_sharded_ba(mesh)
        out = dist(prob_g, FX, FY, CX, CY, BF, n_iters=BA_ITERS, cg_iters=48)
        jax.block_until_ready(out.pt_pos)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = dist(prob_g, FX, FY, CX, CY, BF, n_iters=BA_ITERS, cg_iters=48)
            jax.block_until_ready(out.pt_pos)
        ms = (time.perf_counter() - t0) / reps * 1000.0

        if args.child == 0:
            pt_dist = np.asarray(out.pt_pos)
            ref = ba_ops.bundle_adjust(
                ba_ops.BAProblem(*[jnp.asarray(np.asarray(x)) for x in prob_p]),
                FX, FY, CX, CY, BF, n_iters=BA_ITERS, cg_iters=48,
            )
            err = np.linalg.norm(pt_dist - np.asarray(ref.pt_pos), axis=1)
            med = float(np.median(err))
            json.dump(
                {"kind": "ba", "procs": n_procs, "cams": args.cams,
                 "n_obs": int(prob_np.obs_cam.shape[0]),
                 "ms_per_ba": ms, "ms_per_iter": ms / BA_ITERS,
                 "median_pt_err_vs_single": med, "ok": bool(med < 5e-3)},
                open(args.out, "w"),
            )
    else:  # pg
        from my_orb_slam2_tpu.ops import pose_graph
        from my_orb_slam2_tpu.parallel.dist_pose_graph import (
            make_distributed_pose_graph, pad_edges_for_mesh,
        )

        mesh = jax.make_mesh((n_procs,), ("edges",))
        pg_np = build_pg_problem(args.kfs)
        S, vvalid, vfixed = (jnp.asarray(x) for x in pg_np[:3])
        pe_np = pad_edges_for_mesh(*[jnp.asarray(x) for x in pg_np[3:]], n_procs)

        def to_global(x, spec):
            sh = NamedSharding(mesh, spec)
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        pedge = P("edges")
        ei, ej, Sji, emask = (to_global(x, pedge) for x in pe_np)
        dist = make_distributed_pose_graph(mesh)
        out = dist(S, vvalid, vfixed, ei, ej, Sji, emask,
                   n_iters=PG_ITERS, fix_scale=True)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = dist(S, vvalid, vfixed, ei, ej, Sji, emask,
                       n_iters=PG_ITERS, fix_scale=True)
            jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1000.0

        if args.child == 0:
            single = pose_graph.optimize_pose_graph(
                *[jnp.asarray(x) for x in pg_np], n_iters=PG_ITERS,
                fix_scale=True,
            )
            s_np = np.asarray(single)
            # Scale-relative: translations grow with the loop radius
            # (~0.08 * kfs meters), so compare against the pose magnitude.
            err = float(
                np.max(np.abs(s_np - np.asarray(out)))
                / max(1.0, float(np.max(np.abs(s_np))))
            )
            json.dump(
                {"kind": "pg", "procs": n_procs, "kfs": args.kfs,
                 "n_edges": int(pg_np[3].shape[0]),
                 "ms_per_pg": ms, "ms_per_iter": ms / PG_ITERS,
                 "rel_err_vs_single": err, "ok": bool(err < 1e-3)},
                open(args.out, "w"),
            )
    jax.distributed.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=-1)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--sizes", default="1,2,4")
    ap.add_argument("--kind", default="ba", choices=["ba", "pg", "both"])
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--pts", type=int, default=6000)
    ap.add_argument("--obs-per-cam", type=int, default=0)
    ap.add_argument("--kfs", type=int, default=512)
    ap.add_argument("--json", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.child >= 0:
        child(args)
        return

    kinds = ["ba", "pg"] if args.kind == "both" else [args.kind]
    results = []
    base_port = 29700
    k = 0
    for kind in kinds:
        for n in (int(s) for s in args.sizes.split(",")):
            port = base_port + k
            k += 1
            out_path = f"/tmp/dist_{kind}_{n}.json"
            if os.path.exists(out_path):
                os.remove(out_path)
            env = dict(os.environ)
            env.update(
                JAX_PLATFORMS="cpu",
                PALLAS_AXON_POOL_IPS="",
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
                _SLAM_TESTS_REEXEC="1",
            )
            procs = [
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", str(i), "--procs", str(n), "--port", str(port),
                     "--kind", kind, "--cams", str(args.cams),
                     "--pts", str(args.pts), "--obs-per-cam", str(args.obs_per_cam),
                     "--kfs", str(args.kfs), "--out", out_path],
                    env=env,
                )
                for i in range(n)
            ]
            rc = [p.wait(timeout=1800) for p in procs]
            assert all(r == 0 for r in rc), f"kind={kind} procs={n} rcs={rc}"
            res = json.load(open(out_path))
            print(res)
            results.append(res)

    # speedup/efficiency per kind vs that kind's 1-process run
    for kind in kinds:
        rows = [r for r in results if r["kind"] == kind]
        base = next((r for r in rows if r["procs"] == 1), None)
        if base:
            key = "ms_per_ba" if kind == "ba" else "ms_per_pg"
            for r in rows:
                r["speedup"] = base[key] / r[key]
                r["efficiency"] = r["speedup"] / r["procs"]
    summary = {
        "harness": "camera-sharded BA + edge-sharded Sim3 pose graph over "
                   "jax.distributed CPU processes",
        "methodology": (
            "N separate OS processes, 1 device each, collectives over the "
            "distributed runtime. Host has 2 CPUs and the 1-process run's "
            "XLA already multi-threads across BOTH cores, so even N=2 has "
            "zero spare compute: every multi-process row on this box "
            "measures correctness + communication overhead, not genuine "
            "scaling (the >=75%-efficiency target needs real multi-chip "
            "hardware; per-iteration times are recorded for comparison "
            "when it exists)."
        ),
        "runs": results,
    }
    print(json.dumps(summary, indent=1))
    if args.json:
        json.dump(summary, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
