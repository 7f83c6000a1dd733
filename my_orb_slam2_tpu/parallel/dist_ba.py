"""Distributed bundle adjustment over a device mesh.

The reference has no distributed backend (SURVEY.md §2.4) — its "parallelism"
is three pthreads over a mutex-guarded map. The TPU-native scale-out story
is different: bundle adjustment's dominant cost is the per-observation
residual/Jacobian/block-accumulation work, which is embarrassingly parallel
over the observation axis. We shard the observation arrays across the mesh
(`obs` axis), accumulate each shard's contribution to the camera/landmark
block system, and `psum` the (C,6,6)/(P,3,3)/(C,6)/(P,3) blocks over ICI —
the classic data-parallel reduction. The reduced camera solve (PCG on the
Schur complement) then runs replicated on every device: its cost is O(C)
per iteration, negligible next to the O(O) residual work at realistic
problem sizes (O ~ 100-1000x C).

W-blocks (cam x point per observation) stay shard-local: the Schur matvec
needs W twice per CG iteration; each device computes its local slice of
  W V^-1 W^T x
and psums the (C, 6) result, so no (O, 6, 3) tensor ever crosses ICI.

This mirrors how the single-chip engine (ops/ba.py) is written — the same
segment-sum structure, with psum inserted at the reduction points — so
distributed == single-chip up to float reduction order (tested).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from my_orb_slam2_tpu.ops import ba as ba_ops
from my_orb_slam2_tpu.ops import lie
from my_orb_slam2_tpu.ops.ba import BAProblem, CHI2_MONO, CHI2_STEREO


def pad_problem_for_mesh(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad the observation axis to a multiple of the mesh size."""
    O = prob.obs_cam.shape[0]
    pad = (-O) % n_shards
    if pad == 0:
        return prob
    z = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return prob._replace(
        obs_cam=z(prob.obs_cam),
        obs_pt=z(prob.obs_pt),
        obs_uv=z(prob.obs_uv),
        obs_ur=jnp.pad(prob.obs_ur, (0, pad), constant_values=-1.0),
        obs_inv_sigma2=z(prob.obs_inv_sigma2),
        obs_mask=jnp.pad(prob.obs_mask, (0, pad), constant_values=False),
    )


def partition_by_camera(prob: BAProblem, n_shards: int):
    """Re-layout a BA problem so the CAMERA axis partitions over a mesh.

    Cameras are block-partitioned (camera c -> shard c // ceil(C/D)); each
    observation is owned by its camera's shard. Observations are sorted by
    shard and padded so every shard holds the same (static) count. Returns
    (prob2, Cd) where prob2 has:
      - cam arrays padded to D*Cd (shard d owns cameras [d*Cd, (d+1)*Cd)),
      - obs arrays reordered+padded to D*Om with obs_cam still GLOBAL ids.
    """
    C = prob.cam_Tcw.shape[0]
    D = n_shards
    Cd = -(-C // D)
    cam_pad = D * Cd - C
    obs_cam = np.asarray(prob.obs_cam)
    obs_mask = np.asarray(prob.obs_mask)
    shard_of = np.where(obs_mask, obs_cam // Cd, -1)
    counts = np.asarray([(shard_of == d).sum() for d in range(D)])
    Om = int(counts.max()) if counts.size else 0
    Om = max(Om, 1)
    order = np.full((D, Om), -1, np.int64)
    for d in range(D):
        idx = np.nonzero(shard_of == d)[0]
        order[d, : len(idx)] = idx
    flat = order.reshape(-1)
    ok = flat >= 0
    safe = np.where(ok, flat, 0)

    def take_obs(x, fill=0.0):
        arr = np.asarray(x)[safe]
        if arr.ndim == 1:
            return jnp.asarray(np.where(ok, arr, fill).astype(arr.dtype))
        m = ok.reshape(-1, *([1] * (arr.ndim - 1)))
        return jnp.asarray(np.where(m, arr, fill).astype(arr.dtype))

    def pad_cam(x, fill=0.0):
        arr = np.asarray(x)
        if cam_pad == 0:
            return jnp.asarray(arr)
        pad_shape = (cam_pad,) + arr.shape[1:]
        return jnp.asarray(
            np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)])
        )

    cam_Tcw = np.asarray(prob.cam_Tcw)
    eye_pad = np.tile(np.eye(4, dtype=cam_Tcw.dtype), (cam_pad, 1, 1))
    prob2 = prob._replace(
        cam_Tcw=jnp.asarray(np.concatenate([cam_Tcw, eye_pad]) if cam_pad else cam_Tcw),
        cam_fixed=pad_cam(prob.cam_fixed, True),
        obs_cam=take_obs(prob.obs_cam, 0),
        obs_pt=take_obs(prob.obs_pt, 0),
        obs_uv=take_obs(prob.obs_uv, 0.0),
        obs_ur=take_obs(prob.obs_ur, -1.0),
        obs_inv_sigma2=take_obs(prob.obs_inv_sigma2, 0.0),
        obs_mask=take_obs(prob.obs_mask, False),
    )
    return prob2, Cd


def make_camera_sharded_ba(mesh: Mesh, axis: str = "kf"):
    """Distributed BA with the KEYFRAME (camera) axis sharded — the map
    itself partitions across the mesh (SURVEY §2.4 / §7.9: keyframe blocks
    are the "model parallel" axis). Each device owns a contiguous camera
    block + exactly the observations of those cameras:

    - U blocks, b_c and the Schur CG state dx live SHARD-LOCAL — the camera
      system never materializes on one device.
    - V/b_p (landmark blocks) accumulate shard-locally and psum over ICI
      (points straddle camera blocks — the only cross-device coupling).
    - CG dot products psum scalars; everything else stays local.

    Input must come from `partition_by_camera(prob, mesh.size)`. Camera
    arrays are sharded over `axis`; point arrays replicated; obs sharded.
    Returns fn(prob, Cd, fx, fy, cx, cy, bf, n_iters, cg_iters) -> prob.
    """
    D = mesh.devices.size

    def dist_ba(prob: BAProblem, fx, fy, cx, cy, bf,
                n_iters: int = 10, cg_iters: int = 48, use_huber: bool = True):
        po = P(axis)
        pr = P()
        specs = BAProblem(
            cam_Tcw=po, cam_fixed=po, pt_pos=pr, pt_valid=pr,
            obs_cam=po, obs_pt=po, obs_uv=po, obs_ur=po,
            obs_inv_sigma2=po, obs_mask=po,
        )

        def body(prob_s: BAProblem):
            Cd = prob_s.cam_Tcw.shape[0]  # local camera block
            Pn = prob_s.pt_pos.shape[0]
            my = jax.lax.axis_index(axis)
            base = my * Cd
            # local observation camera ids
            lcam = jnp.clip(prob_s.obs_cam - base, 0, Cd - 1)
            is_stereo = prob_s.obs_ur >= 0
            delta = jnp.sqrt(jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO))
            free_cam = (~prob_s.cam_fixed).astype(jnp.float32)[:, None]
            free_pt = prob_s.pt_valid.astype(jnp.float32)[:, None]

            def residuals(cam_Tcw, pt_pos):
                local = prob_s._replace(obs_cam=lcam)
                return ba_ops._residuals(cam_Tcw, pt_pos, local, fx, fy, cx, cy, bf)

            def total_cost(cam_Tcw, pt_pos):
                r, _, _, z = residuals(cam_Tcw, pt_pos)
                c2 = ba_ops._chi2(r, prob_s.obs_inv_sigma2, is_stereo)
                rho = ba_ops._robust_cost(c2, delta, use_huber)
                return jax.lax.psum(
                    jnp.sum(rho * prob_s.obs_mask * (z > 0)), axis
                )

            def lm_step(_, carry):
                cam_Tcw, pt_pos, lam, cost_cur = carry
                r, J_cam, J_pt, z = residuals(cam_Tcw, pt_pos)
                c2 = ba_ops._chi2(r, prob_s.obs_inv_sigma2, is_stereo)
                e = jnp.sqrt(jnp.maximum(c2, 1e-12))
                w_huber = jnp.where(use_huber & (e > delta), delta / e, 1.0)
                w = prob_s.obs_inv_sigma2 * w_huber * prob_s.obs_mask * (z > 0)
                row_w = jnp.stack([w, w, w * is_stereo], axis=1)
                Jc_w = J_cam * row_w[:, :, None]
                Jp_w = J_pt * row_w[:, :, None]
                # Camera blocks: fully local (every obs of my cameras is mine).
                U = jnp.zeros((Cd, 6, 6)).at[lcam].add(
                    jnp.einsum("oij,oik->ojk", Jc_w, J_cam)
                )
                b_c = jnp.zeros((Cd, 6)).at[lcam].add(
                    -jnp.einsum("oij,oi->oj", Jc_w, r)
                )
                # Landmark blocks: the cross-shard coupling -> psum.
                V = jax.lax.psum(
                    jnp.zeros((Pn, 3, 3)).at[prob_s.obs_pt].add(
                        jnp.einsum("oij,oik->ojk", Jp_w, J_pt)
                    ),
                    axis,
                )
                b_p = jax.lax.psum(
                    jnp.zeros((Pn, 3)).at[prob_s.obs_pt].add(
                        -jnp.einsum("oij,oi->oj", Jp_w, r)
                    ),
                    axis,
                )
                Wo = jnp.einsum("oij,oik->ojk", Jc_w, J_pt)  # shard-local
                U_d = U + lam * jax.vmap(jnp.diag)(jnp.diagonal(U, axis1=1, axis2=2))
                V_d = V + lam * jax.vmap(jnp.diag)(jnp.diagonal(V, axis1=1, axis2=2))
                V_inv = ba_ops._inv3x3(V_d)
                Vb = jnp.einsum("pij,pj->pi", V_inv, b_p)
                WVb = jnp.zeros((Cd, 6)).at[lcam].add(
                    jnp.einsum("oij,oj->oi", Wo, Vb[prob_s.obs_pt])
                )
                b_red = (b_c - WVb) * free_cam

                def S_matvec(x):  # x: (Cd, 6) local camera block
                    x = x * free_cam
                    t1 = jnp.einsum("cij,cj->ci", U_d, x)
                    Wx = jnp.einsum("oij,oi->oj", Wo, x[lcam])
                    y = jax.lax.psum(
                        jnp.zeros((Pn, 3)).at[prob_s.obs_pt].add(Wx), axis
                    )
                    y = jnp.einsum("pij,pj->pi", V_inv, y)
                    t2 = jnp.zeros((Cd, 6)).at[lcam].add(
                        jnp.einsum("oij,oj->oi", Wo, y[prob_s.obs_pt])
                    )
                    return (t1 - t2) * free_cam

                M_inv = ba_ops._inv6x6(U_d)
                precond = lambda x: jnp.einsum("cij,cj->ci", M_inv, x) * free_cam
                pdot = lambda a, b: jax.lax.psum(jnp.sum(a * b), axis)

                def cg_body(_, cg):
                    x, rr, pdir, rz = cg
                    Sp = S_matvec(pdir)
                    denom = pdot(pdir, Sp)
                    alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
                    x = x + alpha * pdir
                    rr = rr - alpha * Sp
                    zz = precond(rr)
                    rz_new = pdot(rr, zz)
                    beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
                    return (x, rr, zz + beta * pdir, rz_new)

                r0 = b_red
                z0 = precond(r0)
                dx_c, _, _, _ = jax.lax.fori_loop(
                    0, cg_iters, cg_body,
                    (jnp.zeros((Cd, 6)), r0, z0, pdot(r0, z0)),
                )
                Wt_dx = jax.lax.psum(
                    jnp.zeros((Pn, 3)).at[prob_s.obs_pt].add(
                        jnp.einsum("oij,oi->oj", Wo, dx_c[lcam])
                    ),
                    axis,
                )
                dy = jnp.einsum("pij,pj->pi", V_inv, b_p - Wt_dx) * free_pt
                cam_new = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_c, cam_Tcw)
                cam_new = jnp.where(prob_s.cam_fixed[:, None, None], cam_Tcw, cam_new)
                pt_new = pt_pos + dy
                cost_new = total_cost(cam_new, pt_new)
                improved = cost_new < cost_cur
                cam_Tcw = jnp.where(improved, cam_new, cam_Tcw)
                pt_pos = jnp.where(improved, pt_new, pt_pos)
                lam = jnp.where(improved, lam * 0.5, lam * 4.0)
                cost_cur = jnp.where(improved, cost_new, cost_cur)
                return (cam_Tcw, pt_pos, lam, cost_cur)

            cam_Tcw, pt_pos, _, _ = jax.lax.fori_loop(
                0, n_iters, lm_step,
                (prob_s.cam_Tcw, prob_s.pt_pos, jnp.float32(1e-4),
                 total_cost(prob_s.cam_Tcw, prob_s.pt_pos)),
            )
            # Points are replicated (identical on all shards after psum-built
            # updates); cameras stay sharded.
            return prob_s._replace(cam_Tcw=cam_Tcw, pt_pos=pt_pos)

        out_specs = BAProblem(
            cam_Tcw=P(axis), cam_fixed=P(axis), pt_pos=P(), pt_valid=P(),
            obs_cam=P(axis), obs_pt=P(axis), obs_uv=P(axis), obs_ur=P(axis),
            obs_inv_sigma2=P(axis), obs_mask=P(axis),
        )
        return jax.jit(
            jax.shard_map(
                body, mesh=mesh, in_specs=(specs,), out_specs=out_specs,
                check_vma=False,
            ),
            static_argnames=(),
        )(prob)

    return dist_ba


def make_distributed_ba(mesh: Mesh, axis: str = "obs"):
    """Build a pjit-style distributed bundle_adjust over `mesh`.

    Returns fn(prob, fx, fy, cx, cy, bf, n_iters, cg_iters) -> prob with
    observation arrays sharded over `axis` and cameras/points replicated.
    """

    def shard_specs(prob: BAProblem):
        po = P(axis)
        pr = P()
        return BAProblem(
            cam_Tcw=pr, cam_fixed=pr, pt_pos=pr, pt_valid=pr,
            obs_cam=po, obs_pt=po, obs_uv=po, obs_ur=po,
            obs_inv_sigma2=po, obs_mask=po,
        )

    @functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters", "use_huber"))
    def dist_ba(prob: BAProblem, fx, fy, cx, cy, bf,
                n_iters: int = 10, cg_iters: int = 48, use_huber: bool = True):
        specs = shard_specs(prob)

        def body(prob_shard: BAProblem):
            C = prob_shard.cam_Tcw.shape[0]
            Pn = prob_shard.pt_pos.shape[0]
            is_stereo = prob_shard.obs_ur >= 0
            delta = jnp.sqrt(jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO))
            free_cam = (~prob_shard.cam_fixed).astype(jnp.float32)[:, None]
            free_pt = prob_shard.pt_valid.astype(jnp.float32)[:, None]

            def total_cost(cam_Tcw, pt_pos):
                r, _, _, z = ba_ops._residuals(cam_Tcw, pt_pos, prob_shard, fx, fy, cx, cy, bf)
                c2 = ba_ops._chi2(r, prob_shard.obs_inv_sigma2, is_stereo)
                rho = ba_ops._robust_cost(c2, delta, use_huber)
                return jax.lax.psum(
                    jnp.sum(rho * prob_shard.obs_mask * (z > 0)), axis
                )

            def lm_step(_, carry):
                cam_Tcw, pt_pos, lam, cost_cur = carry
                r, J_cam, J_pt, z = ba_ops._residuals(
                    cam_Tcw, pt_pos, prob_shard, fx, fy, cx, cy, bf
                )
                c2 = ba_ops._chi2(r, prob_shard.obs_inv_sigma2, is_stereo)
                e = jnp.sqrt(jnp.maximum(c2, 1e-12))
                w_huber = jnp.where(use_huber & (e > delta), delta / e, 1.0)
                w = prob_shard.obs_inv_sigma2 * w_huber * prob_shard.obs_mask * (z > 0)
                row_w = jnp.stack([w, w, w * is_stereo], axis=1)
                Jc_w = J_cam * row_w[:, :, None]
                Jp_w = J_pt * row_w[:, :, None]
                # Shard-local block accumulation + ICI psum.
                U = jax.lax.psum(
                    jnp.zeros((C, 6, 6)).at[prob_shard.obs_cam].add(
                        jnp.einsum("oij,oik->ojk", Jc_w, J_cam)
                    ),
                    axis,
                )
                V = jax.lax.psum(
                    jnp.zeros((Pn, 3, 3)).at[prob_shard.obs_pt].add(
                        jnp.einsum("oij,oik->ojk", Jp_w, J_pt)
                    ),
                    axis,
                )
                Wo = jnp.einsum("oij,oik->ojk", Jc_w, J_pt)  # shard-local
                b_c = jax.lax.psum(
                    jnp.zeros((C, 6)).at[prob_shard.obs_cam].add(
                        -jnp.einsum("oij,oi->oj", Jc_w, r)
                    ),
                    axis,
                )
                b_p = jax.lax.psum(
                    jnp.zeros((Pn, 3)).at[prob_shard.obs_pt].add(
                        -jnp.einsum("oij,oi->oj", Jp_w, r)
                    ),
                    axis,
                )
                U_d = U + lam * jax.vmap(jnp.diag)(jnp.diagonal(U, axis1=1, axis2=2))
                V_d = V + lam * jax.vmap(jnp.diag)(jnp.diagonal(V, axis1=1, axis2=2))
                V_inv = ba_ops._inv3x3(V_d)
                Vb = jnp.einsum("pij,pj->pi", V_inv, b_p)
                WVb = jax.lax.psum(
                    jnp.zeros((C, 6)).at[prob_shard.obs_cam].add(
                        jnp.einsum("oij,oj->oi", Wo, Vb[prob_shard.obs_pt])
                    ),
                    axis,
                )
                b_red = (b_c - WVb) * free_cam

                def S_matvec(x):
                    x = x * free_cam
                    t1 = jnp.einsum("cij,cj->ci", U_d, x)
                    Wx = jnp.einsum("oij,oi->oj", Wo, x[prob_shard.obs_cam])
                    y = jax.lax.psum(
                        jnp.zeros((Pn, 3)).at[prob_shard.obs_pt].add(Wx), axis
                    )
                    y = jnp.einsum("pij,pj->pi", V_inv, y)
                    t2 = jax.lax.psum(
                        jnp.zeros((C, 6)).at[prob_shard.obs_cam].add(
                            jnp.einsum("oij,oj->oi", Wo, y[prob_shard.obs_pt])
                        ),
                        axis,
                    )
                    return (t1 - t2) * free_cam

                M_inv = ba_ops._inv6x6(U_d)
                precond = lambda x: jnp.einsum("cij,cj->ci", M_inv, x) * free_cam

                def cg_body(_, cg):
                    x, rr, pdir, rz = cg
                    Sp = S_matvec(pdir)
                    denom = jnp.sum(pdir * Sp)
                    alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
                    x = x + alpha * pdir
                    rr = rr - alpha * Sp
                    zz = precond(rr)
                    rz_new = jnp.sum(rr * zz)
                    beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
                    return (x, rr, zz + beta * pdir, rz_new)

                r0 = b_red
                z0 = precond(r0)
                dx_c, _, _, _ = jax.lax.fori_loop(
                    0, cg_iters, cg_body, (jnp.zeros((C, 6)), r0, z0, jnp.sum(r0 * z0))
                )
                Wt_dx = jax.lax.psum(
                    jnp.zeros((Pn, 3)).at[prob_shard.obs_pt].add(
                        jnp.einsum("oij,oi->oj", Wo, dx_c[prob_shard.obs_cam])
                    ),
                    axis,
                )
                dy = jnp.einsum("pij,pj->pi", V_inv, b_p - Wt_dx) * free_pt
                cam_new = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_c, cam_Tcw)
                cam_new = jnp.where(prob_shard.cam_fixed[:, None, None], cam_Tcw, cam_new)
                pt_new = pt_pos + dy
                cost_new = total_cost(cam_new, pt_new)
                improved = cost_new < cost_cur
                cam_Tcw = jnp.where(improved, cam_new, cam_Tcw)
                pt_pos = jnp.where(improved, pt_new, pt_pos)
                lam = jnp.where(improved, lam * 0.5, lam * 4.0)
                cost_cur = jnp.where(improved, cost_new, cost_cur)
                return (cam_Tcw, pt_pos, lam, cost_cur)

            cam_Tcw, pt_pos, _, _ = jax.lax.fori_loop(
                0, n_iters, lm_step,
                (prob_shard.cam_Tcw, prob_shard.pt_pos, jnp.float32(1e-4),
                 total_cost(prob_shard.cam_Tcw, prob_shard.pt_pos)),
            )
            return prob_shard._replace(cam_Tcw=cam_Tcw, pt_pos=pt_pos)

        out_specs = shard_specs(prob)
        sharded = jax.shard_map(
            body, mesh=mesh, in_specs=(specs,), out_specs=out_specs,
            check_vma=False,
        )(prob)
        return sharded

    return dist_ba
