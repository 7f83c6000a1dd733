"""Distributed Sim3 pose-graph optimization over a device mesh.

The essential-graph solve is the pod-wide operation of loop closing
(SURVEY.md §2.4): at map scale the edge set (spanning tree + strong covis +
loop edges) dominates the cost through the per-edge residual/Jacobian work
and the per-CG-iteration edge matvecs. Both are embarrassingly parallel
over the edge axis, so edges shard across the mesh and the (KF, 7) block
accumulations psum over ICI — the identical recipe to parallel/dist_ba.py.

The vertex update + preconditioner stay replicated (O(KF) work, negligible
against O(E * 7x7) edge work at realistic edge/vertex ratios of 5-20x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from my_orb_slam2_tpu.ops import lie
from my_orb_slam2_tpu.ops.pose_graph import _edge_residual


def pad_edges_for_mesh(edge_i, edge_j, edge_Sji, edge_mask, n_shards: int):
    E = edge_i.shape[0]
    pad = (-E) % n_shards
    if pad == 0:
        return edge_i, edge_j, edge_Sji, edge_mask
    return (
        jnp.pad(edge_i, (0, pad)),
        jnp.pad(edge_j, (0, pad)),
        jnp.pad(edge_Sji, ((0, pad), (0, 0), (0, 0)), constant_values=0.0)
        .at[E:].set(jnp.eye(4)),
        jnp.pad(edge_mask, (0, pad), constant_values=False),
    )


def make_distributed_pose_graph(mesh: Mesh, axis: str = "edges"):
    """Returns fn(S_cw, vertex_valid, vertex_fixed, ei, ej, Sji, mask,
    n_iters, cg_iters, fix_scale) with edge arrays sharded over `axis`."""

    @functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters", "fix_scale"))
    def dist_pg(S_cw, vertex_valid, vertex_fixed, edge_i, edge_j, edge_Sji,
                edge_mask, n_iters: int = 20, cg_iters: int = 64,
                fix_scale: bool = False):
        pe = P(axis)
        pr = P()

        def body(S_cw, vertex_valid, vertex_fixed, ei, ej, Sji, emask):
            KF = S_cw.shape[0]
            free = (vertex_valid & ~vertex_fixed).astype(jnp.float32)[:, None]
            zero7 = jnp.zeros(7)

            def residuals_and_J(S):
                Si = S[ei]
                Sj = S[ej]

                def one(si, sj, sji):
                    f = lambda di, dj: _edge_residual(di, dj, si, sj, sji)
                    r = f(zero7, zero7)
                    Ji = jax.jacfwd(f, argnums=0)(zero7, zero7)
                    Jj = jax.jacfwd(f, argnums=1)(zero7, zero7)
                    return r, Ji, Jj

                return jax.vmap(one)(Si, Sj, Sji)

            def gn_step(_, carry):
                S, lam = carry
                r, Ji, Jj = residuals_and_J(S)
                w = emask.astype(jnp.float32)[:, None]
                rw = r * w
                Hii = jnp.einsum("eij,eik->ejk", Ji * w[:, :, None], Ji)
                Hjj = jnp.einsum("eij,eik->ejk", Jj * w[:, :, None], Jj)
                H_blocks = jax.lax.psum(
                    jnp.zeros((KF, 7, 7)).at[ei].add(Hii).at[ej].add(Hjj), axis
                )
                H_diag = H_blocks + (
                    lam * jax.vmap(jnp.diag)(jnp.diagonal(H_blocks, axis1=1, axis2=2))
                    + 1e-8 * jnp.eye(7)
                )
                b = jax.lax.psum(
                    jnp.zeros((KF, 7))
                    .at[ei].add(-jnp.einsum("eij,ei->ej", Ji, rw))
                    .at[ej].add(-jnp.einsum("eij,ei->ej", Jj, rw)),
                    axis,
                ) * free

                damp_blocks = (
                    lam * jax.vmap(jnp.diag)(jnp.diagonal(H_blocks, axis1=1, axis2=2))
                    + 1e-8 * jnp.eye(7)
                )

                def H_matvec(x):
                    x = x * free
                    Jx = (
                        jnp.einsum("eij,ej->ei", Ji, x[ei])
                        + jnp.einsum("eij,ej->ei", Jj, x[ej])
                    ) * w
                    out = jax.lax.psum(
                        jnp.zeros((KF, 7))
                        .at[ei].add(jnp.einsum("eij,ei->ej", Ji, Jx))
                        .at[ej].add(jnp.einsum("eij,ei->ej", Jj, Jx)),
                        axis,
                    )
                    damp = jnp.einsum("kij,kj->ki", damp_blocks, x)
                    return (out + damp) * free

                M_inv = jnp.linalg.inv(H_diag)
                precond = lambda x: jnp.einsum("kij,kj->ki", M_inv, x) * free

                def cg_body(_, cg):
                    x, rr, p, rz = cg
                    Hp = H_matvec(p)
                    denom = jnp.sum(p * Hp)
                    alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
                    x = x + alpha * p
                    rr = rr - alpha * Hp
                    z = precond(rr)
                    rz_new = jnp.sum(rr * z)
                    beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
                    return (x, rr, z + beta * p, rz_new)

                r0 = b
                z0 = precond(r0)
                dx, _, _, _ = jax.lax.fori_loop(
                    0, cg_iters, cg_body, (jnp.zeros((KF, 7)), r0, z0, jnp.sum(r0 * z0))
                )
                if fix_scale:
                    dx = dx.at[:, 6].set(0.0)
                S_new = jax.vmap(lambda d, s: lie.sim3_mul(lie.sim3_exp(d), s))(dx, S)
                S_new = jnp.where((free > 0)[:, :, None], S_new, S)

                def cost(Sx):
                    rr, _, _ = residuals_and_J(Sx)
                    return jax.lax.psum(
                        jnp.sum((rr ** 2) * emask.astype(jnp.float32)[:, None]), axis
                    )

                improved = cost(S_new) < cost(S)
                S = jnp.where(improved, S_new, S)
                lam = jnp.where(improved, lam * 0.5, lam * 4.0)
                return (S, lam)

            S, _ = jax.lax.fori_loop(0, n_iters, gn_step, (S_cw, jnp.float32(1e-6)))
            return S

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(pr, pr, pr, pe, pe, pe, pe),
            out_specs=pr,
            check_vma=False,
        )(S_cw, vertex_valid, vertex_fixed, edge_i, edge_j, edge_Sji, edge_mask)

    return dist_pg
