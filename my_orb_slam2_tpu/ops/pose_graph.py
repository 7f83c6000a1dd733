"""Sim3 pose-graph (essential graph) optimization.

Replaces reference Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:787-
1068): 7-dof Sim(3) vertices per keyframe, edges from loop connections,
spanning-tree parents, historical loop edges and strong covisibility pairs,
with identity information matrices and the loop keyframe held fixed.

TPU formulation: the edge residual e_ij = log_sim3(S_ji · S_i · S_j^-1)
(zero when S_j S_i^-1 matches the measurement) with Jacobians from forward-
mode autodiff of the left-multiplied tangent increments, vmapped over the
edge list. The normal equations are solved matrix-free with block-Jacobi
preconditioned CG over the (KF, 7) state — the same segment-sum/gather
pattern as the BA engine, so it shards over a mesh the same way (edges
sharded, (KF, 7) blocks psum'd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie


def _edge_residual(di, dj, Si, Sj, Sji):
    """e = log(Sji * (exp(di) Si) * (exp(dj) Sj)^-1): (7,)."""
    Si_n = lie.sim3_mul(lie.sim3_exp(di), Si)
    Sj_n = lie.sim3_mul(lie.sim3_exp(dj), Sj)
    return lie.sim3_log(lie.sim3_mul(Sji, lie.sim3_mul(Si_n, lie.sim3_inverse(Sj_n))))


@functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters", "fix_scale"))
def optimize_pose_graph(
    S_cw,  # (KF, 4, 4) Sim3 vertices (world->camera, sR packing)
    vertex_valid,  # (KF,) bool
    vertex_fixed,  # (KF,) bool (loop keyframe)
    edge_i,  # (E,) i32
    edge_j,  # (E,) i32
    edge_Sji,  # (E, 4, 4) measurements
    edge_mask,  # (E,) bool
    n_iters: int = 20,
    cg_iters: int = 64,
    fix_scale: bool = False,
):
    """Gauss-Newton with matrix-free PCG. Returns optimized (KF, 4, 4)."""
    KF = S_cw.shape[0]
    free = (vertex_valid & ~vertex_fixed).astype(jnp.float32)[:, None]
    zero7 = jnp.zeros(7)

    def residuals_and_J(S):
        Si = S[edge_i]
        Sj = S[edge_j]

        def one(si, sj, sji):
            f = lambda di, dj: _edge_residual(di, dj, si, sj, sji)
            r = f(zero7, zero7)
            Ji = jax.jacfwd(f, argnums=0)(zero7, zero7)  # (7,7)
            Jj = jax.jacfwd(f, argnums=1)(zero7, zero7)
            return r, Ji, Jj

        return jax.vmap(one)(Si, Sj, edge_Sji)

    def gn_step(_, carry):
        S, lam = carry
        r, Ji, Jj = residuals_and_J(S)  # (E,7), (E,7,7), (E,7,7)
        w = edge_mask.astype(jnp.float32)[:, None]
        rw = r * w
        # H blocks via segment sums; off-diagonal handled matrix-free in CG.
        Hii = jnp.einsum("eij,eik->ejk", Ji * w[:, :, None], Ji)
        Hjj = jnp.einsum("eij,eik->ejk", Jj * w[:, :, None], Jj)
        H_diag = (
            jnp.zeros((KF, 7, 7)).at[edge_i].add(Hii).at[edge_j].add(Hjj)
        )
        H_diag = H_diag + (lam * jax.vmap(jnp.diag)(jnp.diagonal(H_diag, axis1=1, axis2=2))
                           + 1e-8 * jnp.eye(7))
        b = (
            jnp.zeros((KF, 7))
            .at[edge_i].add(-jnp.einsum("eij,ei->ej", Ji, rw))
            .at[edge_j].add(-jnp.einsum("eij,ei->ej", Jj, rw))
        ) * free

        def H_matvec(x):
            x = x * free
            xi = x[edge_i]
            xj = x[edge_j]
            Jx = (
                jnp.einsum("eij,ej->ei", Ji, xi) + jnp.einsum("eij,ej->ei", Jj, xj)
            ) * w  # (E, 7)
            out = (
                jnp.zeros((KF, 7))
                .at[edge_i].add(jnp.einsum("eij,ei->ej", Ji, Jx))
                .at[edge_j].add(jnp.einsum("eij,ei->ej", Jj, Jx))
            )
            # add the lambda damping consistent with H_diag
            damp = jnp.einsum(
                "kij,kj->ki",
                lam * jax.vmap(jnp.diag)(
                    jnp.diagonal(
                        jnp.zeros((KF, 7, 7)).at[edge_i].add(Hii).at[edge_j].add(Hjj),
                        axis1=1, axis2=2,
                    )
                ) + 1e-8 * jnp.eye(7),
                x,
            )
            return (out + damp) * free

        M_inv = jnp.linalg.inv(H_diag)

        def precond(x):
            return jnp.einsum("kij,kj->ki", M_inv, x) * free

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
            return jnp.sum((rr ** 2) * edge_mask.astype(jnp.float32)[:, None])

        improved = cost(S_new) < cost(S)
        S = jnp.where(improved, S_new, S)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        return (S, lam)

    S, _ = jax.lax.fori_loop(0, n_iters, gn_step, (S_cw, jnp.float32(1e-6)))
    return S


def build_essential_edges(
    covis,  # (KF, KF) i32 weights (pre-correction connectivity)
    kf_parent,  # (KF,) i32
    loop_edges,  # (KF, KF) bool historical + new loop edges
    kf_valid,  # (KF,) bool
    S_cw_meas,  # (KF, 4, 4) poses to take measurements from (pre-correction)
    min_weight: int = 100,
    max_edges: int = 4096,
):
    """Assemble the essential-graph edge list (reference
    src/Optimizer.cc:869-1004): spanning-tree edges, loop edges, covis pairs
    with weight >= min_weight. Measurement S_ji = S_j * S_i^-1 from the
    *pre-correction* poses. Static max_edges with mask."""
    KF = covis.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (KF, KF), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (KF, KF), 1)
    parent_mat = jnp.zeros((KF, KF), bool).at[
        jnp.arange(KF), jnp.maximum(kf_parent, 0)
    ].set(kf_parent >= 0)
    strong = (covis >= min_weight) & (ii < jj)
    pair = (
        parent_mat | parent_mat.T | loop_edges | loop_edges.T | strong
    ) & kf_valid[:, None] & kf_valid[None, :] & (ii < jj)
    flat = pair.reshape(-1)
    sel = jnp.nonzero(flat, size=max_edges, fill_value=KF * KF)[0]
    ok = sel < KF * KF
    sel_safe = jnp.where(ok, sel, 0)
    ei = (sel_safe // KF).astype(jnp.int32)
    ej = (sel_safe % KF).astype(jnp.int32)
    Si = S_cw_meas[ei]
    Sj = S_cw_meas[ej]
    Sji = jax.vmap(lambda a, b: lie.sim3_mul(a, lie.sim3_inverse(b)))(Sj, Si)
    return ei, ej, Sji, ok
