"""The interior-point iteration as a single jitted ``lax.while_loop``.

Functional transcription of the reference predictor-corrector loop and its
strategy-checkpoint state machine (reference: src/solver/core/solver.rs:
242-465, 525-666), the residual/info bookkeeping (implementations/default/
residuals.rs, info.rs) and the homogeneous-embedding KKT reduction
(implementations/default/kktsystem.rs).

Everything lives in one fixed-shape ``SolverState`` pytree; all
data-dependent control flow (termination, scaling-strategy retries, Mehrotra
correction gating) is expressed with ``lax.cond`` / ``jnp.where`` so the
whole solve compiles once and can be vmapped over problem batches and
sharded over device meshes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cones import ops as cone_ops
from .kkt import dense as kkt_dense
from .statuses import SolverStatus, SCALING_DUAL, SCALING_PRIMAL_DUAL

_UNSOLVED = int(SolverStatus.Unsolved)


import time as _time_mod

#: clock epoch: raw monotonic() is seconds since boot (~1e5-1e6), where a
#: float32 ulp is tens of milliseconds — fast solves land inside ONE ulp
#: and `now - start == 0`, so MaxTime never fires (observed).  Anchoring
#: at import keeps the values small and the f32 delta at µs precision.
_CLOCK_EPOCH = _time_mod.monotonic()


def _clock():
    """Host wall-clock read as an ordered callback (for time limits)."""
    import numpy as _np
    from jax.experimental import io_callback

    return io_callback(
        lambda: _np.float32(_time_mod.monotonic() - _CLOCK_EPOCH),
        jax.ShapeDtypeStruct((), jnp.float32),
        ordered=True,
    )


class SolverState(NamedTuple):
    # variables (x, s, z, τ, κ) and the saved previous iterate
    x: jax.Array
    s: jax.Array
    z: jax.Array
    tau: jax.Array
    kappa: jax.Array
    px: jax.Array
    ps: jax.Array
    pz: jax.Array
    ptau: jax.Array
    pkappa: jax.Array

    # progress scalars (DefaultInfo; info.rs:13-64)
    mu: jax.Array
    sigma: jax.Array
    step_length: jax.Array
    iterations: jax.Array
    cost_primal: jax.Array
    cost_dual: jax.Array
    res_primal: jax.Array
    res_dual: jax.Array
    res_primal_inf: jax.Array
    res_dual_inf: jax.Array
    gap_abs: jax.Array
    gap_rel: jax.Array
    ktratio: jax.Array

    # previous-iteration info scalars
    prev_cost_primal: jax.Array
    prev_cost_dual: jax.Array
    prev_res_primal: jax.Array
    prev_res_dual: jax.Array
    prev_gap_abs: jax.Array
    prev_gap_rel: jax.Array

    # residual inner products needed by infeasibility certificates
    dot_qx: jax.Array
    dot_bz: jax.Array

    status: jax.Array
    scaling: jax.Array

    # consecutive iterations the insufficient-progress condition held
    # (f32: one noisy backwards step must not kill a converging lane)
    ip_pending: jax.Array

    # per-iteration progress table [max_iter+1, 9]:
    # (pcost, dcost, gap_abs, gap_rel, pres, dres, k/t, μ, step)
    history: jax.Array


class Residuals(NamedTuple):
    rx: jax.Array
    rz: jax.Array
    rtau: jax.Array
    rx_inf: jax.Array
    rz_inf: jax.Array
    Px: jax.Array
    dot_qx: jax.Array
    dot_bz: jax.Array
    dot_sz: jax.Array
    dot_xPx: jax.Array


def compute_residuals(P, q, A, b, x, s, z, tau, kappa) -> Residuals:
    """reference: src/solver/implementations/default/residuals.rs:69-111"""
    qx = q @ x
    bz = b @ z
    sz = s @ z
    Px = P @ x
    xPx = x @ Px

    rx_inf = -(A.T @ z)
    rz_inf = A @ x + s

    rx = rx_inf - Px - tau * q
    rz = rz_inf - tau * b
    rtau = qx + bz + kappa + xPx / tau

    return Residuals(rx, rz, rtau, rx_inf, rz_inf, Px, qx, bz, sz, xPx)


def _norm_scaled(v, w):
    """||diag(w) v||_2  (reference: VectorMath::norm_scaled)"""
    return jnp.sqrt(jnp.sum((v * w) ** 2))


def update_info(st: SolverState, r: Residuals, equil, normq, normb):
    """Unscaled costs / residual norms / gaps through the equilibration
    inverses.  reference: info.rs:112-180"""
    d, e, dinv, einv, cinv = equil
    tinv = 1.0 / st.tau

    xPx_half = r.dot_xPx * tinv * tinv / 2.0
    cost_primal = (r.dot_qx * tinv + xPx_half) * cinv
    cost_dual = (-r.dot_bz * tinv - xPx_half) * cinv

    normx = _norm_scaled(st.x, d)
    normz = _norm_scaled(st.z, e) * cinv
    norms = _norm_scaled(st.s, einv)

    res_primal_inf = (_norm_scaled(r.rx_inf, dinv) * cinv) / jnp.maximum(1.0, normz)
    res_dual_inf = jnp.maximum(
        _norm_scaled(r.Px, dinv) / jnp.maximum(1.0, normx),
        _norm_scaled(r.rz_inf, einv) / jnp.maximum(1.0, normx + norms),
    )

    normx = normx * tinv
    normz = normz * tinv
    norms = norms * tinv

    res_primal = _norm_scaled(r.rz, einv) * tinv / jnp.maximum(1.0, normb + normx + norms)
    res_dual = (
        _norm_scaled(r.rx, dinv) * tinv * cinv / jnp.maximum(1.0, normq + normx + normz)
    )

    gap_abs = jnp.abs(cost_primal - cost_dual)
    gap_rel = gap_abs / jnp.maximum(
        1.0, jnp.minimum(jnp.abs(cost_primal), jnp.abs(cost_dual))
    )
    ktratio = st.kappa * tinv

    return st._replace(
        cost_primal=cost_primal,
        cost_dual=cost_dual,
        res_primal=res_primal,
        res_dual=res_dual,
        res_primal_inf=res_primal_inf,
        res_dual_inf=res_dual_inf,
        gap_abs=gap_abs,
        gap_rel=gap_rel,
        ktratio=ktratio,
        dot_qx=r.dot_qx,
        dot_bz=r.dot_bz,
    )


def check_convergence(st: SolverState, tols, statuses):
    """Shared convergence check for the full and the reduced ("almost")
    tolerance tiers.  reference: info.rs:340-389"""
    (gap_abs, gap_rel, feas, infeas_abs, infeas_rel, ktratio_tol) = tols
    solved_st, pinf_st, dinf_st = statuses

    solved = (
        (st.ktratio <= 1.0)
        & ((st.gap_abs < gap_abs) | (st.gap_rel < gap_rel))
        & (st.res_primal < feas)
        & (st.res_dual < feas)
    )
    kt_diverged = st.ktratio > (1000.0 / ktratio_tol)
    primal_inf = (st.dot_bz < -infeas_abs) & (
        st.res_primal_inf < -infeas_rel * st.dot_bz
    )
    dual_inf = (st.dot_qx < -infeas_abs) & (st.res_dual_inf < -infeas_rel * st.dot_qx)

    status = jnp.where(
        solved,
        solved_st,
        jnp.where(
            kt_diverged & primal_inf,
            pinf_st,
            jnp.where(kt_diverged & dual_inf, dinf_st, _UNSOLVED),
        ),
    )
    return status.astype(jnp.int32)


def check_termination(st: SolverState, settings, dtype):
    """reference: info.rs:182-231"""
    full_tols = (
        settings.tol_gap_abs,
        settings.tol_gap_rel,
        settings.tol_feas,
        settings.tol_infeas_abs,
        settings.tol_infeas_rel,
        settings.tol_ktratio,
    )
    status = check_convergence(
        st,
        full_tols,
        (
            int(SolverStatus.Solved),
            int(SolverStatus.PrimalInfeasible),
            int(SolverStatus.DualInfeasible),
        ),
    )

    eps = float(jnp.finfo(dtype).eps)
    going_backwards = (st.res_dual > st.prev_res_dual) | (
        st.res_primal > st.prev_res_primal
    )
    poor_progress_hi = (st.ktratio < eps * 100.0) & (
        (st.prev_gap_abs < settings.tol_gap_abs)
        | (st.prev_gap_rel < settings.tol_gap_rel)
    )
    diverging = (st.ktratio < 1.0) & (
        (
            (st.res_dual > settings.tol_feas * 100.0)
            & (st.res_dual > st.prev_res_dual * 100.0)
        )
        | (
            (st.res_primal > settings.tol_feas * 100.0)
            & (st.res_primal > st.prev_res_primal * 100.0)
        )
    )
    insufficient_now = (
        (status == _UNSOLVED)
        & (st.iterations > 1)
        & going_backwards
        & (poor_progress_hi | diverging)
    )
    # f32: a single backwards residual step can be one noisy direction
    # near μ → 0 rather than a genuine stall — require the condition to
    # persist for two consecutive iterations before declaring
    # InsufficientProgress.  f64 keeps the reference's immediate trigger
    # (solver.rs:586-609): there a backwards step is never noise.
    strikes = 2 if jnp.dtype(dtype) == jnp.float32 else 1
    insufficient = insufficient_now & (st.ip_pending >= strikes - 1)
    status = jnp.where(insufficient, int(SolverStatus.InsufficientProgress), status)

    status = jnp.where(
        (status == _UNSOLVED) & (st.iterations == settings.max_iter),
        int(SolverStatus.MaxIterations),
        status,
    )
    ip_pending = jnp.where(insufficient_now, st.ip_pending + 1, 0).astype(
        jnp.int32
    )
    return status, ip_pending


def calc_mu(layout, r: Residuals, tau, kappa):
    """reference: variables.rs:62-65"""
    return (r.dot_sz + tau * kappa) / (layout.degree + 1)


def calc_step_length(layout, state, step, variables, settings, is_combined, scaling):
    """reference: variables.rs:117-154 + solver.rs:547-584"""
    x, s, z, tau, kappa = variables
    dx, ds, dz, dtau, dkappa = step

    big = jnp.asarray(jnp.finfo(z.dtype).max, z.dtype)
    a_tau = jnp.where(dtau < 0, -tau / jnp.where(dtau < 0, dtau, -1.0), big)
    a_kappa = jnp.where(dkappa < 0, -kappa / jnp.where(dkappa < 0, dkappa, -1.0), big)
    alpha_max = jnp.minimum(jnp.minimum(a_tau, a_kappa), 1.0)

    alpha = cone_ops.step_length(layout, state, dz, ds, z, s, settings, alpha_max)

    if is_combined:
        alpha = alpha * settings.max_step_fraction

    # additional barrier limit for asymmetric cones under dual-only scaling
    # (solver.rs:560-584)
    if not layout.is_symmetric and is_combined:
        def barrier_at(a):
            cur_tau = tau + a * dtau
            cur_kappa = kappa + a * dkappa
            sz = (z + a * dz) @ (s + a * ds)
            mu = (sz + cur_tau * cur_kappa) / (layout.degree + 1)
            barrier = (
                (layout.degree + 1) * cone_ops._logsafe(mu)
                - cone_ops._logsafe(cur_tau)
                - cone_ops._logsafe(cur_kappa)
            )
            return barrier + cone_ops.compute_barrier(layout, state, z, s, dz, ds, a)

        def backtrack(a):
            def cond(carry):
                a, k = carry
                return (barrier_at(a) >= 1.0) & (k < 50)

            def body(carry):
                a, k = carry
                return a * settings.linesearch_backtrack_step, k + 1

            a, _ = jax.lax.while_loop(cond, body, (a, 0))
            return a

        alpha = jnp.where(
            scaling == SCALING_DUAL,
            backtrack(alpha),
            alpha,
        )
    return alpha


def solve_kkt_refined(factors, K_true, rhs, settings, want_lo=False,
                      keep_ext=False):
    """Refined KKT solve, transparently lifting to the sparse-cone-expanded
    system when the multifrontal backend carries extension rows: the
    augmented system [K  E; Eᵀ D][x; y] = [rhs; 0] solves the original
    K_hs x = rhs exactly (reference: datamaps.rs expansion semantics).

    ``rhs`` may be [N] or [N, r] on the multifrontal backend (multi-RHS
    solves share the levelized sweeps).  ``keep_ext`` returns the
    extension components instead of slicing them off — the step recovery
    uses them for a K-consistent HₛΔz product (kkt_solve_finish).
    """
    if factors[0] == "mf":
        ctx = factors[1][0]
        pad = ctx.N - rhs.shape[0]
        if pad > 0:
            base = rhs.shape[0]
            zshape = (pad,) if rhs.ndim == 1 else (pad, rhs.shape[1])
            rhs = jnp.concatenate([rhs, jnp.zeros(zshape, rhs.dtype)])
            out, ok = kkt_dense.solve_refined(
                factors, K_true, rhs, settings, want_lo=want_lo
            )
            if keep_ext:
                return out, ok
            if want_lo:
                sol, sol_lo = out
                return (
                    (sol[:base], None if sol_lo is None else sol_lo[:base]),
                    ok,
                )
            return out[:base], ok
    return kkt_dense.solve_refined(factors, K_true, rhs, settings,
                                   want_lo=want_lo)


def kkt_solve_rhs(layout, scaling_state, rhs, variables, is_combined):
    """Assemble the reduced KKT right-hand side [rx; ds_const - rz].

    reference: kktsystem.rs:127-158.  Returns (stacked_rhs, ds_const)."""
    x, s, z, tau, kappa = variables
    rx, rs, rz, rtau, rkappa = rhs

    # constant term c in HₛΔz + Δs = -c (kktsystem.rs:146-158)
    if is_combined:
        ds_const = cone_ops.ds_from_dz_offset(layout, scaling_state, rs, z)
    else:
        ds_const = s

    return jnp.concatenate([rx, ds_const - rz]), ds_const


def kkt_solve_finish(
    layout, scaling_state, P, q, A, b, x2, z2, sol, ds_const, rhs, variables,
    K_true=None,
):
    """Recover the full direction from the reduced solve: Δτ closed form
    with P-quadratic terms, then Δx/Δz/Δs/Δκ (kktsystem.rs:160-207).

    On the sparse-expanded backend the z-parts of ``sol``/``z2`` may
    carry the extension components (m + p long); Δz is recovered from
    the first m entries and the extension tail feeds the K-consistent
    HₛΔz product below.
    """
    n = q.shape[0]
    m = b.shape[0]
    x, s, z, tau, kappa = variables
    rx, rs, rz, rtau, rkappa = rhs
    # sol / x2z2 may be double-float (hi, lo) pairs from the compensated
    # refinement: the lo stream keeps Δz accurate past the f32
    # representation floor, which matters only where Δz meets the stiff
    # Hₛ (the Δs recovery below); everything else uses the hi parts.
    sol, sol_lo = sol if isinstance(sol, tuple) else (sol, None)
    if isinstance(x2, tuple):
        (x2, x2_lo), (z2, z2_lo) = x2, z2
    else:
        x2_lo = z2_lo = None
    x1, z1f = sol[:n], sol[n:]

    # Δτ (kktsystem.rs:168-190)
    xi = x / tau
    if (
        sol_lo is not None
        and sol.dtype == jnp.float32
        and isinstance(P, jnp.ndarray)
    ):
        # compensated DENSE-path layouts only (PSD / dense-LU f32): the
        # cheap schur_diag/schur_lr throughput paths and the sparse
        # multifrontal path keep the plain dots — they never reach the
        # cond(K) regime where this matters (the sparse engine's
        # refinement already bounds the solve error), and the extra ~40
        # tiny ops per finish measurably tax latency-bound loops
        # (sparse N=60k: +8 ms/iter when this ran there)
        # f32: the Δτ numerator/denominator are cancellation-prone dot
        # products of ~1/σ_min(K)-sized homogeneous solutions; plain f32
        # dots also round differently per batch shape (XLA reassociates
        # reductions), which near μ → 0 decides whether a lane converges.
        # Compensated dots make Δτ batch-shape-independent to ~eps².
        from .kkt import compensated as _dfc0

        def _df_dot(u, v):
            p, e = _dfc0._two_prod(u, v)
            h, l = _dfc0._df_reduce_last(p, e)
            return h, l

        # P @ v as a compensated pair.  A plain batched matmul's rounding
        # is reassociated by XLA per BATCH SHAPE, so the same lane gives
        # different Δτ under vmap(B=1) vs vmap(B=4) — with |x1| ~
        # 1/σ_min(K) a few-ulp difference decides step lengths near μ→0.
        # The compensated form is elementwise + a fixed reduction tree:
        # batch-shape-invariant and ~eps² accurate.  (COOMat P on the
        # sparse path keeps its own matvec; its segment sums are already
        # shape-stable.)
        dense_P = isinstance(P, jnp.ndarray)

        def _df_matvec(v):
            if not dense_P:
                return P @ v, jnp.zeros_like(v)
            p, e = _dfc0._two_prod(P, v[None, :])
            return _dfc0._df_reduce_last(p, e)

        def _df_dot_mv(u, vh, vl):
            h, l = _df_dot(u, vh)
            return h, l + u @ vl

        def _acc(pairs):
            th = jnp.asarray(0.0, sol.dtype)
            tl = jnp.asarray(0.0, sol.dtype)
            for (h, l) in pairs:
                th, e = _dfc0._two_sum(th, h)
                tl = tl + e + l
            return th + tl

        # the lo streams of the homogeneous solutions are NOT optional
        # here: |x1| ~ 1/σ_min(K) makes sol_lo ~ eps·|x1| comparable to
        # the whole cancelled numerator — dropping it was measured as a
        # 1000% Δτ error at cond(K) ~ 1e12
        x1_lo = sol_lo[:n] if sol_lo is not None else None
        z1_lo = sol_lo[n:] if sol_lo is not None else None

        qx1 = _df_dot(q, x1)
        bz1 = _df_dot(b, z1f[:m])
        Px1h, Px1l = _df_matvec(x1)
        xiPx1 = _df_dot_mv(xi, Px1h, Px1l)
        num_pairs = [
            (rtau, jnp.zeros_like(rtau)), (-rkappa / tau, 0.0),
            qx1, bz1, (2.0 * xiPx1[0], 2.0 * xiPx1[1]),
        ]
        if x1_lo is not None:
            num_pairs.append((q @ x1_lo, 0.0))
            num_pairs.append((b @ z1_lo[:m], 0.0))
            num_pairs.append((2.0 * (xi @ (P @ x1_lo)), 0.0))
        tau_num = _acc(num_pairs)
        xi_m_x2 = xi - x2
        qx2 = _df_dot(q, x2)
        bz2 = _df_dot(b, z2[:m])
        Pxmh, Pxml = _df_matvec(xi_m_x2)
        t1 = _df_dot_mv(xi_m_x2, Pxmh, Pxml)
        Px2h, Px2l = _df_matvec(x2)
        t2 = _df_dot_mv(x2, Px2h, Px2l)
        den_pairs = [
            (kappa / tau, 0.0), (-qx2[0], -qx2[1]), (-bz2[0], -bz2[1]),
            t1, (-t2[0], -t2[1]),
        ]
        if x2_lo is not None:
            # first-order lo corrections of the quadratic forms
            den_pairs.append((-(q @ x2_lo), 0.0))
            den_pairs.append((-(b @ z2_lo[:m]), 0.0))
            Px2_lo = P @ x2_lo
            den_pairs.append((-2.0 * (xi_m_x2 @ Px2_lo), 0.0))
            den_pairs.append((-2.0 * (x2 @ Px2_lo), 0.0))
        tau_den = _acc(den_pairs)
    else:
        tau_num = (
            rtau - rkappa / tau + q @ x1 + b @ z1f[:m] + 2.0 * (xi @ (P @ x1))
        )
        xi_m_x2 = xi - x2
        tau_den = (
            kappa / tau
            - q @ x2
            - b @ z2[:m]
            + xi_m_x2 @ (P @ xi_m_x2)
            - x2 @ (P @ x2)
        )
    dtau = tau_num / tau_den

    dx = x1 + dtau * x2
    dzf = z1f + dtau * z2

    dz_lo = None
    if sol_lo is not None:
        from .kkt import compensated as _dfc

        # v1 + dtau·v2 is a catastrophic cancellation near convergence:
        # the two homogeneous solutions grow ~1/σ_min(K) individually
        # while their combination is the O(step)-sized direction, so the
        # plain-f32 combination loses eps·‖v1‖ absolute — observed as
        # ~1e-5 jumps in the primal/dual residuals per step.  TwoSum /
        # TwoProd recover the cancelled bits; dz keeps its lo stream for
        # the Hₛ product below, dx collapses to f32 (only well-scaled
        # operators touch it afterwards).
        ph, pe = _dfc._two_prod(dtau, z2)
        dzf, e2 = _dfc._two_sum(z1f, ph)
        dz_lo = sol_lo[n:] + pe + e2
        if z2_lo is not None:
            dz_lo = dz_lo + dtau * z2_lo

        pxh, pxe = _dfc._two_prod(dtau, x2)
        dx, ex = _dfc._two_sum(x1, pxh)
        dx_lo = sol_lo[:n] + pxe + ex
        if x2_lo is not None:
            dx_lo = dx_lo + dtau * x2_lo
        dx = dx + dx_lo

    dz = dzf[:m]

    # Δs = -(HₛΔz + c)  (kktsystem.rs:195-199).  Two f32 accuracy rules,
    # both invisible at the reference's f64:
    # - Δs must be recovered through Hₛ (not the algebraically equivalent
    #   primal row AΔx + Δs − bΔτ = −rz): its rounding noise then lives
    #   in the W-geometry and shrinks with the cone's small eigenvalues,
    #   keeping s + αΔs feasible.  A primal-row Δs carries O(eps) flat
    #   noise that dwarfs the ~μ boundary eigenvalues and collapses step
    #   lengths.
    # - the HₛΔz product must agree to better than eps·‖Hₛ‖ with the Hₛ
    #   the refined solve saw, else the primal residual absorbs the
    #   mismatch (ΔHₛ)Δz ~ eps/μ.  PSD mul_hs runs in double-float
    #   (cones/psd.py) and the solve refines against the double-float
    #   (K, K_lo) pair (loop._kkt_prepare); the sparse backend applies
    #   the literally-assembled K (extension rows included) through its
    #   compensated matvec.
    df_mv = getattr(K_true, "df", None) if callable(K_true) else None
    if dz_lo is not None:
        from .kkt import compensated as _dfc2

        if df_mv is not None:
            # K-consistent route: the z-block rows of K_aug @ [0; Δz; Δy]
            # are exactly −(HₛΔz) as the refined solve saw it, extension
            # elimination included
            zn = jnp.zeros(n, dzf.dtype)
            hi, lo2 = df_mv(
                jnp.concatenate([zn, dzf]), jnp.concatenate([zn, dz_lo])
            )
            hs_hi, hs_lo = -hi[n : n + m], -lo2[n : n + m]
        else:
            hs_hi, hs_lo = cone_ops.mul_hs_df(
                layout, scaling_state, dz, dz_lo[:m]
            )
        # HₛΔz + c is itself a cancellation (|HₛΔz|_i >> |Δs|_i near the
        # boundary): carry the product as a double-float pair and TwoSum
        # through the cancellation before rounding
        sh, se = _dfc2._two_sum(hs_hi, ds_const)
        ds = -(sh + (se + hs_lo))
    else:
        ds = -(cone_ops.mul_hs(layout, scaling_state, dz) + ds_const)

    # Δκ (kktsystem.rs:202-203)
    dkappa = -(rkappa + kappa * dtau) / tau

    return (dx, ds, dz, dtau, dkappa)


def kkt_solve(
    layout, scaling_state, factors, K_true, P, q, A, b, x2, z2,
    rhs, variables, settings, is_combined,
):
    """Reduced 2-solve strategy for the homogeneous KKT system.

    reference: kktsystem.rs:127-209 — solve for (x1, z1), recover Δτ from the
    closed form with P-quadratic terms, then Δx/Δz/Δs/Δκ.
    """
    stacked, ds_const = kkt_solve_rhs(
        layout, scaling_state, rhs, variables, is_combined
    )
    sol, ok = solve_kkt_refined(factors, K_true, stacked, settings,
                                want_lo=True, keep_ext=True)
    step = kkt_solve_finish(
        layout, scaling_state, P, q, A, b, x2, z2, sol, ds_const, rhs,
        variables, K_true=K_true,
    )
    return step, ok


def _resolved_kkt_method(layout, settings, dtype, n, use_pallas=False):
    """Resolve the KKT backend name from settings + problem structure."""
    method = settings.direct_solve_method
    is_f32 = jnp.dtype(dtype) == jnp.float32
    if method == "auto":
        no_nonsym_no_psd = (
            layout.num_exp == 0
            and layout.num_pow == 0
            and layout.num_genpow == 0
            and layout.num_psd == 0
        )
        diag_hs = no_nonsym_no_psd and layout.m_soc == 0
        if is_f32 and diag_hs:
            # diagonal Hs (zero/NN cones): condensation stays well
            # conditioned (equality rows via the δ-proxy + refinement)
            method = "schur_diag"
        elif is_f32 and no_nonsym_no_psd:
            # zero/NN/SOC layouts: the SOC NT blocks factor exactly as
            # diag + rank-2 (socone.rs:186-226), so the Woodbury Schur
            # condensation keeps the MXU Cholesky path — measured ~20x
            # the batched throughput of the pivoted-LU fallback at
            # bench shapes, with refinement recovering f32 accuracy
            method = "schur_lr"
        elif (
            is_f32
            and use_pallas
            and layout.is_symmetric
            and layout.num_psd == 0
            and (n + layout.m) <= 1024
        ):
            # symmetric NON-PSD cone layouts on TPU: Pallas quasidefinite
            # LDLᵀ of the full KKT — VMEM-resident, ~2.4x the batched
            # throughput of pivoted LU on SOC layouts with better f32
            # convergence.  Gated by VMEM capacity (padded KKT must fit
            # on chip).  Nonsymmetric (exp/pow) Hessians are too
            # ill-conditioned for the unpivoted f32 factorization, and
            # PSD layouts reach cond(K) ~ 1/μ² ~ 1e10 at strict
            # complementarity where ANY plain-f32 factor's refinement
            # diverges — both route to "lu" (the double-float LU,
            # kkt/df_ldl.py, for N ≤ DF_LU_MAX_DIM).
            method = "pallas"
        else:
            method = "lu"
    return method


def _kkt_prepare(layout, settings, dtype, n, use_pallas, P, A, scaling_state,
                 sparse_kkt=None, row_shard=None):
    """Build KKT factors for the current scaling state.

    Returns (factors, K_true, ok) where K_true is a dense matrix or matvec
    closure for iterative refinement.  The structured diagonal-Schur path
    never materializes the KKT matrix at all.

    With ``sparse_kkt = (ctx, data)`` the KKT is never densified: Hs block
    values scatter into the canonical lower-triangle nonzero vector and the
    multifrontal engine refactors it (reference: qdldl.rs:468-700,
    kkt_assembly.rs:20-183).
    """
    if sparse_kkt is not None:
        from .kkt import sparse as kkt_sparse

        ctx, data = sparse_kkt
        hs_vals = cone_ops.hs_lower_vals(
            layout, scaling_state, dtype, ctx.soc_expanded, ctx.genpow_expanded
        )
        exp_vals = cone_ops.expansion_vals(
            layout, scaling_state, dtype, ctx.soc_expanded, ctx.genpow_expanded
        )
        if (
            ctx.dia_recipe
            and getattr(P, "kd", None) is not None
            and getattr(A, "kd", None) is not None
        ):
            # zero/NN layouts: the Kvals vector is never materialized —
            # sources scatter straight into the multifrontal assembly
            # workspace (fused factor) and K's DIA lanes assemble
            # scatter-free from the predia'd P/A lanes + the Hs diagonal
            mff, ok = kkt_sparse.factor_fused(
                ctx, data, P, A, hs_vals, exp_vals, settings,
                use_pallas=use_pallas,
            )
            K_true = kkt_sparse.make_matvec_sources(ctx, P, A, hs_vals)
        else:
            Kvals, Kreg = kkt_sparse.assemble(
                ctx, data, P, A, hs_vals, exp_vals, settings
            )
            mff, ok = kkt_sparse.factor(
                ctx, data, Kreg, settings, use_pallas=use_pallas
            )
            K_true = kkt_sparse.make_matvec(ctx, data, Kvals)
        return ("mf", (ctx, data, mff)), K_true, ok

    method = _resolved_kkt_method(layout, settings, dtype, n, use_pallas)

    # the structured Schur paths only represent zero/NN(/SOC for schur_lr)
    # scalings; demote an explicit request on an unsupported layout
    has_nonsym_or_psd = (
        layout.num_exp or layout.num_pow or layout.num_genpow or layout.num_psd
    )
    if method == "schur_lr" and has_nonsym_or_psd:
        method = "lu"
    if method == "schur_diag" and (has_nonsym_or_psd or layout.m_soc):
        method = "lu"

    if method == "schur_diag":
        # fully structured throughput path: neither the dense Hs nor the
        # (n+m)^2 K is ever materialized — diag(Hs) feeds the weighted
        # Gram Schur factor and refinement uses the closure matvec
        import numpy as _np

        hs_d = cone_ops.hs_diag(layout, scaling_state, dtype)
        eq_mask = None
        if layout.n_zero:
            eq_mask = _np.zeros(layout.m, _np.float32)
            eq_mask[: layout.n_zero] = 1.0  # zero cones lead the row order
        if row_shard is not None:
            mesh, axis = row_shard
            from .algebra.ell import ELLRowMat

            if isinstance(A, ELLRowMat):
                factors, matvec, ok = (
                    kkt_dense.prepare_schur_diag_rowsharded_ell(
                        P, A, hs_d, settings, eq_mask
                    )
                )
            else:
                factors, matvec, ok = kkt_dense.prepare_schur_diag_rowsharded(
                    P, A, hs_d, settings, eq_mask, mesh, axis
                )
        else:
            factors, matvec, ok = kkt_dense.prepare_schur_diag(
                P, A, hs_d, settings, eq_mask
            )
        return factors, matvec, ok

    if method == "schur_lr":
        h, U = cone_ops.hs_diag_lowrank(layout, scaling_state, dtype)
        factors, matvec, ok = kkt_dense.prepare_schur_lowrank(
            # zero cones lead the row order
            P, A, h, U, settings, n_eq=layout.n_zero
        )
        return factors, matvec, ok

    Hs, Hs_lo = cone_ops.hs_dense(layout, scaling_state, dtype, want_lo=True)
    K, K_reg = kkt_dense.assemble(P, A, Hs, settings)
    if method == "lu" and jnp.dtype(dtype) == jnp.float32:
        if K.shape[-1] <= kkt_dense.DF_LU_MAX_DIM:
            # f32: double-float LU (kkt/df_ldl.py) — the only f32 dense
            # factorization whose refinement still contracts at the
            # cond(K) ~ 1/mu^2 ~ 1e10 reached at strict complementarity
            K_reg_lo = None
            if Hs_lo is not None:
                K_reg_lo = jnp.zeros_like(K).at[n:, n:].set(-Hs_lo)
            factors, ok = kkt_dense.factor_df(K_reg, K_reg_lo)
        else:
            # large dense f32: Jacobi-equilibrated LU + refinement
            factors, ok = kkt_dense.factor_jacobi(K_reg, settings, n)
    else:
        factors, ok = _make_factor_fn(
            layout, settings, dtype, n, use_pallas, method
        )(K_reg)
    if Hs_lo is not None:
        # mixed-precision KKT: K is carried as a double-float (hi, lo)
        # pair whose lo part holds the PSD Hs blocks' rounding remainder.
        # The factorization uses the hi part; iterative refinement
        # (kkt/dense.py:solve_refined) refines against hi+lo, so the
        # solved direction is consistent with the exact NT geometry.
        K_lo = jnp.zeros_like(K).at[n:, n:].set(-Hs_lo)
        return factors, (K, K_lo), ok
    return factors, K, ok


def _make_factor_fn(layout, settings, dtype, n, use_pallas=False, method=None):
    """Select the dense factorization backend.

    "auto" mirrors the reference's auto backend choice (ldlsolvers/auto.rs):
    on TPU the Pallas quasidefinite LDLᵀ kernel factors the full KKT
    (accuracy-preserving, VMEM-resident); on non-TPU f32 backends the
    Schur-complement Cholesky condensation is used (zero cones make the
    condensation ill-posed, forcing LU); the f64 validation path keeps the
    pivoted-LU quasidefinite solve.
    """
    # NB: the Pallas quasidefinite LDL kernel (direct_solve_method =
    # "pallas") is opt-in for now pending Mosaic compile-time work.
    #
    # The Schur condensation requires a well-conditioned H = Hs + εI:
    # that holds only for diagonal-Hs layouts (pure nonnegative cones,
    # the high-throughput batch-QP class).  Zero cones give H ≈ εI and
    # SOC/exp/pow/PSD blocks grow ill-conditioned as μ → 0, so those
    # layouts keep the full quasidefinite (LU) factorization — matching
    # the reference's LDL-on-the-full-KKT approach.
    if method is None:
        method = _resolved_kkt_method(layout, settings, dtype, n, use_pallas)
    if method == "pallas":
        from .kkt import pallas_ldl

        return pallas_ldl.make_ldl_factor(n, layout.m, settings, dtype)  # unrolled variant
    if method == "schur":
        return lambda K_reg: kkt_dense.factor_schur(K_reg, n)
    return kkt_dense.factor


def default_start(layout, settings, P, q, A, b, p_is_zero, dtype,
                  use_pallas=False, sparse_kkt=None, row_shard=None):
    """Initial iterate.  reference: solver.rs:525-541, kktsystem.rs:211-259,
    variables.rs:164-178, 231-256."""
    n, m = q.shape[0], b.shape[0]

    if not layout.is_symmetric:
        z, s = cone_ops.unit_initialization(layout, dtype)
        x = jnp.zeros(n, dtype)
        return x, s, z, jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype)

    # symmetric: solve the KKT system with identity scalings
    state0 = cone_ops.set_identity_scaling(layout, dtype)
    factors, K, _ = _kkt_prepare(
        layout, settings, dtype, n, use_pallas, P, A, state0,
        sparse_kkt=sparse_kkt, row_shard=row_shard,
    )

    if p_is_zero:
        # LP initialization (kktsystem.rs:219-245)
        rhs1 = jnp.concatenate([jnp.zeros(n, dtype), b])
        rhs2 = jnp.concatenate([-q, jnp.zeros(m, dtype)])
        if sparse_kkt is not None:  # share the levelized sweeps
            joint, _ = solve_kkt_refined(
                factors, K, jnp.stack([rhs1, rhs2], axis=1), settings
            )
            sol1, sol2 = joint[:, 0], joint[:, 1]
        else:
            sol1, _ = solve_kkt_refined(factors, K, rhs1, settings)
            sol2, _ = solve_kkt_refined(factors, K, rhs2, settings)
        x = sol1[:n]
        s = -sol1[n:]
        z = sol2[n:]
    else:
        # QP initialization (kktsystem.rs:246-257)
        sol, _ = solve_kkt_refined(
            factors, K, jnp.concatenate([-q, b]), settings
        )
        x = sol[:n]
        z = sol[n:]
        s = -z

    # shift (s, z) into the cone interior (variables.rs:231-256)
    s = _shift_to_cone_interior(layout, s, cone_ops.PRIMAL)
    z = _shift_to_cone_interior(layout, z, cone_ops.DUAL)

    return x, s, z, jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype)


def _shift_to_cone_interior(layout, v, pd, floor=1.0):
    """reference: variables.rs:231-256.  ``floor`` is the minimum shift
    target: 1.0 for cold starts (the reference's unit-distance rule for an
    arbitrary iterate), small for warm starts — a converged iterate sits ON
    the cone boundary, and a unit shift would erase exactly the information
    the warm start carries (measured: warm-from-solution restarts at
    μ ≈ 2.4 with a unit floor vs μ ≈ 1e-2 with a 1e-2 floor)."""
    mn, pos = cone_ops.margins(layout, v, pd)
    degree = max(layout.degree, 1)
    target = jnp.maximum(floor, 0.1 * pos / degree)

    # two-stage shift to avoid catastrophic cancellation for large margins
    shift1 = jnp.where(mn <= 0, -mn, 0.0)
    shift2 = jnp.where(
        mn <= 0, target, jnp.where(mn < target, target - mn, 0.0)
    )
    v = cone_ops.scaled_unit_shift(layout, v, shift1, pd)
    v = cone_ops.scaled_unit_shift(layout, v, shift2, pd)
    return v


def run_ipm(layout, settings, P, q, A, b, equil, normq, normb, p_is_zero, dtype,
            callback=None, use_pallas=False, warm_start=None, sparse_kkt=None,
            row_shard=None):
    """The main loop.  Returns the final SolverState.

    ``callback``, when given, is a host function (dict of scalars) -> bool
    invoked once per iteration; returning True terminates the solve with
    CallbackTerminated (reference: callbacks.rs:93-96, solver.rs:311-314).

    ``warm_start``, when given, is an (x0, s0, z0) triple in the internal
    (equilibrated, permuted) frame used as the initial iterate, after
    shifting (s0, z0) strictly into the cone interior.  The reference
    always cold starts (SURVEY §5.4); this is an extra capability for
    MPC/SQP re-solve loops.

    reference: solver.rs:242-465
    """
    n, m = q.shape[0], b.shape[0]
    asym = not layout.is_symmetric

    if warm_start is not None:
        x = warm_start[0]
        # small interiority floor: a warm iterate lives near the boundary
        wfloor = 1e-2
        s = _shift_to_cone_interior(
            layout, warm_start[1], cone_ops.PRIMAL, floor=wfloor
        )
        z = _shift_to_cone_interior(
            layout, warm_start[2], cone_ops.DUAL, floor=wfloor
        )
        tau = jnp.asarray(1.0, dtype)
        # κ stays at the cold value: a centrality-consistent κ = sᵀz/deg
        # was measured to give no extra benefit on QP warm starts and to
        # stall the compact-chordal map (zero first steps -> status 10)
        kappa = jnp.asarray(1.0, dtype)
    else:
        x, s, z, tau, kappa = default_start(
            layout, settings, P, q, A, b, p_is_zero, dtype, use_pallas,
            sparse_kkt=sparse_kkt, row_shard=row_shard,
        )

    f = lambda v: jnp.asarray(v, dtype)
    init_scaling = (
        SCALING_PRIMAL_DUAL
        if layout.allows_primal_dual_scaling
        else SCALING_DUAL
    )
    time_start = (
        _clock() if settings.time_limit != float("inf") else None
    )

    st = SolverState(
        x=x, s=s, z=z, tau=tau, kappa=kappa,
        px=x, ps=s, pz=z, ptau=tau, pkappa=kappa,
        mu=f(0.0), sigma=f(1.0), step_length=f(0.0),
        iterations=jnp.asarray(0, jnp.int32),
        cost_primal=f(jnp.inf), cost_dual=f(-jnp.inf),
        res_primal=f(jnp.inf), res_dual=f(jnp.inf),
        res_primal_inf=f(jnp.inf), res_dual_inf=f(jnp.inf),
        gap_abs=f(jnp.inf), gap_rel=f(jnp.inf), ktratio=f(1.0),
        prev_cost_primal=f(jnp.inf), prev_cost_dual=f(-jnp.inf),
        prev_res_primal=f(jnp.inf), prev_res_dual=f(jnp.inf),
        prev_gap_abs=f(jnp.inf), prev_gap_rel=f(jnp.inf),
        dot_qx=f(0.0), dot_bz=f(0.0),
        status=jnp.asarray(_UNSOLVED, jnp.int32),
        scaling=jnp.asarray(init_scaling, jnp.int32),
        ip_pending=jnp.asarray(0, jnp.int32),
        history=jnp.full((settings.max_iter + 1, 9), jnp.nan, dtype),
    )

    def cond(st: SolverState):
        return st.status == _UNSOLVED

    def body(st: SolverState):
        r = compute_residuals(P, q, A, b, st.x, st.s, st.z, st.tau, st.kappa)
        mu = calc_mu(layout, r, st.tau, st.kappa)
        st = update_info(st._replace(mu=mu), r, equil, normq, normb)

        # record the progress row for this iterate (info_print.rs per-iter
        # table); α/σ are the values from the step that produced it
        row = jnp.stack(
            [
                st.cost_primal, st.cost_dual, st.gap_abs, st.gap_rel,
                st.res_primal, st.res_dual, st.ktratio, mu, st.step_length,
            ]
        )
        st = st._replace(history=st.history.at[st.iterations].set(row))

        status, ip_pending = check_termination(st, settings, dtype)
        st = st._replace(ip_pending=ip_pending)

        # wall-clock time limit (info.rs:224-226).  Only traced when a
        # finite limit is configured; the clock read is a host callback.
        if settings.time_limit != float("inf"):
            now = _clock()
            over = (now - time_start) > settings.time_limit
            status = jnp.where(
                (status == _UNSOLVED) & over, int(SolverStatus.MaxTime), status
            ).astype(jnp.int32)

        # user termination callback (checked before internal statuses win;
        # solver.rs:310-314)
        if callback is not None:
            from jax.experimental import io_callback

            info_snapshot = {
                "iterations": st.iterations,
                "cost_primal": st.cost_primal,
                "cost_dual": st.cost_dual,
                "gap_abs": st.gap_abs,
                "gap_rel": st.gap_rel,
                "res_primal": st.res_primal,
                "res_dual": st.res_dual,
                "ktratio": st.ktratio,
                "mu": mu,
                "step_length": st.step_length,
            }
            stop = io_callback(
                callback,
                jax.ShapeDtypeStruct((), jnp.bool_),
                info_snapshot,
                ordered=True,
            )
            status = jnp.where(
                stop, int(SolverStatus.CallbackTerminated), status
            ).astype(jnp.int32)

        # --- strategy checkpoint: insufficient progress (solver.rs:586-609)
        is_ip = status == int(SolverStatus.InsufficientProgress)
        retry_ip = is_ip & asym & (st.scaling == SCALING_PRIMAL_DUAL)

        def restore(st):
            return st._replace(
                x=st.px, s=st.ps, z=st.pz, tau=st.ptau, kappa=st.pkappa,
                cost_primal=st.prev_cost_primal, cost_dual=st.prev_cost_dual,
                res_primal=st.prev_res_primal, res_dual=st.prev_res_dual,
                gap_abs=st.prev_gap_abs, gap_rel=st.prev_gap_rel,
            )

        st = jax.tree.map(
            lambda a, b_: jnp.where(is_ip, a, b_), restore(st), st
        )
        status = jnp.where(retry_ip, _UNSOLVED, status)
        scaling = jnp.where(retry_ip, SCALING_DUAL, st.scaling)
        st = st._replace(status=status, scaling=scaling)

        proceed = (status == _UNSOLVED) & ~retry_ip

        def do_step(st: SolverState):
            # --- cone scaling update (solver.rs:327-338)
            scaling_state, ok_scale = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, dtype),
                st.s, st.z, mu, st.scaling,
            )
            # iterations only count successful KKT updates (solver.rs:340-342)
            st = st._replace(
                iterations=st.iterations + jnp.where(ok_scale, 1, 0).astype(jnp.int32)
            )

            # --- KKT update + constant-term solve (kktsystem.rs:108-125)
            factors, K, ok_f = _kkt_prepare(
                layout, settings, dtype, n, use_pallas, P, A, scaling_state,
                sparse_kkt=sparse_kkt, row_shard=row_shard,
            )
            variables = (st.x, st.s, st.z, st.tau, st.kappa)

            # --- affine step rhs (variables.rs:67-78)
            affine_rhs = (
                r.rx,
                cone_ops.affine_ds(layout, scaling_state, st.s),
                r.rz,
                r.rtau,
                st.tau * st.kappa,
            )
            rhs_const = jnp.concatenate([-q, b])
            rhs_aff, dsc_aff = kkt_solve_rhs(
                layout, scaling_state, affine_rhs, variables,
                is_combined=False,
            )
            if sparse_kkt is not None:
                # the constant-term and affine reduced solves are
                # independent: ride the levelized sweeps together as one
                # 2-RHS multifrontal solve
                joint, ok_ca = solve_kkt_refined(
                    factors, K, jnp.stack([rhs_const, rhs_aff], axis=1),
                    settings, want_lo=True, keep_ext=True,
                )
                j_hi, j_lo = joint
                sol_c = (j_hi[:, 0], None if j_lo is None else j_lo[:, 0])
                sol_a = (j_hi[:, 1], None if j_lo is None else j_lo[:, 1])
                ok_c = ok_a = ok_ca
            elif factors[0] == "df_lu":
                # dense double-float path: the constant-term and affine
                # reduced solves ride ONE 2-RHS substitution sweep (each
                # df solve is two N-step loops — halving the solve count
                # matters on the latency-bound TPU loop; the sparse path
                # above does the same through its levelized sweeps)
                joint, ok_ca = solve_kkt_refined(
                    factors, K, jnp.stack([rhs_const, rhs_aff], axis=1),
                    settings, want_lo=True,
                )
                j_hi, j_lo = joint
                sol_c = (j_hi[:, 0], None if j_lo is None else j_lo[:, 0])
                sol_a = (j_hi[:, 1], None if j_lo is None else j_lo[:, 1])
                ok_c = ok_a = ok_ca
            else:
                sol_c, ok_c = solve_kkt_refined(
                    factors, K, rhs_const, settings, want_lo=True
                )
                sol_a, ok_a = solve_kkt_refined(
                    factors, K, rhs_aff, settings, want_lo=True
                )
            if isinstance(sol_c, tuple):
                (c_hi, c_lo) = sol_c
                x2 = (c_hi[:n], None if c_lo is None else c_lo[:n])
                z2 = (c_hi[n:], None if c_lo is None else c_lo[n:])
            else:
                x2, z2 = sol_c[:n], sol_c[n:]
            aff = kkt_solve_finish(
                layout, scaling_state, P, q, A, b, x2, z2, sol_a, dsc_aff,
                affine_rhs, variables, K_true=K,
            )

            alpha_aff = calc_step_length(
                layout, scaling_state, aff, variables, settings,
                is_combined=False, scaling=st.scaling,
            )
            sigma = (1.0 - alpha_aff) ** 3  # solver.rs:543-545
            if jnp.dtype(dtype) == jnp.float32:
                # f32 centering floor: Mehrotra's σ = (1-α)³ can target
                # σμ ~ 1e-9, two orders below both what tol_gap needs
                # (μ ≈ gap/(deg+1)) and what f32 iterate rounding can
                # represent — the combined step then aims at an
                # unrepresentable point, steps collapse, and the lane
                # exits InsufficientProgress one iteration short of its
                # tolerance (observed on the strictly-complementary SDP
                # batch: stuck at gap 3.7e-5 with μ pushed to 1e-9).
                # Don't aim below the tolerance's own μ: clamp the target
                # to a quarter of tol_gap_abs/(deg+1).  f64 (the oracle
                # regime) keeps the reference's untouched σ.
                # gate on ktratio: infeasible problems produce their
                # certificate by DIVERGING (τ → 0, ktratio → 1+); forcing
                # centering there holds the iterate on the central path
                # forever (observed: a primal-infeasible LP running to
                # max_iter).  ktratio < 0.1 identifies a converging run.
                mu_floor = settings.tol_gap_abs / (layout.degree + 1) * 0.25
                sigma_clamped = jnp.minimum(
                    jnp.maximum(sigma, jnp.minimum(1.0, mu_floor / mu)), 1.0
                )
                sigma = jnp.where(st.ktratio < 0.1, sigma_clamped, sigma)

            # reduced Mehrotra correction on the first iteration
            # (solver.rs:380-382)
            m_corr = jnp.where(st.iterations > 1, 1.0, alpha_aff)

            # --- combined step rhs (variables.rs:80-115)
            dx_a, ds_a, dz_a, dtau_a, dkappa_a = aff
            sigma_mu = sigma * mu
            shift = cone_ops.combined_ds_shift(
                layout, scaling_state, m_corr * dz_a, ds_a, sigma_mu, st.z
            )
            comb_rhs = (
                (1.0 - sigma) * r.rx,
                affine_rhs[1] + shift,
                (1.0 - sigma) * r.rz,
                (1.0 - sigma) * r.rtau,
                -sigma_mu + m_corr * dtau_a * dkappa_a + st.tau * st.kappa,
            )
            comb, ok_cb = kkt_solve(
                layout, scaling_state, factors, K, P, q, A, b, x2, z2,
                comb_rhs, variables, settings, is_combined=True,
            )

            kkt_ok = ok_scale & ok_f & ok_c & ok_a & ok_cb

            # --- strategy checkpoint: numerical error (solver.rs:611-630)
            retry_ne = (~kkt_ok) & asym & (st.scaling == SCALING_PRIMAL_DUAL)
            fail_ne = (~kkt_ok) & (~retry_ne)
            # scaling failure is always fatal (solver.rs:654-665)
            fail_ne = fail_ne | (~ok_scale)
            retry_ne = retry_ne & ok_scale

            alpha = calc_step_length(
                layout, scaling_state, comb, variables, settings,
                is_combined=True, scaling=st.scaling,
            )

            if jnp.dtype(dtype) == jnp.float32 and layout.num_psd:
                # f32 PSD recovery: at cond(K) ~ 1/μ² the Mehrotra
                # corrector term is the noisiest part of the combined
                # direction; when the combined step collapses while the
                # affine step was healthy, the corrector is noise — take
                # a pure centering step (σ=1, no second-order term)
                # instead of a tiny noisy step that drifts the iterate
                # off-center and stalls the lane (observed: batch lanes
                # taking α ~ 0.03 steps with pres rising, then exiting
                # AlmostSolved one iteration from tolerance).  One extra
                # solve on the SAME factorization; f64 and non-PSD
                # layouts are untouched (reference semantics).
                cent_shift = cone_ops.combined_ds_shift(
                    layout, scaling_state, jnp.zeros_like(dz_a),
                    jnp.zeros_like(ds_a), mu, st.z
                )
                cent_rhs = (
                    jnp.zeros_like(r.rx),
                    affine_rhs[1] + cent_shift,
                    jnp.zeros_like(r.rz),
                    jnp.zeros_like(r.rtau),
                    -mu + st.tau * st.kappa,
                )
                cent, ok_cent = kkt_solve(
                    layout, scaling_state, factors, K, P, q, A, b, x2, z2,
                    cent_rhs, variables, settings, is_combined=True,
                )
                alpha_cent = calc_step_length(
                    layout, scaling_state, cent, variables, settings,
                    is_combined=True, scaling=st.scaling,
                )
                use_cent = (
                    (alpha < 0.3 * alpha_aff)
                    & (alpha < 0.7)
                    & (alpha_cent > 2.0 * alpha)
                )
                comb = jax.tree.map(
                    lambda cc, cb: jnp.where(use_cent, cc, cb), cent, comb
                )
                alpha = jnp.where(use_cent, alpha_cent, alpha)
                kkt_ok = kkt_ok & jnp.where(use_cent, ok_cent, True)
                fail_ne = fail_ne | (
                    use_cent & (~ok_cent) & (~retry_ne)
                )

            # direction finiteness: the Δτ recovery (num/den) and the
            # combined shift can produce inf/NaN without any factor-level
            # ok flag tripping (e.g. τ-denominator cancellation to 0);
            # taking such a step poisons the whole state pytree.  Treat a
            # non-finite direction or step length exactly like a KKT
            # numerical error (reference analog: solver.rs:611-630).
            dir_ok = jnp.isfinite(alpha)
            for _leaf in comb:
                dir_ok = dir_ok & jnp.all(jnp.isfinite(_leaf))
            retry_dir = (
                (~dir_ok) & asym & (st.scaling == SCALING_PRIMAL_DUAL)
            )
            fail_ne = fail_ne | ((~dir_ok) & (~retry_dir))
            retry_ne = retry_ne | (retry_dir & ok_scale)
            kkt_ok = kkt_ok & dir_ok

            # --- strategy checkpoint: small step (solver.rs:632-652)
            retry_ss = (
                asym
                & (st.scaling == SCALING_PRIMAL_DUAL)
                & (alpha < settings.min_switch_step_length)
            )
            fail_ss = (~retry_ss) & (
                alpha <= max(0.0, settings.min_terminate_step_length)
            )

            retry = (retry_ne | retry_ss) & (~fail_ne)
            fail = fail_ne | (fail_ss & ~retry)
            take = (~retry) & (~fail)

            status = jnp.where(
                fail_ne,
                int(SolverStatus.NumericalError),
                jnp.where(
                    fail_ss & ~retry_ne,
                    int(SolverStatus.InsufficientProgress),
                    _UNSOLVED,
                ),
            ).astype(jnp.int32)
            scaling = jnp.where(retry, SCALING_DUAL, st.scaling)

            dx, ds, dz, dtau, dkappa = comb
            a = jnp.where(take, alpha, 0.0)

            # homogeneous renormalization (variables.rs:219-228): iterates
            # are rays, so scaling by 1/max(τ, κ) is free — and essential
            # in f32, where stalled solves otherwise drive τ, κ into
            # underflow and poison the final unscaling
            new_tau = st.tau + a * dtau
            new_kappa = st.kappa + a * dkappa
            invscale = 1.0 / jnp.maximum(new_tau, new_kappa)
            st = st._replace(
                # save previous iterate before stepping (solver.rs:429-432)
                px=jnp.where(take, st.x, st.px),
                ps=jnp.where(take, st.s, st.ps),
                pz=jnp.where(take, st.z, st.pz),
                ptau=jnp.where(take, st.tau, st.ptau),
                pkappa=jnp.where(take, st.kappa, st.pkappa),
                prev_cost_primal=jnp.where(take, st.cost_primal, st.prev_cost_primal),
                prev_cost_dual=jnp.where(take, st.cost_dual, st.prev_cost_dual),
                prev_res_primal=jnp.where(take, st.res_primal, st.prev_res_primal),
                prev_res_dual=jnp.where(take, st.res_dual, st.prev_res_dual),
                prev_gap_abs=jnp.where(take, st.gap_abs, st.prev_gap_abs),
                prev_gap_rel=jnp.where(take, st.gap_rel, st.prev_gap_rel),
                x=(st.x + a * dx) * invscale,
                s=(st.s + a * ds) * invscale,
                z=(st.z + a * dz) * invscale,
                tau=new_tau * invscale,
                kappa=new_kappa * invscale,
                sigma=sigma,
                step_length=a,
                status=status,
                scaling=scaling,
            )
            return st

        st = jax.lax.cond(proceed, do_step, lambda s_: s_, st)
        return st

    st = jax.lax.while_loop(cond, body, st)

    # "almost solved" tier on error / iteration-limit exits
    # (info.rs:95-105, 308-337)
    errored = (
        (st.status == int(SolverStatus.NumericalError))
        | (st.status == int(SolverStatus.InsufficientProgress))
        | (st.status == int(SolverStatus.MaxIterations))
        | (st.status == int(SolverStatus.MaxTime))
    )
    reduced_tols = (
        settings.reduced_tol_gap_abs,
        settings.reduced_tol_gap_rel,
        settings.reduced_tol_feas,
        settings.reduced_tol_infeas_abs,
        settings.reduced_tol_infeas_rel,
        settings.reduced_tol_ktratio,
    )
    almost = check_convergence(
        st,
        reduced_tols,
        (
            int(SolverStatus.AlmostSolved),
            int(SolverStatus.AlmostPrimalInfeasible),
            int(SolverStatus.AlmostDualInfeasible),
        ),
    )
    st = st._replace(
        status=jnp.where(errored & (almost != _UNSOLVED), almost, st.status)
    )
    return st
