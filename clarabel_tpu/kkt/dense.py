"""Dense KKT solver: assembly, factorization, refined solves.

TPU-first counterpart of the reference's sparse quasidefinite LDL stack
(reference: src/solver/core/kktsolvers/direct/quasidef/directldlkktsolver.rs).
The KKT matrix

    K = [ P   Aᵀ ]
        [ A  -Hs ]

is assembled densely (block-diagonal Hs comes from the cone layout) so the
factorization maps onto the MXU; we factor the *statically regularized*
K + ε·diag(Dsigns) once per IPM iteration and recover accuracy with
iterative refinement against the unregularized K — exactly the reference's
scheme (static regularization: directldlkktsolver.rs:217-264; refinement:
:266-321), with LU-with-pivoting standing in for the quasidefinite LDL
(identical solve semantics, and batched LU lowers well on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def assemble(P, A, Hs, settings):
    """Returns (K_true, K_reg).

    reference: kkt_assembly.rs:20-52 for the block structure;
    directldlkktsolver.rs:217-264 + _compute_regularizer for the static
    regularization ε = constant + proportional·max|diag(K)| applied with
    sign +1 on the first n entries and -1 on the last m.
    """
    n = P.shape[0]
    m = A.shape[0]
    K = jnp.block([[P, A.T], [A, -Hs]])

    if settings.static_regularization_enable:
        diag = jnp.diagonal(K)
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional * jnp.max(jnp.abs(diag))
        )
        dsigns = jnp.concatenate(
            [jnp.ones(n, K.dtype), -jnp.ones(m, K.dtype)]
        )
        K_reg = K + jnp.diag(dsigns * eps)
    else:
        K_reg = K
    return K, K_reg


def factor(K_reg):
    """LU factorization of the regularized KKT matrix."""
    lu, piv = jsl.lu_factor(K_reg)
    ok = jnp.all(jnp.isfinite(lu))
    return (lu, piv), ok


def solve_refined(factors, K_true, rhs, settings):
    """Solve K x = rhs with iterative refinement against the true
    (unregularized) KKT matrix.

    Returns (x, ok).  reference: directldlkktsolver.rs:266-321 — bounded
    refinement loop with stall detection, expressed as ``lax.while_loop``.
    """
    lu, piv = factors
    x0 = jsl.lu_solve((lu, piv), rhs)

    if not settings.iterative_refinement_enable:
        return x0, jnp.all(jnp.isfinite(x0))

    reltol = settings.iterative_refinement_reltol
    abstol = settings.iterative_refinement_abstol
    maxiter = settings.iterative_refinement_max_iter
    stopratio = settings.iterative_refinement_stop_ratio

    normb = jnp.max(jnp.abs(rhs))

    def error_norm(x):
        e = rhs - K_true @ x
        return e, jnp.max(jnp.abs(e))

    e0, norme0 = error_norm(x0)
    ok0 = jnp.isfinite(norme0)

    def cond(carry):
        _, _, norme, k, done, _ = carry
        within_tol = norme <= (abstol + reltol * normb)
        return (~done) & (~within_tol) & (k < maxiter)

    def body(carry):
        x, e, norme, k, done, ok = carry
        dx = jsl.lu_solve((lu, piv), e)
        xnew = x + dx
        enew, normenew = error_norm(xnew)
        isfin = jnp.isfinite(normenew)

        improved_ratio = norme / normenew
        # stalling: keep the better iterate and stop
        # (directldlkktsolver.rs:305-315)
        stalled = improved_ratio < stopratio
        take_new = isfin & ((~stalled) | (improved_ratio > 1.0))

        x = jnp.where(take_new, xnew, x)
        e = jnp.where(take_new, enew, e)
        norme = jnp.where(take_new, normenew, norme)
        done = stalled | (~isfin)
        ok = ok & isfin
        return x, e, norme, k + 1, done, ok

    x, _, _, _, _, ok = jax.lax.while_loop(
        cond, body, (x0, e0, norme0, 0, jnp.asarray(False), ok0)
    )
    return x, ok & jnp.all(jnp.isfinite(x))
