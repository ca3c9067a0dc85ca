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
    return ("lu", (lu, piv)), ok


# dimension gate for the double-float LU (kkt/df_ldl.py): its column
# fori_loop costs one step per column, so very large dense systems keep
# the one-dispatch pivoted LU + refinement instead (and those route to
# the multifrontal engine anyway at this size).  Env-overridable for
# experiments (CT_DF_LU_MAX_DIM=0 disables).
import os as _os

DF_LU_MAX_DIM = int(_os.environ.get("CT_DF_LU_MAX_DIM", "512"))


def factor_df(K_reg, K_reg_lo=None):
    """Double-float LU with partial pivoting (kkt/df_ldl.py): the f32
    factorization whose application error ~eps_df keeps iterative
    refinement contracting even at cond(K) ~ 1e10 (see the df_ldl module
    docstring for the measured failure of every plain-f32 factorization
    at strict complementarity)."""
    from . import df_ldl

    fac, ok = df_ldl.factor(K_reg, K_reg_lo)
    return ("df_lu", fac), ok


def factor_jacobi(K_reg, settings, n):
    """f32 LU on the Jacobi-equilibrated regularized KKT.

    Near convergence ‖K‖ grows like the largest NT weight (~1/μ); once
    eps32·‖K‖ ≳ 1 the refinement loop's contraction factor
    ‖K_reg⁻¹‖·eps·‖K‖ exceeds one and refinement diverges on rhs with
    soft-mode content (observed: the constant-term solve [−q; b]
    residual jumping 1e-12 → 1e-2 in the final iterations).  Factoring
    D·K_reg·D (D = |diag K_reg|^(-1/2)) bounds the scaled norm at O(1)
    so the per-sweep contraction stays ~eps·cond(D·K·D).  The reference
    needs no equivalent because f64 keeps eps·‖K‖ ≪ 1 through
    convergence (directldlkktsolver.rs:217-264).
    """
    del n, settings
    K = K_reg
    diag = jnp.abs(jnp.diagonal(K))
    d = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    Ks = K * d[:, None] * d[None, :]
    lu, piv = jsl.lu_factor(Ks)
    ok = jnp.all(jnp.isfinite(lu))
    return ("lu_jacobi", (lu, piv, d)), ok


def factor_schur(K_reg, n):
    """Schur-complement factorization of the regularized quasidefinite KKT.

    With K = [[P̃, Aᵀ], [A, -H̃]] (P̃ = P + εI, H̃ = Hs + εI ≻ 0), solving
    K [x1; x2] = [b1; b2] reduces to two SPD Cholesky solves:

        x2 = H̃⁻¹ (A x1 - b2)
        (P̃ + Aᵀ H̃⁻¹ A) x1 = b1 + Aᵀ H̃⁻¹ b2

    Cholesky lowers natively on TPU (MXU-friendly blocked algorithm, far
    cheaper to compile and run than the LU expansion), and the iterative
    refinement loop against the full K recovers the accuracy lost to the
    condensation — the same recovery mechanism the reference uses for its
    static regularization (directldlkktsolver.rs:266-321).
    """
    Pt = K_reg[:n, :n]
    A = K_reg[n:, :n]
    Hneg = K_reg[n:, n:]  # = -(Hs + εI)
    LH = jnp.linalg.cholesky(-Hneg)

    def h_solve(v):
        return jsl.cho_solve((LH, True), v)

    S = Pt + A.T @ h_solve(A)
    LS = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(LH)) & jnp.all(jnp.isfinite(LS))
    return ("schur", (LH, LS, A, n)), ok


def prepare_schur_diag(P, A, hs_diag, settings, eq_mask=None):
    """Fully structured diagonal-H KKT preparation for diagonal-Hs layouts
    (zero/nonnegative cones): H⁻¹ is an elementwise reciprocal and S builds
    with one weighted Gram matmul — the MXU-optimal path for the batched
    (box-)QP workload.  Neither the dense Hs nor the (n+m)^2 K is ever
    materialized (per-iteration memory O(mn), not O(m^2)).  Returns
    (factors, matvec, ok) where ``matvec`` applies the *unregularized* K
    for iterative refinement.

    Zero-cone (equality) rows have only the tiny static regularization on
    their H diagonal; ``eq_mask`` marks them so a heavier proxy
    regularization δ ≈ 1e-3·max|diag| keeps the condensation well
    conditioned in f32 — the iterative refinement against the true K then
    recovers full f32 accuracy in 2-3 sweeps (the same recovery mechanism
    the reference uses for its static regularization,
    directldlkktsolver.rs:266-321).
    """
    n = P.shape[0]
    maxdiag = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(P)), initial=0.0),
        jnp.max(hs_diag, initial=0.0),
    )
    if settings.static_regularization_enable:
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional * maxdiag
        )
    else:
        eps = 0.0

    h = hs_diag + eps
    if eq_mask is not None:
        delta_eq = 1e-3 * maxdiag
        h = h + jnp.asarray(eq_mask, P.dtype) * delta_eq
    hinv = 1.0 / h
    S = P + eps * jnp.eye(n, dtype=P.dtype) + A.T @ (hinv[:, None] * A)
    LS = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(LS)) & jnp.all(h > 0)

    def matvec(v):
        v1, v2 = v[:n], v[n:]
        return jnp.concatenate(
            [P @ v1 + A.T @ v2, A @ v1 - hs_diag * v2]
        )

    return ("schur_diag", (hinv, LS, A, n)), matvec, ok


def prepare_schur_lowrank(P, A, h, U, settings, n_eq=0):
    """Woodbury extension of :func:`prepare_schur_diag` to diag+rank-1
    layouts (zero/NN/SOC cones): each SOC NT block factors *exactly* as a
    signed diagonal plus rank-1, WᵀW = η²·diag(-1,1,…,1) + ccᵀ with
    c = √2ηw (socone.rs:227-245), so the condensation over the
    inequality rows

        S = P̃ + A_iᵀ H̃_i⁻¹ A_i,    H̃_i = diag(h̃_i) + U_i U_iᵀ ≻ 0

    applies H̃_i⁻¹ via the Woodbury identity — one [n, k] matmul plus k
    *scalar* capacitances 1 + cᵀD⁻¹c = -1 + O(ε/η²) (analytically exact
    for normalized w; disjoint cone supports make the capacitance matrix
    diagonal) — and batched SOCPs ride the same MXU Cholesky path as the
    diagonal QP class instead of a pivoted LU of the full KKT.

    Equality (zero-cone) rows — the leading ``n_eq`` rows of A — are NOT
    condensed through their (tiny) regularization diagonal: they are
    eliminated exactly at a second level through the p×p SPD Schur
    complement E = A_e S⁻¹ A_eᵀ + εI, avoiding the 1/ε amplification a
    diagonal proxy would need.  Iterative refinement against the exact K
    recovers whatever the f32 product form loses
    (directldlkktsolver.rs:266-321).

    Returns (factors, matvec, ok); ``matvec`` applies the unregularized K.
    """
    n = P.shape[0]
    m = A.shape[0]
    p = int(n_eq)
    A_e, A_i = A[:p], A[p:]
    h_i = h[p:]
    k = U.shape[1]
    U_i = U[p:]

    # true Hs diagonal (for the regularization magnitude): h + Σ_k U²
    hs_full_diag = h + jnp.sum(U**2, axis=1) if k else h
    maxdiag = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(P)), initial=0.0),
        jnp.max(jnp.abs(hs_full_diag), initial=0.0),
    )
    if settings.static_regularization_enable:
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional * maxdiag
        )
    else:
        eps = jnp.asarray(
            jnp.finfo(P.dtype).eps, P.dtype
        )  # the eq-block elimination needs ε > 0

    # signed static regularization: ε with the sign of the (signed)
    # diagonal so SOC head entries move away from zero, not across it
    d = h_i + jnp.where(h_i < 0, -eps, eps)
    dinv = 1.0 / d

    if k:
        # scalar capacitances m_c = 1 + c_cᵀ D⁻¹ c_c  (≈ -1 analytically)
        B = dinv[:, None] * U_i
        caps = 1.0 + jnp.einsum("mk,mk->k", U_i, B)
        capinv = 1.0 / caps
        ok_lr = jnp.all(jnp.abs(caps) > 0.1) & jnp.all(jnp.isfinite(capinv))
    else:
        capinv = jnp.zeros((0,), P.dtype)
        ok_lr = jnp.asarray(True)

    def hinv_apply(V):
        """(H̃_i)⁻¹ V for V of shape [m - p] or [m - p, r]."""
        vec = V.ndim == 1
        Vm = V[:, None] if vec else V
        Wv = dinv[:, None] * Vm
        if k:
            t = capinv[:, None] * (U_i.T @ Wv)
            Wv = Wv - dinv[:, None] * (U_i @ t)
        return Wv[:, 0] if vec else Wv

    S = P + eps * jnp.eye(n, dtype=P.dtype) + A_i.T @ hinv_apply(A_i)
    LS = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(LS)) & jnp.all(d != 0) & ok_lr

    if p:
        # second-level equality Schur complement (exact elimination)
        E = A_e @ jsl.cho_solve((LS, True), A_e.T) + eps * jnp.eye(
            p, dtype=P.dtype
        )
        LE = jnp.linalg.cholesky(E)
        ok = ok & jnp.all(jnp.isfinite(LE))
    else:
        LE = None

    def matvec(v):
        v1, v2 = v[:n], v[n:]
        hs_v2 = h * v2
        if k:
            hs_v2 = hs_v2 + U @ (U.T @ v2)
        return jnp.concatenate([P @ v1 + A.T @ v2, A @ v1 - hs_v2])

    return ("schur_lr", (hinv_apply, LS, LE, A_e, A_i, n, p)), matvec, ok


def prepare_schur_diag_rowsharded(P, A, hs_diag, settings, eq_mask, mesh, axis):
    """Row-sharded variant of :func:`prepare_schur_diag` with the
    communication pattern fixed *by construction* via ``shard_map``:

      - S = P̃ + Σ_k A_kᵀ H_k⁻¹ A_k assembles as one per-shard weighted
        Gram matmul + an explicit ``psum`` over the row axis (SURVEY §5.8:
        Schur-complement reduction across KKT blocks);
      - Aᵀv products psum the per-shard partials; A·v stays local;
      - A is NEVER all-gathered — each device holds only its row block.

    The [n, n] Schur factorization is replicated.  ``mesh``/``axis`` name
    the row-sharding axis; everything here runs inside the jitted solve.
    """
    from jax.sharding import PartitionSpec as PS

    shard_map = jax.shard_map

    n = P.shape[0]
    maxdiag = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(P)), initial=0.0),
        jnp.max(hs_diag, initial=0.0),
    )
    if settings.static_regularization_enable:
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional * maxdiag
        )
    else:
        eps = 0.0
    h = hs_diag + eps
    if eq_mask is not None:
        h = h + jnp.asarray(eq_mask, P.dtype) * (1e-3 * maxdiag)
    hinv = 1.0 / h

    gram = shard_map(
        lambda Ab, hb: jax.lax.psum(Ab.T @ (hb[:, None] * Ab), axis),
        mesh=mesh, in_specs=(PS(axis, None), PS(axis)), out_specs=PS(),
    )
    _at = shard_map(
        lambda Ab, vb: jax.lax.psum(Ab.T @ vb, axis),
        mesh=mesh, in_specs=(PS(axis, None), PS(axis)), out_specs=PS(),
    )
    _a = shard_map(
        lambda Ab, v: Ab @ v,
        mesh=mesh, in_specs=(PS(axis, None), PS()), out_specs=PS(axis),
    )
    at_v = lambda v: _at(A, v)
    a_v = lambda v: _a(A, v)

    S = P + eps * jnp.eye(n, dtype=P.dtype) + gram(A, hinv)
    LS = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(LS)) & jnp.all(h > 0)

    def matvec(v):
        v1, v2 = v[:n], v[n:]
        return jnp.concatenate([P @ v1 + at_v(v2), a_v(v1) - hs_diag * v2])

    return ("schur_diag_sh", (hinv, LS, at_v, a_v, n)), matvec, ok


def prepare_schur_diag_rowsharded_ell(P, A, hs_diag, settings, eq_mask):
    """Sparse (ELL) variant of :func:`prepare_schur_diag_rowsharded`:
    A arrives as a row-sharded :class:`~clarabel_tpu.algebra.ell.ELLRowMat`
    (VERDICT r4 #5 — tall problems without a dense host A).

    The Schur Gram reduction S = P̃ + Σ_k A_kᵀ H_k⁻¹ A_k needs an MXU
    operand, so each shard scatters its ELL row block into a dense
    [m_loc, n] tile on device (loop-invariant: XLA hoists it out of the
    IPM while-loop) and the reduction stays one per-shard matmul + psum.
    Residual/refinement matvecs keep the sparse gather/scatter form.
    A — in either form — is never all-gathered.
    """
    from jax.sharding import PartitionSpec as PS

    mesh, axis = A.mesh, A.axis
    n = P.shape[0]
    maxdiag = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(P)), initial=0.0),
        jnp.max(hs_diag, initial=0.0),
    )
    if settings.static_regularization_enable:
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional * maxdiag
        )
    else:
        eps = 0.0
    h = hs_diag + eps
    if eq_mask is not None:
        h = h + jnp.asarray(eq_mask, P.dtype) * (1e-3 * maxdiag)
    hinv = 1.0 / h

    Ad = A.densify_sharded()
    gram = jax.shard_map(
        lambda Ab, hb: jax.lax.psum(Ab.T @ (hb[:, None] * Ab), axis),
        mesh=mesh, in_specs=(PS(axis, None), PS(axis)), out_specs=PS(),
    )
    at_v = lambda v: A.T @ v
    a_v = lambda v: A @ v

    S = P + eps * jnp.eye(n, dtype=P.dtype) + gram(Ad, hinv)
    LS = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(LS)) & jnp.all(h > 0)

    def matvec(v):
        v1, v2 = v[:n], v[n:]
        return jnp.concatenate([P @ v1 + at_v(v2), a_v(v1) - hs_diag * v2])

    return ("schur_diag_sh", (hinv, LS, at_v, a_v, n)), matvec, ok


def _raw_solve(factors, rhs):
    kind, data = factors
    if kind == "lu":
        return jsl.lu_solve(data, rhs)
    if kind == "lu_jacobi":
        lu, piv, d = data
        ds = d if rhs.ndim == 1 else d[:, None]
        return ds * jsl.lu_solve((lu, piv), ds * rhs)
    if kind == "df_lu":
        from . import df_ldl

        return df_ldl.solve(data, rhs)
    if kind == "schur_diag_sh":
        hinv, LS, at_v, a_v, n = data
        b1, b2 = rhs[:n], rhs[n:]
        x1 = jsl.cho_solve((LS, True), b1 + at_v(hinv * b2))
        x2 = hinv * (a_v(x1) - b2)
        return jnp.concatenate([x1, x2])
    if kind == "mf":
        from . import sparse as kkt_sparse

        ctx, sdata, mff = data
        return kkt_sparse.solve(ctx, sdata, mff, rhs)
    if kind == "pldl":
        from . import pallas_ldl

        packed, N = data
        return pallas_ldl.ldl_solve(packed, N, rhs)
    if kind == "pldl_lower":
        from . import pallas_ldl

        packed, N = data
        return pallas_ldl.ldl_solve_lower(packed, N, rhs)
    if kind == "schur_diag":
        hinv, LS, A, n = data
        b1, b2 = rhs[:n], rhs[n:]
        x1 = jsl.cho_solve((LS, True), b1 + A.T @ (hinv * b2))
        x2 = hinv * (A @ x1 - b2)
        return jnp.concatenate([x1, x2])
    if kind == "schur_lr":
        hinv_apply, LS, LE, A_e, A_i, n, p = data
        b1 = rhs[:n]
        b2e, b2i = rhs[n : n + p], rhs[n + p :]
        c1 = b1 + A_i.T @ hinv_apply(b2i)
        t = jsl.cho_solve((LS, True), c1)
        if p:
            y_e = jsl.cho_solve((LE, True), A_e @ t - b2e)
            x1 = t - jsl.cho_solve((LS, True), A_e.T @ y_e)
        else:
            y_e = jnp.zeros(0, rhs.dtype)
            x1 = t
        y_i = hinv_apply(A_i @ x1 - b2i)
        return jnp.concatenate([x1, y_e, y_i])
    LH, LS, A, n = data
    b1, b2 = rhs[:n], rhs[n:]
    w = jsl.cho_solve((LH, True), b2)
    x1 = jsl.cho_solve((LS, True), b1 + A.T @ w)
    x2 = jsl.cho_solve((LH, True), A @ x1 - b2)
    return jnp.concatenate([x1, x2])


def solve_refined(factors, K_true, rhs, settings, want_lo=False):
    """Solve K x = rhs with iterative refinement against the true
    (unregularized) KKT matrix.

    ``K_true`` may be a dense matrix or a matvec callable (structured
    paths).  Returns (x, ok), or ((x, x_lo), ok) with ``want_lo``: the
    compensated path accumulates the solution as a double-float pair so
    its refinement floor is not limited by the f32 representation of x —
    x_lo carries the sub-eps remainder (zeros on uncompensated paths).
    reference: directldlkktsolver.rs:266-321 — bounded refinement loop
    with stall detection as ``lax.while_loop``.
    """
    # K_true may be a double-float (hi, lo) pair (f32 PSD layouts): the lo
    # part carries the Hs blocks' rounding remainder (loop._kkt_prepare)
    K_lo = None
    if isinstance(K_true, tuple):
        K_true, K_lo = K_true

    x0 = _raw_solve(factors, rhs)

    if not settings.iterative_refinement_enable:
        ok = jnp.all(jnp.isfinite(x0))
        return ((x0, None), ok) if want_lo else (x0, ok)

    reltol = settings.iterative_refinement_reltol
    abstol = settings.iterative_refinement_abstol
    maxiter = settings.iterative_refinement_max_iter
    stopratio = settings.iterative_refinement_stop_ratio

    # f32 + dense K: evaluate the refinement residual in double-float
    # (kkt/compensated.py).  Plain-f32 residuals bound the step's forward
    # error at O(eps32 * cond(K)) ~ 0.1 near convergence (cond ~ 1/mu);
    # the compensated residual restores mixed-precision IR's forward
    # convergence, so refinement is driven to the arithmetic floor and the
    # stall detector bounds the sweep count.
    compensate_dense = (
        not callable(K_true)
        and K_true.dtype == jnp.float32
        and K_true.shape[-1] <= 4096
    )
    # sparse/structured closures advertise a compensated product as a
    # ``.df`` attribute (kkt/sparse.py): same mixed-precision refinement,
    # evaluated matrix-free
    df_mv = getattr(K_true, "df", None) if callable(K_true) else None
    compensate_sparse = df_mv is not None and rhs.dtype == jnp.float32
    compensate = compensate_dense or compensate_sparse
    if factors[0] == "schur_lr" or compensate:
        # (schur_lr: the Woodbury condensation leaves a larger one-pass
        # error than a backward-stable pivoted LU, so it also refines to
        # the floor rather than the preset target)
        reltol = min(reltol, 1e-9)
        abstol = min(abstol, 1e-8)
    if compensate:
        # near μ → 0 the per-sweep contraction degrades toward 1; the
        # default stall ratio (5x/sweep) would abandon a slowly but
        # monotonically converging refinement exactly when the step
        # accuracy matters most.  With the compensated residual each
        # sweep is trustworthy, so keep refining while there is any
        # monotone progress.
        stopratio = min(stopratio, 1.05)
        maxiter = max(maxiter, 25)
    if factors[0] == "df_lu":
        # the double-float factor already applies with ~eps² error: one
        # polish sweep reaches the floor; the patient 25-sweep budget
        # above exists for PLAIN factors whose per-sweep contraction
        # degrades near μ → 0.  Each df solve is two N-step substitution
        # loops, so uncapped sweeps dominated the whole batched-SDP
        # iteration on TPU (measured ~67 ms/iter; the factor+2 sweeps
        # alone are ~2 ms).
        maxiter = min(maxiter, 2)

    normb = jnp.max(jnp.abs(rhs))
    k_matvec = K_true if callable(K_true) else (lambda v: K_true @ v)

    if compensate:
        from . import compensated

        if compensate_sparse:
            def error_norm(x, x_lo):
                hi, lo = df_mv(x, x_lo)
                d, derr = compensated._two_sum(rhs, -hi)
                e = d + (derr - lo)
                return e, jnp.max(jnp.abs(e))
        else:
            def error_norm(x, x_lo):
                # residual against the double-float solution: the lo
                # stream's contribution is eps-scaled, a plain matvec of
                # it suffices
                e = compensated.residual(K_true, x, rhs, K_lo=K_lo)
                e = e - k_matvec(x_lo)
                if K_lo is not None:
                    e = e - K_lo @ x_lo
                return e, jnp.max(jnp.abs(e))

        def accumulate(x, x_lo, dx):
            # TwoSum the correction into the double-float solution so the
            # refinement floor is not capped by f32 representation of x
            s, err = compensated._two_sum(x, dx)
            return s, x_lo + err
    else:
        def error_norm(x, x_lo):
            e = rhs - k_matvec(x)
            return e, jnp.max(jnp.abs(e))

        def accumulate(x, x_lo, dx):
            return x + dx, x_lo

    x_lo0 = jnp.zeros_like(x0)
    e0, norme0 = error_norm(x0, x_lo0)
    ok0 = jnp.isfinite(norme0)

    def cond(carry):
        _, _, _, norme, k, done, _ = carry
        within_tol = norme <= (abstol + reltol * normb)
        return (~done) & (~within_tol) & (k < maxiter)

    def body(carry):
        x, x_lo, e, norme, k, done, ok = carry
        dx = _raw_solve(factors, e)
        xnew, xnew_lo = accumulate(x, x_lo, dx)
        enew, normenew = error_norm(xnew, xnew_lo)
        isfin = jnp.isfinite(normenew)

        improved_ratio = norme / normenew
        # stalling: keep the better iterate and stop
        # (directldlkktsolver.rs:305-315)
        stalled = improved_ratio < stopratio
        take_new = isfin & ((~stalled) | (improved_ratio > 1.0))

        x = jnp.where(take_new, xnew, x)
        x_lo = jnp.where(take_new, xnew_lo, x_lo)
        e = jnp.where(take_new, enew, e)
        norme = jnp.where(take_new, normenew, norme)
        done = stalled | (~isfin)
        ok = ok & isfin
        return x, x_lo, e, norme, k + 1, done, ok

    x, x_lo, _, _, _, _, ok = jax.lax.while_loop(
        cond, body, (x0, x_lo0, e0, norme0, 0, jnp.asarray(False), ok0)
    )
    ok = ok & jnp.all(jnp.isfinite(x))
    if want_lo:
        # None (static) on uncompensated paths so callers skip lo work
        return (x, x_lo if compensate else None), ok
    return x, ok
