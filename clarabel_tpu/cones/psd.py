"""PSD triangle cones, batched by matrix dimension.

TPU-native counterpart of the reference PSD cone
(reference: src/solver/core/cones/psdtrianglecone.rs).  All cones of equal
matrix dimension n are batched into [k, n, n] tensors and processed with
vmapped XLA linalg (cholesky / svd / eigh) — the reference's per-cone
LAPACK calls (xpotrf/xgesdd/xsyevr) become single batched device ops.

The symmetric Kronecker product skron(A) (reference:
psdtrianglecone.rs:467-509) is materialized without loops via the closed
form  skron(A)[(ij),(kl)] = (A_ik A_jl + A_il A_jk) · f(i=j) · f(k=l)
with f(true) = 1/√2, using the bucket's precomputed svec index arrays.

svec packing follows the reference convention: column-major upper triangle
with √2-scaled off-diagonals (algebra/dense/matrix_math.rs:165-202).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import api
from .layout import ConeLayout, PSDBucket


# Frame choice for the double-float PSD algebra's 1/√2 constants.
# False (default): the f32-ROUNDED constant is treated as exact and used
# consistently by every svec/skron site — the whole PSD pipeline then
# lives in one self-consistent "rounded frame" (a relative eps32
# perturbation of the real geometry, benign like any scaling
# perturbation).  True: df-exact constants — more accurate per-site but
# only the df sites can afford them, leaving the plain conversions in the
# other frame; measured worse on the batched SDP bench (46/64 vs 64/64).
_EXACT_SQRT2 = False


def _psd_slice(layout):
    return layout.slice_of(api.PSD)


def _to_mat(bucket: PSDBucket, x):
    """[k, tri] svec -> [k, n, n] symmetric matrices."""
    vals = x * bucket.unpack_scale
    k = x.shape[0]
    M = jnp.zeros((k, bucket.n, bucket.n), x.dtype)
    M = M.at[:, bucket.I, bucket.J].set(vals)
    M = M.at[:, bucket.J, bucket.I].set(vals)
    diag_vals = x[:, bucket.is_diag]
    M = M.at[:, np.arange(bucket.n), np.arange(bucket.n)].set(diag_vals)
    return M


def _to_svec(bucket: PSDBucket, M):
    """[k, n, n] (possibly nonsymmetric) -> [k, tri] svec, symmetrizing."""
    up = M[:, bucket.I, bucket.J]
    lo = M[:, bucket.J, bucket.I]
    return jnp.where(
        bucket.is_diag, up, (up + lo) * (1.0 / np.sqrt(2.0))
    )


def _diag_positions(bucket: PSDBucket):
    return np.nonzero(bucket.is_diag)[0]


def _to_mat_df(bucket: PSDBucket, x, x_lo=None):
    """Double-float svec→mat: the plain `_to_mat` rounds x/√2 at eps,
    and a congruence with ‖A‖² ~ ‖Hs‖ amplifies that relative input
    perturbation by the scaling's condition number — inconsistent with
    the KKT matrix, whose skron entries absorb the √2 factors exactly.
    Returns (M_hi, M_lo)."""
    from ..kkt import compensated as dfc

    ush = jnp.asarray(bucket.unpack_scale_h, x.dtype)
    vh, ve = dfc._two_prod(x, ush)
    if _EXACT_SQRT2:
        ve = ve + x * jnp.asarray(bucket.unpack_scale_l, x.dtype)
    if x_lo is not None:
        ve = ve + x_lo * ush
    k = x.shape[0]

    def build(vals, diag_vals):
        M = jnp.zeros((k, bucket.n, bucket.n), x.dtype)
        M = M.at[:, bucket.I, bucket.J].set(vals)
        M = M.at[:, bucket.J, bucket.I].set(vals)
        M = M.at[:, np.arange(bucket.n), np.arange(bucket.n)].set(diag_vals)
        return M

    Mh = build(vh, x[:, bucket.is_diag])
    Ml = build(
        ve,
        (x_lo[:, bucket.is_diag] if x_lo is not None
         else jnp.zeros((k, bucket.n), x.dtype)),
    )
    return Mh, Ml


def _to_svec_df(bucket: PSDBucket, Yh, Yl):
    """Double-float svec of a double-float matrix: the plain `_to_svec`
    rounds (up+lo)/√2 to f32 — an eps·|Y| absolute loss that would undo
    the compensated product chain feeding it.  Returns (hi, lo)."""
    from ..kkt import compensated as dfc

    I, J = bucket.I, bucket.J
    uph, loh = Yh[:, I, J], Yh[:, J, I]
    s, e = dfc._two_sum(uph, loh)
    c64 = 1.0 / np.sqrt(2.0)
    fh = jnp.asarray(np.float32(c64), Yh.dtype)
    ph, pe = dfc._two_prod(s, fh)
    low = (Yl[:, I, J] + Yl[:, J, I]) * fh + e * fh + pe
    if _EXACT_SQRT2:
        fl = jnp.asarray(
            np.float32(c64 - np.float64(np.float32(c64))), Yh.dtype
        )
        low = low + s * fl
    hi = jnp.where(bucket.is_diag, uph, ph)
    lo = jnp.where(bucket.is_diag, Yl[:, I, J], low)
    return hi, lo


# -----------------------------------------------------------------
# composite hooks
# -----------------------------------------------------------------


def unit_initialization(layout: ConeLayout, z, s):
    """Identity matrices (psdtrianglecone.rs:131-136)."""
    sl = _psd_slice(layout)
    for b in layout.psd_buckets:
        diag_idx = b.gather[:, _diag_positions(b)] + sl.start
        z = z.at[diag_idx].set(1.0)
        s = s.at[diag_idx].set(1.0)
    return z, s


def set_identity_scaling(layout: ConeLayout, dtype):
    """psdtrianglecone.rs:138-142"""
    state = {}
    for bi, b in enumerate(layout.psd_buckets):
        eye = jnp.tile(jnp.eye(b.n, dtype=dtype), (b.count, 1, 1))
        state[f"psd{bi}_R"] = eye
        state[f"psd{bi}_Rinv"] = eye
        state[f"psd{bi}_lam"] = jnp.ones((b.count, b.n), dtype)
    return state


def update_scaling(layout: ConeLayout, state, s, z):
    """NT scaling via chol(S), chol(Z), SVD of L2ᵀL1.

    reference: psdtrianglecone.rs:144-204
    """
    sl = _psd_slice(layout)
    ok = jnp.asarray(True)
    for bi, b in enumerate(layout.psd_buckets):
        S = _to_mat(b, s[sl][b.gather])
        Z = _to_mat(b, z[sl][b.gather])

        if s.dtype == jnp.float32:
            # f32: near strict complementarity eig_min(S) ~ μ drops below
            # eps32·‖S‖ and Cholesky breaks down on rounding (observed:
            # chol NaN with all f32 eigenvalues positive, eig_min 4e-8 at
            # ‖S‖ ~ 1).  Any factor with S = L Lᵀ serves the NT
            # construction (the SVD below doesn't need triangularity), so
            # use the eigh square root with the spectrum floored at a few
            # ulps of ‖S‖ — equivalent to an O(eps) inward shift of the
            # iterate.  f64 keeps Cholesky (reference semantics,
            # psdtrianglecone.rs:144-204: eps64 never meets this).
            def _sqrt_factor(M):
                w, U = jnp.linalg.eigh(M)
                # spectrum floor at a few ulps of ‖M‖: keeps the factor
                # PD and caps ‖Hs‖ near 1/eps (a mild extra
                # regularization).  Measured on the strictly-
                # complementary SDP batch: c in [1, 16] equivalent
                # (61-62/64 pre-frame-fix), c = 64 over-regularizes,
                # eps²-level floors let ‖Hs‖ blow up the KKT conditioning
                floor = (4.0 * jnp.finfo(jnp.float32).eps) * jnp.max(
                    jnp.abs(w), axis=-1, keepdims=True
                )
                wc = jnp.maximum(w, floor)
                return U * jnp.sqrt(wc)[..., None, :]

            L1 = _sqrt_factor(S)
            L2 = _sqrt_factor(Z)
        else:
            L1 = jnp.linalg.cholesky(S)
            L2 = jnp.linalg.cholesky(Z)
        ok = ok & jnp.all(jnp.isfinite(L1)) & jnp.all(jnp.isfinite(L2))

        # SVD of L2ᵀ L1 gives the NT geometric mean factors
        U, lam, Vt = jnp.linalg.svd(
            jnp.einsum("kji,kjl->kil", L2, L1), full_matrices=False
        )
        lam_isqrt = 1.0 / jnp.sqrt(lam)

        # R = L1 V Λ^{-1/2},  Rinv = Λ^{-1/2} Uᵀ L2ᵀ
        R = jnp.einsum("kij,klj->kil", L1, Vt) * lam_isqrt[:, None, :]
        Rinv = lam_isqrt[:, :, None] * jnp.einsum("kji,klj->kil", U, L2)

        # λ = 0 (exactly singular NT mean) or a non-finite R must read as
        # a scaling failure, not poison the KKT with inf·0 = NaN
        ok = (
            ok
            & jnp.all(lam > 0)
            & jnp.all(jnp.isfinite(R))
            & jnp.all(jnp.isfinite(Rinv))
        )
        state[f"psd{bi}_R"] = R
        state[f"psd{bi}_Rinv"] = Rinv
        state[f"psd{bi}_lam"] = lam
    return state, ok


def _skron(bucket: PSDBucket, A):
    """Batched symmetric Kronecker product: [k, n, n] -> [k, tri, tri]."""
    I, J = bucket.I, bucket.J
    f = np.where(bucket.is_diag, 1.0 / np.sqrt(2.0), 1.0)
    term1 = A[:, I[:, None], I[None, :]] * A[:, J[:, None], J[None, :]]
    term2 = A[:, I[:, None], J[None, :]] * A[:, J[:, None], I[None, :]]
    return (term1 + term2) * (f[:, None] * f[None, :])


def _skron_df(bucket: PSDBucket, Ah, Al):
    """skron of a double-float A: returns (hi, lo) [k, tri, tri] blocks.

    The 1/√2 factors are applied as exact double-float constants: an
    f32-rounded constant is a multiplicative eps32 perturbation of every
    off-diagonal skron entry — at ‖Hs‖ ~ 1/μ that alone is the whole
    f32 error budget (measured 6e-8·‖Hs‖ pair error before this fix)."""
    from ..kkt import compensated as dfc

    I, J = bucket.I, bucket.J
    f64 = np.where(bucket.is_diag, 1.0 / np.sqrt(2.0), 1.0)
    ff64 = f64[:, None] * f64[None, :]
    ffh = jnp.asarray(ff64.astype(np.float32), Ah.dtype)
    ffl = jnp.asarray(
        (ff64 - ff64.astype(np.float32).astype(np.float64)).astype(
            np.float32
        ) if _EXACT_SQRT2 else np.zeros_like(ff64, np.float32),
        Ah.dtype,
    )

    def _pick(M, a, b_):
        return M[:, a[:, None], b_[None, :]]

    def _df_prod(xh, xl, yh, yl):
        ph, pe = dfc._two_prod(xh, yh)
        return ph, pe + xh * yl + xl * yh

    t1h, t1l = _df_prod(
        _pick(Ah, I, I), _pick(Al, I, I), _pick(Ah, J, J), _pick(Al, J, J)
    )
    t2h, t2l = _df_prod(
        _pick(Ah, I, J), _pick(Al, I, J), _pick(Ah, J, I), _pick(Al, J, I)
    )
    sh, se = dfc._two_sum(t1h, t2h)
    slo = t1l + t2l + se
    ph, pe = dfc._two_prod(sh, ffh)
    return ph, pe + slo * ffh + sh * ffl


def hs_dense(layout: ConeLayout, state, H, H_lo=None):
    """Hs = skron(RRᵀ) per cone (psdtrianglecone.rs:190-204).

    With ``H_lo`` given (f32 mixed-precision KKT), the skron blocks are
    evaluated in double-float and the rounding remainder lands in
    ``H_lo`` — the KKT refinement loop then refines against the hi+lo
    pair, so the solved Δz is consistent to ~eps² with the exact NT
    scaling geometry used by the Δs recovery and step-length checks."""
    sl = _psd_slice(layout)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        rows = sl.start + b.gather[:, :, None]
        cols = sl.start + b.gather[:, None, :]
        if H_lo is not None and _use_df(b, H.dtype):
            from ..kkt import compensated as dfc

            Ah, Al = dfc.df_matmul(R, jnp.swapaxes(R, -1, -2))
            bh, bl = _skron_df(b, Ah, Al)
            H = H.at[rows, cols].set(bh)
            H_lo = H_lo.at[rows, cols].set(bl)
            # stash the exact blocks: mul_hs_df applies THESE via a
            # compensated matvec, so the Δs recovery is consistent with
            # the solved K by construction — two independently-rounded
            # evaluations of skron (different 1/√2 constant placements)
            # differ at eps·‖Hs‖, which near μ→0 is the whole error
            # budget.  The dict is iteration-local (rebuilt every
            # update_scaling), so this never leaks across steps.
            state[f"psd{bi}_skron"] = (bh, bl)
        else:
            A = jnp.einsum("kij,klj->kil", R, R)  # R Rᵀ
            H = H.at[rows, cols].set(_skron(b, A))
    return H, H_lo


# double-float A·X·A is O(k n^4) memory for the exact-product tensors;
# past this matrix dimension fall back to plain f32 einsums
_DF_AXA_MAX_N = 32


def _df_axa(R, X, Xl=None):
    """A·mat(x)·A with A = RRᵀ, evaluated in double-float.

    Near convergence ‖Hs‖ ~ 1/μ, so the plain-f32 product's rounding
    error O(eps·‖A‖²·‖X‖) ≈ eps/μ·‖X‖ reaches ~1e-4 relative — it lands
    directly in Δs and from there in the primal residual.  Error-free
    product splitting + compensated reduction (kkt/compensated.py) keep
    the product accurate to ~eps² while staying pure-f32 vector ops.
    ``Xl`` optionally carries X's lo stream.  Returns (Y_hi, Y_lo)."""
    from ..kkt import compensated as dfc

    Rt = jnp.swapaxes(R, -1, -2)
    Ah, Al = dfc.df_matmul(R, Rt)
    Th, Tl = dfc.df_matmul_df(Ah, Al, X, jnp.zeros_like(X) if Xl is None else Xl)
    return dfc.df_matmul_df(Th, Tl, Ah, Al)


def mul_hs(layout: ConeLayout, state, x, y):
    """y = Hs x = svec(A·mat(x)·A) with A = RRᵀ (psdtrianglecone.rs:214-218)."""
    sl = _psd_slice(layout)
    xi = x[sl]
    out = jnp.zeros_like(xi)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        X = _to_mat(b, xi[b.gather])
        if x.dtype == jnp.float32 and b.n <= _DF_AXA_MAX_N:
            Yh, Yl = _df_axa(R, X)
            v = _to_svec(b, Yh) + _to_svec(b, Yl)
        else:
            A = jnp.einsum("kij,klj->kil", R, R)
            Y = jnp.einsum("kij,kjl,kml->kim", A, X, A)
            v = _to_svec(b, Y)
        out = out.at[b.gather].set(v)
    return y.at[sl].set(out)


def affine_ds(layout: ConeLayout, state, ds):
    """λ∘λ = diag(λ²) in svec form (psdtrianglecone.rs:220-225)."""
    sl = _psd_slice(layout)
    di = jnp.zeros(layout.m_psd, ds.dtype)
    for bi, b in enumerate(layout.psd_buckets):
        lam = state[f"psd{bi}_lam"]
        diag_idx = b.gather[:, _diag_positions(b)]
        di = di.at[diag_idx].set(lam**2)
    return ds.at[sl].set(di)


def _mul_w(bucket, R, x, transpose: bool):
    """W-products on svec vectors (psdtrianglecone.rs:363-396):
    N: Y = Rᵀ X R ;  T: Y = R X Rᵀ  (pass Rinv for the inverse forms)."""
    X = _to_mat(bucket, x)
    if transpose:
        Y = jnp.einsum("kij,kjl,kml->kim", R, X, R)
    else:
        Y = jnp.einsum("kji,kjl,klm->kim", R, X, R)
    return _to_svec(bucket, Y)


def _use_df(bucket, dtype):
    return jnp.dtype(dtype) == jnp.float32 and bucket.n <= _DF_AXA_MAX_N


def _mul_w_mat_df(R, X_mat, transpose: bool, Xl=None):
    """Congruence W-product on matrix operands in double-float.

    N: Y = Rᵀ X R ;  T: Y = R X Rᵀ.  ``Xl`` optionally carries a lo part
    of a double-float X.  Returns (Y_hi, Y_lo): the rounding error of the
    fused product chain is ~eps²·norms instead of eps·‖R‖²·‖X‖ — the
    latter is the f32 noise floor that stalls PSD lanes near μ → 0."""
    from ..kkt import compensated as dfc

    Rt = jnp.swapaxes(R, -1, -2)
    L, Rr = (R, Rt) if transpose else (Rt, R)
    if Xl is None:
        Th, Tl = dfc.df_matmul(L, X_mat)
    else:
        Th, Tl = dfc.df_matmul_df(L, jnp.zeros_like(L), X_mat, Xl)
    return dfc.df_matmul_df(Th, Tl, Rr, jnp.zeros_like(Rr))


def combined_ds_shift(layout: ConeLayout, state, shift, step_z, step_s, sigma_mu):
    """W⁻¹Δs ∘ WΔz − σμe (symmetric_common.rs:53-84)."""
    sl = _psd_slice(layout)
    out = jnp.zeros(layout.m_psd, shift.dtype)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        Rinv = state[f"psd{bi}_Rinv"]
        Zm = _to_mat(b, step_z[sl][b.gather])
        Sm = _to_mat(b, step_s[sl][b.gather])
        if _use_df(b, shift.dtype):
            from ..kkt import compensated as dfc

            Zh, Zl = _mul_w_mat_df(R, Zm, transpose=False)
            Yh, Yl = _mul_w_mat_df(Rinv, Sm, transpose=True)
            c1h, c1l = dfc.df_matmul_df(Yh, Yl, Zh, Zl)
            c2h, c2l = dfc.df_matmul_df(Zh, Zl, Yh, Yl)
            circ = 0.5 * ((c1h + c2h) + (c1l + c2l))
        else:
            wz = _to_svec(b, jnp.einsum("kji,kjl,klm->kim", R, Zm, R))
            wis = _to_svec(b, jnp.einsum("kij,kjl,kml->kim", Rinv, Sm, Rinv))
            Y = _to_mat(b, wis)
            Z = _to_mat(b, wz)
            circ = 0.5 * (
                jnp.einsum("kij,kjl->kil", Y, Z)
                + jnp.einsum("kij,kjl->kil", Z, Y)
            )
        v = _to_svec(b, circ)
        v = v.at[:, _diag_positions(b)].add(-sigma_mu)
        out = out.at[b.gather].set(v)
    return shift.at[sl].set(out)


def ds_from_dz_offset(layout: ConeLayout, state, out_full, ds):
    """Wᵀ(λ \\ ds) (symmetric_common.rs:89-96, psdtrianglecone.rs:317-332)."""
    sl = _psd_slice(layout)
    out = jnp.zeros(layout.m_psd, ds.dtype)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        lam = state[f"psd{bi}_lam"]
        Z = _to_mat(b, ds[sl][b.gather])
        lam_sum = lam[:, :, None] + lam[:, None, :]
        X = 2.0 * Z / lam_sum
        if _use_df(b, ds.dtype):
            Yh, Yl = _mul_w_mat_df(R, X, transpose=True)
            v = _to_svec(b, Yh) + _to_svec(b, Yl)
        else:
            v = _mul_w(b, R, _to_svec(b, X), transpose=True)
        out = out.at[b.gather].set(v)
    return out_full.at[sl].set(out)


def step_length(layout: ConeLayout, state, dz, ds, z, s, alpha, big):
    """Min eigenvalue of Λ^{-1/2} W(Δ) Λ^{-1/2} (psdtrianglecone.rs:235-279,
    437-463)."""
    sl = _psd_slice(layout)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        Rinv = state[f"psd{bi}_Rinv"]
        lam_isqrt = 1.0 / jnp.sqrt(state[f"psd{bi}_lam"])

        for (dv, Rx, transpose) in ((dz, R, False), (ds, Rinv, True)):
            if _use_df(b, dz.dtype):
                Dm = _to_mat(b, dv[sl][b.gather])
                Mh, Ml = _mul_w_mat_df(Rx, Dm, transpose=transpose)
                scale = lam_isqrt[:, :, None] * lam_isqrt[:, None, :]
                M = Mh * scale + Ml * scale
                # symmetrize: the W-product is symmetric in exact
                # arithmetic; eigvalsh reads only one triangle otherwise
                M = 0.5 * (M + jnp.swapaxes(M, -1, -2))
            else:
                d = _mul_w(b, Rx, dv[sl][b.gather], transpose=transpose)
                M = _to_mat(b, d)
                M = lam_isqrt[:, :, None] * M * lam_isqrt[:, None, :]
            gamma = jnp.min(jnp.linalg.eigvalsh(M), axis=-1)
            lim = jnp.where(gamma < 0, -1.0 / jnp.where(gamma < 0, gamma, -1.0), big)
            alpha = jnp.minimum(alpha, jnp.min(lim, initial=big))
    return alpha


def compute_barrier(layout: ConeLayout, z, s, dz, ds, alpha):
    """-logdet barrier at the shifted point (psdtrianglecone.rs:281-306)."""
    sl = _psd_slice(layout)
    barrier = jnp.asarray(0.0, z.dtype)
    for b in layout.psd_buckets:
        for (v, dv) in ((z, dz), (s, ds)):
            Q = _to_mat(b, (v[sl] + alpha * dv[sl])[b.gather])
            L = jnp.linalg.cholesky(Q)
            diag = jnp.diagonal(L, axis1=-2, axis2=-1)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, 1e-300)), axis=-1)
            good = jnp.all(jnp.isfinite(L), axis=(-2, -1)) & jnp.all(diag > 0, axis=-1)
            barrier = barrier + jnp.sum(jnp.where(good, -logdet, jnp.inf))
    return barrier


def margins(layout: ConeLayout, z, mn, total):
    """Min eigenvalue / sum of positive eigenvalues
    (psdtrianglecone.rs:104-121)."""
    sl = _psd_slice(layout)
    for b in layout.psd_buckets:
        Z = _to_mat(b, z[sl][b.gather])
        e = jnp.linalg.eigvalsh(Z)
        mn = jnp.minimum(mn, jnp.min(e))
        total = total + jnp.sum(jnp.maximum(e, 0.0))
    return mn, total


def scaled_unit_shift(layout: ConeLayout, z, alpha):
    """z += α·svec(I) (psdtrianglecone.rs:123-129)."""
    sl = _psd_slice(layout)
    for b in layout.psd_buckets:
        diag_idx = b.gather[:, _diag_positions(b)] + sl.start
        z = z.at[diag_idx].add(alpha)
    return z
