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


def hs_dense(layout: ConeLayout, state, H):
    """Hs = skron(RRᵀ) per cone (psdtrianglecone.rs:190-204)."""
    sl = _psd_slice(layout)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        A = jnp.einsum("kij,klj->kil", R, R)  # R Rᵀ
        blocks = _skron(b, A)
        rows = sl.start + b.gather[:, :, None]
        cols = sl.start + b.gather[:, None, :]
        H = H.at[rows, cols].set(blocks)
    return H


def mul_hs(layout: ConeLayout, state, x, y):
    """y = Hs x = svec(A·mat(x)·A) with A = RRᵀ (psdtrianglecone.rs:214-218)."""
    sl = _psd_slice(layout)
    xi = x[sl]
    out = jnp.zeros_like(xi)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        A = jnp.einsum("kij,klj->kil", R, R)
        X = _to_mat(b, xi[b.gather])
        Y = jnp.einsum("kij,kjl,kml->kim", A, X, A)
        out = out.at[b.gather].set(_to_svec(b, Y))
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


def combined_ds_shift(layout: ConeLayout, state, shift, step_z, step_s, sigma_mu):
    """W⁻¹Δs ∘ WΔz − σμe (symmetric_common.rs:53-84)."""
    sl = _psd_slice(layout)
    out = jnp.zeros(layout.m_psd, shift.dtype)
    for bi, b in enumerate(layout.psd_buckets):
        R = state[f"psd{bi}_R"]
        Rinv = state[f"psd{bi}_Rinv"]
        wz = _mul_w(b, R, step_z[sl][b.gather], transpose=False)
        # W^{-T} on svec: Y = Rinv X Rinvᵀ
        wis = _mul_w(b, Rinv, step_s[sl][b.gather], transpose=True)
        Y = _to_mat(b, wis)
        Z = _to_mat(b, wz)
        circ = 0.5 * (jnp.einsum("kij,kjl->kil", Y, Z) + jnp.einsum("kij,kjl->kil", Z, Y))
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
