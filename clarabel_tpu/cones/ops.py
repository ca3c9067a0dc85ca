"""Functional composite-cone operations (zero / nonnegative / second-order).

This is the TPU-native replacement for the reference's per-cone virtual
dispatch (reference: src/solver/core/cones/compositecone.rs + the per-cone
``Cone`` impls).  Every operation is a pure function over the full permuted
slack vector: contiguous group slices handle the per-kind math and
heterogeneous second-order cones are vectorized with segment reductions, so
one fused XLA computation covers every cone of a kind regardless of its
dimension.  No data-dependent Python control flow appears anywhere; all
branching is ``jnp.where`` so the ops are jit/vmap/shard_map-safe.

The nonsymmetric 3-D cones (exp/pow) and PSD cones plug into the same
interface from their own modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import api
from .layout import ConeLayout

# primal/dual cone selector for margins / unit shifts
PRIMAL = 0
DUAL = 1


def _logsafe(x):
    """log with -inf for nonpositive arguments.

    reference: src/algebra/scalarmath.rs (logsafe)
    """
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), -jnp.inf)


# =================================================================
# segment helpers over the SOC group
# =================================================================


def _seg(layout: ConeLayout):
    return layout.soc_seg


def _soc_sum(layout, x):
    return jax.ops.segment_sum(
        x, layout.soc_seg, num_segments=layout.num_soc,
        indices_are_sorted=True,
    )


def _heads(layout, x):
    return x[layout.soc_head_idx]


def _tail(layout, x):
    """Zero out the leading (t) component of each cone."""
    return jnp.where(layout.soc_head_mask, 0.0, x)


def _soc_residual(layout, x):
    """Per-cone residual (x0 - ||x1||)(x0 + ||x1||).

    reference: src/solver/core/cones/socone.rs:388-394
    """
    x0 = _heads(layout, x)
    n1 = jnp.sqrt(_soc_sum(layout, _tail(layout, x) ** 2))
    return (x0 - n1) * (x0 + n1)


def _soc_circ(layout, y, z):
    """Jordan product y ∘ z for the SOC algebra.

    reference: src/solver/core/cones/socone.rs:360-367
    """
    y0 = _heads(layout, y)
    z0 = _heads(layout, z)
    head = _soc_sum(layout, y * z)
    seg = _seg(layout)
    out = y0[seg] * _tail(layout, z) + z0[seg] * _tail(layout, y)
    return out.at[layout.soc_head_idx].set(head)


def _soc_mul_w(layout, w, eta, x, inverse: bool):
    """Products with the NT scaling point W (ECOS-style fast form).

    reference: src/solver/core/cones/socone.rs:503-530
    """
    seg = _seg(layout)
    w0 = _heads(layout, w)
    x0 = _heads(layout, x)
    zeta = _soc_sum(layout, _tail(layout, w) * _tail(layout, x))
    if not inverse:
        c = x0 + zeta / (1.0 + w0)
        head = eta * (w0 * x0 + zeta)
        tail = (eta[seg]) * (_tail(layout, x) + c[seg] * _tail(layout, w))
    else:
        c = -x0 + zeta / (1.0 + w0)
        head = (w0 * x0 - zeta) / eta
        tail = (_tail(layout, x) + c[seg] * _tail(layout, w)) / eta[seg]
    return tail.at[layout.soc_head_idx].set(head)


# =================================================================
# composite cone interface
# =================================================================


def unit_initialization(layout: ConeLayout, dtype):
    """(z, s) unit initial point per cone.

    reference: per-cone ``unit_initialization`` (zerocone.rs:72-75,
    nonnegativecone.rs:68-71, socone.rs:114-119)
    """
    z = jnp.zeros(layout.m, dtype)
    s = jnp.zeros(layout.m, dtype)
    nn = layout.slice_of(api.NONNEGATIVE)
    z = z.at[nn].set(1.0)
    s = s.at[nn].set(1.0)
    if layout.num_soc:
        soc = layout.slice_of(api.SOC)
        heads = layout.soc_head_idx + soc.start
        z = z.at[heads].set(1.0)
        s = s.at[heads].set(1.0)
    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        z, s = _ns.unit_initialization(layout, z, s)
    if layout.num_psd:
        from . import psd as _psd

        z, s = _psd.unit_initialization(layout, z, s)
    return z, s


def set_identity_scaling(layout: ConeLayout, dtype):
    """Identity NT scalings for the symmetric initial KKT solve.

    reference: per-cone ``set_identity_scaling`` (nonnegativecone.rs:73-75,
    socone.rs:121-132)
    """
    state = {}
    if layout.n_nn:
        state["nn_w"] = jnp.ones(layout.n_nn, dtype)
        state["nn_lam"] = jnp.zeros(layout.n_nn, dtype)
    if layout.num_soc:
        w = jnp.zeros(layout.m_soc, dtype).at[layout.soc_head_idx].set(1.0)
        state["soc_w"] = w
        state["soc_eta"] = jnp.ones(layout.num_soc, dtype)
        state["soc_lam"] = jnp.zeros(layout.m_soc, dtype)
    if layout.num_psd:
        from . import psd as _psd

        state.update(_psd.set_identity_scaling(layout, dtype))
    # nonsymmetric cones never take the symmetric initialization path
    return state


def update_scaling(layout: ConeLayout, state, s, z, mu, strategy):
    """Update all scaling-point data from the current (s, z).

    Returns (new_state, ok).  reference: compositecone.rs:226-243 and the
    per-cone ``update_scaling`` impls.
    """
    state = dict(state)
    ok = jnp.asarray(True)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        si, zi = s[sl], z[sl]
        # reference: nonnegativecone.rs:77-90
        state["nn_lam"] = jnp.sqrt(si * zi)
        state["nn_w"] = jnp.sqrt(si / zi)

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        si, zi = s[sl], z[sl]
        seg = _seg(layout)
        hidx = layout.soc_head_idx
        # reference: socone.rs:134-211
        zres = _soc_residual(layout, zi)
        sres = _soc_residual(layout, si)
        ok = ok & jnp.all(zres > 0) & jnp.all(sres > 0)
        zscale = jnp.sqrt(jnp.maximum(zres, 1e-300))
        sscale = jnp.sqrt(jnp.maximum(sres, 1e-300))

        eta = jnp.sqrt(sscale / zscale)

        sgn = jnp.where(layout.soc_head_mask, 1.0, -1.0)
        w = si / sscale[seg] + sgn * zi / zscale[seg]
        wres = _soc_residual(layout, w)
        ok = ok & jnp.all(wres > 0)
        wscale = jnp.sqrt(jnp.maximum(wres, 1e-300))
        w = w / wscale[seg]

        # force w to come out normalized (socone.rs:170-172)
        w1sq = _soc_sum(layout, _tail(layout, w) ** 2)
        w = w.at[hidx].set(jnp.sqrt(1.0 + w1sq))

        # scaled point λ satisfying λ = Wz = W^{-T}s (socone.rs:174-184)
        gamma = 0.5 * wscale
        z0, s0 = _heads(layout, zi), _heads(layout, si)
        cs = (gamma + z0 / zscale) / sscale
        cz = (gamma + s0 / sscale) / zscale
        den = s0 / sscale + z0 / zscale + 2.0 * gamma
        lam = (cs[seg] * _tail(layout, si) + cz[seg] * _tail(layout, zi)) / den[seg]
        lam = lam.at[hidx].set(gamma)
        lam = lam * jnp.sqrt(sscale * zscale)[seg]

        state["soc_w"] = w
        state["soc_eta"] = eta
        state["soc_lam"] = lam

    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        state, ok_ns = _ns.update_scaling(layout, state, s, z, mu, strategy)
        ok = ok & ok_ns

    if layout.num_psd:
        from . import psd as _psd

        state, ok_psd = _psd.update_scaling(layout, state, s, z)
        ok = ok & ok_psd

    return state, ok


def hs_dense(layout: ConeLayout, state, dtype, want_lo=False):
    """Dense [m, m] block-diagonal scaling matrix Hs for KKT assembly.

    Hs = WᵀW for symmetric cones, μH(z) (or the primal-dual variant) for
    nonsymmetric cones.  reference: per-cone ``get_Hs``.

    With ``want_lo`` (f32 PSD layouts), returns (H, H_lo) with the PSD
    blocks' double-float rounding remainder in H_lo; otherwise returns
    (H, None).
    """
    H = jnp.zeros((layout.m, layout.m), dtype)
    H_lo = (
        jnp.zeros((layout.m, layout.m), dtype)
        if (want_lo and layout.num_psd and jnp.dtype(dtype) == jnp.float32)
        else None
    )

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        idx = jnp.arange(sl.start, sl.stop)
        # reference: nonnegativecone.rs:96-101 (diag Hs = w²)
        H = H.at[idx, idx].set(state["nn_w"] ** 2)

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        seg = _seg(layout)
        w, eta = state["soc_w"], state["soc_eta"]
        # dense form Hs = η²(2wwᵀ - J), J = diag(1, -I)
        # (reference: socone.rs:227-245)
        u = eta[seg] * w
        same = seg[:, None] == seg[None, :]
        blk = 2.0 * jnp.where(same, u[:, None] * u[None, :], 0.0)
        diag = jnp.where(
            layout.soc_head_mask, -(eta[seg] ** 2), eta[seg] ** 2
        )
        blk = blk + jnp.diag(diag)
        H = H.at[sl, sl].set(blk)

    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        H = _ns.hs_dense(layout, state, H)

    if layout.num_psd:
        from . import psd as _psd

        H, H_lo = _psd.hs_dense(layout, state, H, H_lo)

    return H, H_lo


def mul_hs(layout: ConeLayout, state, x):
    """y = Hs x without materializing Hs.  reference: per-cone ``mul_Hs``."""
    y = jnp.zeros_like(x)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        y = y.at[sl].set(state["nn_w"] ** 2 * x[sl])

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        xi = x[sl]
        seg = _seg(layout)
        w, eta = state["soc_w"], state["soc_eta"]
        # reference: socone.rs:248-256
        c = 2.0 * _soc_sum(layout, w * xi)
        out = jnp.where(layout.soc_head_mask, -xi, xi) + c[seg] * w
        y = y.at[sl].set(eta[seg] ** 2 * out)

    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        y = _ns.mul_hs(layout, state, x, y)

    if layout.num_psd:
        from . import psd as _psd

        y = _psd.mul_hs(layout, state, x, y)

    return y


def mul_hs_df(layout: ConeLayout, state, x, x_lo=None):
    """y = Hs (x + x_lo) as a double-float (hi, lo) pair.

    Near convergence the elementwise magnitude |Hs·x|_i dwarfs the Δs it
    feeds (Δs = -(HsΔz + c) is a cancellation), so the f32 rounding of
    the product — eps·|Hs·x|_i absolute — dominates the step's primal
    consistency.  Keeping the product's rounding remainder in a lo
    stream until after the cancellation removes it.  PSD buckets reuse
    the double-float congruence path; NN uses an exact TwoProd; other
    cones fall back to the plain product (their hi image) with only the
    x_lo image compensated.
    """
    from ..kkt import compensated as dfc
    from . import psd as _psd

    hi = jnp.zeros_like(x)
    lo = jnp.zeros_like(x)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        w2 = state["nn_w"] ** 2
        ph, pe = dfc._two_prod(w2, x[sl])
        if x_lo is not None:
            pe = pe + w2 * x_lo[sl]
        hi = hi.at[sl].set(ph)
        lo = lo.at[sl].set(pe)

    rest = jnp.zeros_like(x)
    if layout.n_nn:
        # zero out the NN slice so the generic paths below don't re-add it
        mask = jnp.zeros(layout.m, bool).at[layout.slice_of(api.NONNEGATIVE)].set(True)
        xr = jnp.where(mask, 0.0, x)
        xr_lo = None if x_lo is None else jnp.where(mask, 0.0, x_lo)
    else:
        xr, xr_lo = x, x_lo

    if layout.num_soc or layout.num_exp or layout.num_pow or layout.num_genpow:
        img = mul_hs(layout, state, xr)
        if layout.num_psd:
            sl = layout.slice_of(api.PSD)
            img = img.at[sl].set(0.0)
        hi = hi + img
        if xr_lo is not None:
            img_lo = mul_hs(layout, state, xr_lo)
            if layout.num_psd:
                img_lo = img_lo.at[layout.slice_of(api.PSD)].set(0.0)
            lo = lo + img_lo

    if layout.num_psd:
        sl = layout.slice_of(api.PSD)
        out_h = jnp.zeros(layout.m_psd, x.dtype)
        out_l = jnp.zeros(layout.m_psd, x.dtype)
        for bi, b in enumerate(layout.psd_buckets):
            R = state[f"psd{bi}_R"]
            if f"psd{bi}_skron" in state:
                # apply the SAME skron blocks stored in the solved K
                # (psd.hs_dense stash) with a compensated matvec —
                # consistency with the KKT system by construction
                Sh, Sl = state[f"psd{bi}_skron"]
                xv = x[sl][b.gather]
                p, e = dfc._two_prod(Sh, xv[:, None, :])
                e = e + Sl * xv[:, None, :]
                if x_lo is not None:
                    xlv = x_lo[sl][b.gather]
                    e = e + Sh * xlv[:, None, :]
                vh, vl = dfc._df_reduce_last(p, e)
                out_h = out_h.at[b.gather].set(vh)
                out_l = out_l.at[b.gather].set(vl)
            elif _psd._use_df(b, x.dtype):
                X, Xl = _psd._to_mat_df(
                    b, x[sl][b.gather],
                    None if x_lo is None else x_lo[sl][b.gather],
                )
                Yh, Yl = _psd._df_axa(R, X, Xl)
                vh, vl = _psd._to_svec_df(b, Yh, Yl)
                out_h = out_h.at[b.gather].set(vh)
                out_l = out_l.at[b.gather].set(vl)
            else:
                X = _psd._to_mat(b, x[sl][b.gather])
                A = jnp.einsum("kij,klj->kil", R, R)
                Y = jnp.einsum("kij,kjl,kml->kim", A, X, A)
                out_h = out_h.at[b.gather].set(_psd._to_svec(b, Y))
                if x_lo is not None:
                    Xl = _psd._to_mat(b, x_lo[sl][b.gather])
                    Yl = jnp.einsum("kij,kjl,kml->kim", A, Xl, A)
                    out_l = out_l.at[b.gather].set(_psd._to_svec(b, Yl))
        hi = hi.at[sl].add(out_h)
        lo = lo.at[sl].add(out_l)

    return hi, lo


def affine_ds(layout: ConeLayout, state, s):
    """RHS ds for the affine step: λ∘λ for symmetric cones, s for
    nonsymmetric ones.  reference: per-cone ``affine_ds``."""
    ds = jnp.zeros_like(s)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        ds = ds.at[sl].set(state["nn_lam"] ** 2)

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        lam = state["soc_lam"]
        ds = ds.at[sl].set(_soc_circ(layout, lam, lam))

    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        ds = _ns.affine_ds(layout, ds, s)

    if layout.num_psd:
        from . import psd as _psd

        ds = _psd.affine_ds(layout, state, ds)

    return ds


def combined_ds_shift(layout: ConeLayout, state, step_z, step_s, sigma_mu, z):
    """Mehrotra shift term for the combined step RHS.

    Symmetric cones: W⁻¹Δs ∘ WΔz − σμe  (reference:
    symmetric_common.rs:53-84).  Nonsymmetric cones: σμ·g(z) plus the
    third-order correction (reference: expcone.rs:131-151).
    """
    shift = jnp.zeros_like(step_z)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        w = state["nn_w"]
        wz = w * step_z[sl]
        wis = step_s[sl] / w
        shift = shift.at[sl].set(wis * wz - sigma_mu)

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        w, eta = state["soc_w"], state["soc_eta"]
        wz = _soc_mul_w(layout, w, eta, step_z[sl], inverse=False)
        wis = _soc_mul_w(layout, w, eta, step_s[sl], inverse=True)
        out = _soc_circ(layout, wis, wz)
        out = out.at[layout.soc_head_idx].add(-sigma_mu)
        shift = shift.at[sl].set(out)

    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        shift = _ns.combined_ds_shift(layout, state, shift, step_z, step_s, sigma_mu, z)

    if layout.num_psd:
        from . import psd as _psd

        shift = _psd.combined_ds_shift(layout, state, shift, step_z, step_s, sigma_mu)

    return shift


def ds_from_dz_offset(layout: ConeLayout, state, ds, z):
    """Constant part of Δs as a function of Δz: Wᵀ(λ \\ ds) for symmetric
    cones, zero otherwise.  reference: per-cone ``Δs_from_Δz_offset``."""
    out = jnp.zeros_like(ds)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        # reference: nonnegativecone.rs:122-126 (out = ds / z)
        out = out.at[sl].set(ds[sl] / z[sl])

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        dsi, zi = ds[sl], z[sl]
        seg = _seg(layout)
        hidx = layout.soc_head_idx
        w, eta, lam = state["soc_w"], state["soc_eta"], state["soc_lam"]
        # reference: socone.rs:266-287 (stabilized Wᵀ(λ \ ds))
        resz = _soc_residual(layout, zi)
        lam0, ds0 = _heads(layout, lam), _heads(layout, dsi)
        w0 = _heads(layout, w)
        lam1ds1 = _soc_sum(layout, _tail(layout, lam) * _tail(layout, dsi))
        w1ds1 = _soc_sum(layout, _tail(layout, w) * _tail(layout, dsi))

        v = (-zi).at[hidx].set(_heads(layout, zi))
        c = lam0 * ds0 - lam1ds1
        v = v * (c / resz)[seg]
        v = v.at[hidx].add(eta * w1ds1)
        tail_add = eta[seg] * (
            _tail(layout, dsi) + (w1ds1 / (1.0 + w0))[seg] * _tail(layout, w)
        )
        v = v + _tail(layout, tail_add)
        v = v / lam0[seg]
        out = out.at[sl].set(v)

    # nonsymmetric cones pass ds through unchanged (expcone.rs:149-151,
    # powcone.rs:142-144, genpowcone.rs:215-217); zero cones contribute zero
    if layout.num_exp:
        sl = layout.slice_of(api.EXP)
        out = out.at[sl].set(ds[sl])
    if layout.num_pow:
        sl = layout.slice_of(api.POW)
        out = out.at[sl].set(ds[sl])
    if layout.num_genpow:
        sl = layout.slice_of(api.GENPOW)
        out = out.at[sl].set(ds[sl])

    if layout.num_psd:
        from . import psd as _psd

        out = _psd.ds_from_dz_offset(layout, state, out, ds)

    return out


# -----------------------------------------------------------------
# step length
# -----------------------------------------------------------------


def _nn_step_component(x, dx, big):
    """max α with x + α dx >= 0 (reference: nonnegativecone.rs:128-153)."""
    ratios = jnp.where(dx < 0, -x / jnp.where(dx < 0, dx, -1.0), big)
    return jnp.min(ratios, initial=big)


def _soc_step_component(layout, x, dx, big):
    """max α keeping each SOC slice inside its cone: minimum positive root
    of the boundary quadratic, with cancellation-safe root selection.

    reference: socone.rs:421-495
    """
    x0 = _heads(layout, x)
    y0 = _heads(layout, dx)

    # scalar-part bound
    a_lin = jnp.where((x0 >= 0) & (y0 < 0), -x0 / jnp.where(y0 < 0, y0, -1.0), big)

    a = _soc_residual(layout, dx)
    b = 2.0 * (x0 * y0 - _soc_sum(layout, _tail(layout, x) * _tail(layout, dx)))
    c = jnp.maximum(0.0, _soc_residual(layout, x))
    d = b * b - 4.0 * a * c

    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    t = jnp.where(b >= 0, -b - sqrt_d, -b + sqrt_d)
    safe_t = jnp.where(t == 0, 1.0, t)
    safe_a = jnp.where(a == 0, 1.0, a)
    r1 = (2.0 * c) / safe_t
    r2 = t / (2.0 * safe_a)
    r1 = jnp.where((r1 < 0) | (t == 0), big, r1)
    r2 = jnp.where((r2 < 0) | (a == 0), big, r2)
    root = jnp.minimum(r1, r2)

    a_quad = jnp.where(
        ((a > 0) & (b > 0)) | (d < 0),
        big,
        jnp.where(
            a == 0,
            big,
            jnp.where(c == 0, jnp.where(a >= 0, big, 0.0), root),
        ),
    )
    per_cone = jnp.minimum(a_lin, a_quad)
    return jnp.min(per_cone, initial=big)


def step_length(layout: ConeLayout, state, dz, ds, z, s, settings, alpha_max):
    """Composite maximum step length to the cone boundary.

    Symmetric cones first (closed form); nonsymmetric cones then shrink the
    result further, after backing off from 1 by √ε.
    reference: compositecone.rs:300-340
    """
    big = jnp.asarray(jnp.finfo(z.dtype).max, z.dtype)
    alpha = alpha_max

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        alpha = jnp.minimum(alpha, _nn_step_component(z[sl], dz[sl], big))
        alpha = jnp.minimum(alpha, _nn_step_component(s[sl], ds[sl], big))

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        alpha = jnp.minimum(alpha, _soc_step_component(layout, z[sl], dz[sl], big))
        alpha = jnp.minimum(alpha, _soc_step_component(layout, s[sl], ds[sl], big))

    if layout.num_psd:
        from . import psd as _psd

        alpha = _psd.step_length(layout, state, dz, ds, z, s, alpha, big)

    if not layout.is_symmetric:
        from . import nonsymmetric as _ns

        eps = jnp.finfo(z.dtype).eps
        alpha = jnp.minimum(alpha, 1.0 - jnp.sqrt(eps))
        alpha = _ns.step_length(layout, state, dz, ds, z, s, settings, alpha)

    return alpha


def compute_barrier(layout: ConeLayout, state, z, s, dz, ds, alpha):
    """Combined barrier at (z+αdz, s+αds).  reference: per-cone
    ``compute_barrier``; used by the asymmetric backtracking line search."""
    barrier = jnp.asarray(0.0, z.dtype)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        si = s[sl] + alpha * ds[sl]
        zi = z[sl] + alpha * dz[sl]
        barrier = barrier - jnp.sum(_logsafe(si * zi))

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        res_s = _soc_residual(layout, s[sl] + alpha * ds[sl])
        res_z = _soc_residual(layout, z[sl] + alpha * dz[sl])
        good = (res_s > 0) & (res_z > 0)
        term = jnp.where(good, -0.5 * _logsafe(res_s * res_z), jnp.inf)
        barrier = barrier + jnp.sum(term)

    if layout.num_exp or layout.num_pow or layout.num_genpow:
        from . import nonsymmetric as _ns

        barrier = barrier + _ns.compute_barrier(layout, z, s, dz, ds, alpha)

    if layout.num_psd:
        from . import psd as _psd

        barrier = barrier + _psd.compute_barrier(layout, z, s, dz, ds, alpha)

    return barrier


# -----------------------------------------------------------------
# margins and unit shifts (symmetric initialization)
# -----------------------------------------------------------------


def margins(layout: ConeLayout, z, pd):
    """(minimum margin, total positive margin) over all cones.

    reference: compositecone margins + per-cone impls (zerocone.rs:55-62,
    nonnegativecone.rs:58-62, socone.rs:104-108)
    """
    big = jnp.asarray(jnp.finfo(z.dtype).max, z.dtype)
    mn = big
    total = jnp.asarray(0.0, z.dtype)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        zi = z[sl]
        mn = jnp.minimum(mn, jnp.min(zi, initial=big))
        total = total + jnp.sum(jnp.maximum(zi, 0.0))

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        zi = z[sl]
        z0 = _heads(layout, zi)
        n1 = jnp.sqrt(_soc_sum(layout, _tail(layout, zi) ** 2))
        a = z0 - n1
        mn = jnp.minimum(mn, jnp.min(a, initial=big))
        total = total + jnp.sum(jnp.maximum(a, 0.0))

    if layout.num_psd:
        from . import psd as _psd

        mn, total = _psd.margins(layout, z, mn, total)

    # zero cones: (+inf, 0) contribution — no-op on (mn, total)
    return mn, total


def scaled_unit_shift(layout: ConeLayout, z, alpha, pd):
    """z += α·e per cone; zero cones clamp to 0 in the primal case.

    reference: per-cone ``scaled_unit_shift`` (zerocone.rs:64-70,
    nonnegativecone.rs:64-66, socone.rs:110-112)
    """
    if layout.n_zero and pd == PRIMAL:
        z = z.at[layout.slice_of(api.ZERO)].set(0.0)

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        z = z.at[sl].add(alpha)

    if layout.num_soc:
        sl = layout.slice_of(api.SOC)
        heads = layout.soc_head_idx + sl.start
        z = z.at[heads].add(alpha)

    if layout.num_psd:
        from . import psd as _psd

        z = _psd.scaled_unit_shift(layout, z, alpha)

    return z


def rectify_equilibration(layout: ConeLayout, e):
    """Replace per-row scalings by their per-cone mean on cones that only
    admit a scalar scaling (everything except zero/NN cones).

    reference: per-cone ``rectify_equilibration`` (socone.rs:97-101:
    δ = mean(e)/e, so e ⊙ δ = mean(e) on the cone).
    Returns (δ, changed) where changed is a static bool.
    """
    if not layout.rectify_mask.any():
        return jnp.ones_like(e), False
    seg = layout.cone_seg
    sums = jax.ops.segment_sum(e, seg, num_segments=layout.num_cones,
                               indices_are_sorted=False)
    counts = jax.ops.segment_sum(jnp.ones_like(e), seg,
                                 num_segments=layout.num_cones,
                                 indices_are_sorted=False)
    mean = sums / jnp.maximum(counts, 1.0)
    delta = jnp.where(layout.rectify_mask, mean[seg] / e, 1.0)
    return delta, True


# =================================================================
# sparse Hs: lower-triangle block coordinates + values
# =================================================================
#
# The sparse KKT engine needs the block-diagonal Hs as a flat vector of
# lower-triangle entries in a canonical order (the TPU-native analog of the
# reference's per-cone Hsblocks maps; reference: src/solver/core/kktsolvers/
# direct/quasidef/datamaps.rs + per-cone ``get_Hs``).  ``hs_lower_coords``
# runs on the host at setup and fixes the order; ``hs_lower_vals`` is the
# jitted value producer in exactly that order.
#
# Canonical order: [ NN diag | SOC cone-major tril | exp cone-major 3x3
# tril | pow ditto | genpow cone-major tril | PSD bucket/cone-major tril ].
# Zero cones contribute no Hs entries (their K diagonal comes from the
# separate diagonal group of the sparse pattern).


def hs_lower_coords(layout: ConeLayout, soc_expanded=(), genpow_expanded=False):
    """Host-side: global (rows, cols) in [0, m) of every Hs lower-triangle
    entry, row >= col, in the canonical order of :func:`hs_lower_vals`.

    ``soc_expanded`` (bool per SOC cone) and ``genpow_expanded`` select
    the sparse low-rank expansion form for those cones: their Hs block
    degenerates to a diagonal here, with the rank-2/rank-3 terms carried
    by the extension rows of :func:`expansion_coords` (reference:
    socone.rs:217-226 sparse get_Hs, genpowcone.rs:165-176)."""
    rows, cols = [], []

    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        i = np.arange(sl.start, sl.stop, dtype=np.int64)
        rows.append(i)
        cols.append(i)

    if layout.num_soc:
        off = layout.slice_of(api.SOC).start
        if not soc_expanded:
            soc_expanded = (False,) * layout.num_soc
        # dense cones first (cone-major tril), then expanded cones' diags
        pos = 0
        for ci, d in enumerate(layout.soc_dims):
            if not soc_expanded[ci]:
                ti, tj = np.tril_indices(d)
                rows.append(off + pos + ti)
                cols.append(off + pos + tj)
            pos += d
        pos = 0
        for ci, d in enumerate(layout.soc_dims):
            if soc_expanded[ci]:
                i = off + pos + np.arange(d, dtype=np.int64)
                rows.append(i)
                cols.append(i)
            pos += d

    for kind, count in ((api.EXP, layout.num_exp), (api.POW, layout.num_pow)):
        if count:
            off = layout.slice_of(kind).start
            ti, tj = np.tril_indices(3)
            for k in range(count):
                rows.append(off + 3 * k + ti)
                cols.append(off + 3 * k + tj)

    if layout.num_genpow:
        off = layout.slice_of(api.GENPOW).start
        if genpow_expanded:
            i = off + np.arange(layout.m_genpow, dtype=np.int64)
            rows.append(i)
            cols.append(i)
        else:
            pos = 0
            for c in layout.genpow_cones:
                w = c.nvars
                ti, tj = np.tril_indices(w)
                rows.append(off + pos + ti)
                cols.append(off + pos + tj)
                pos += w

    if layout.num_psd:
        off = layout.slice_of(api.PSD).start
        for b in layout.psd_buckets:
            ti, tj = np.tril_indices(b.tri)
            for ki in range(b.count):
                rows.append(off + b.gather[ki, ti])
                cols.append(off + b.gather[ki, tj])

    if not rows:
        z = np.zeros(0, np.int64)
        return z, z
    return (
        np.concatenate(rows).astype(np.int64),
        np.concatenate(cols).astype(np.int64),
    )


def hs_lower_vals(layout: ConeLayout, state, dtype, soc_expanded=(),
                  genpow_expanded=False):
    """Device-side: Hs lower-triangle entry values in the canonical order
    of :func:`hs_lower_coords`.  All gather indices are static NumPy."""
    parts = []

    if layout.n_nn:
        parts.append(state["nn_w"] ** 2)

    if layout.num_soc:
        if not soc_expanded:
            soc_expanded = (False,) * layout.num_soc
        exp_mask = np.asarray(soc_expanded, bool)
        w, eta = state["soc_w"], state["soc_eta"]
        # dense form Hs = eta^2 (2wwT - J) per cone (socone.rs:227-245);
        # entry (i, j): 2 u_i u_j + [i == j] * (head ? -eta^2 : +eta^2)
        gi_l, gj_l = [], []
        pos = 0
        for ci, d in enumerate(layout.soc_dims):
            if not soc_expanded[ci]:
                ti, tj = np.tril_indices(d)
                gi_l.append(pos + ti)
                gj_l.append(pos + tj)
            pos += d
        if gi_l:
            gi = np.concatenate(gi_l)
            gj = np.concatenate(gj_l)
            seg = layout.soc_seg[gi]
            u = eta[layout.soc_seg] * w
            eta2 = (eta**2)[seg]
            diag_term = jnp.where(
                jnp.asarray(layout.soc_head_mask[gi]), -eta2, eta2
            )
            vals = 2.0 * u[gi] * u[gj] + jnp.asarray(gi == gj) * diag_term
            parts.append(vals)
        if exp_mask.any():
            # sparse form: diagonal eta^2 * [d, 1, ..., 1] per cone with
            # d = 1/(2 w'w) (socone.rs:190-199, 217-226)
            sel = exp_mask[layout.soc_seg]  # static row mask
            w1sq = _soc_sum(layout, _tail(layout, w) ** 2)
            w0 = _heads(layout, w)
            dd = 0.5 / (w0**2 + w1sq)
            seg = layout.soc_seg
            dvals = jnp.where(
                jnp.asarray(layout.soc_head_mask), dd[seg], 1.0
            ) * (state["soc_eta"] ** 2)[seg]
            parts.append(dvals[np.where(sel)[0]])

    for key, count in (("exp_hs", layout.num_exp), ("pow_hs", layout.num_pow)):
        if count:
            ti, tj = np.tril_indices(3)
            parts.append(state[key][:, ti, tj].reshape(-1))

    if layout.num_genpow:
        # Hs = mu (D + pp' - qq' - rr') (genpowcone.rs:360-401)
        seg = layout.genpow_seg
        diagvec = jnp.where(
            jnp.asarray(layout.genpow_is_q), state["gp_d2"][seg], state["gp_d1"]
        )
        if genpow_expanded:
            # sparse form keeps only mu*D here (genpowcone.rs:169-176);
            # the rank-3 terms ride the extension rows
            parts.append(state["gp_mu"] * diagvec)
        else:
            gi_l, gj_l = [], []
            pos = 0
            for c in layout.genpow_cones:
                ti, tj = np.tril_indices(c.nvars)
                gi_l.append(pos + ti)
                gj_l.append(pos + tj)
                pos += c.nvars
            gi = np.concatenate(gi_l)
            gj = np.concatenate(gj_l)
            p, qv, rv = state["gp_p"], state["gp_q"], state["gp_r"]
            vals = (
                p[gi] * p[gj]
                - qv[gi] * qv[gj]
                - rv[gi] * rv[gj]
                + jnp.asarray(gi == gj) * diagvec[gi]
            )
            parts.append(state["gp_mu"] * vals)

    if layout.num_psd:
        from . import psd as _psd

        for bi, b in enumerate(layout.psd_buckets):
            R = state[f"psd{bi}_R"]
            A = jnp.einsum("kij,klj->kil", R, R)  # R R^T
            blocks = _psd._skron(b, A)  # [k, tri, tri]
            ti, tj = np.tril_indices(b.tri)
            parts.append(blocks[:, ti, tj].reshape(-1))

    if not parts:
        return jnp.zeros(0, dtype)
    return jnp.concatenate([jnp.asarray(p, dtype) for p in parts])


def expansion_coords(layout: ConeLayout, soc_expanded=(), genpow_expanded=False):
    """Host-side: lower-triangle coordinates of the sparse-cone expansion
    terms, in the [0, m + pdim) row space (the caller offsets by n for K
    coordinates).  Returns (rows, cols, ext_dsigns).

    Canonical order (must match :func:`expansion_vals`):
      [ SOC v entries | SOC u entries | SOC ext diags (-+ per cone) |
        genpow q | genpow r | genpow p | genpow ext diags (--+ per cone) ]

    reference: datamaps.rs:112-221 (SOC: v column first, u column second,
    D = eta^2*(-1, 1)); :226-343 (genpow: q/r/p columns scaled -sqrt(mu),
    D = (-1, -1, 1)).
    """
    rows, cols, signs = [], [], []
    ext = layout.m  # next extension row index

    soc_ext_pairs = []  # (ext_v, ext_u) per expanded cone
    if layout.num_soc and soc_expanded and any(soc_expanded):
        off = layout.slice_of(api.SOC).start
        pos = 0
        for ci, d in enumerate(layout.soc_dims):
            if soc_expanded[ci]:
                soc_ext_pairs.append((ext, ext + 1, off + pos, d))
                ext += 2
            pos += d
        for ev, eu, r0, d in soc_ext_pairs:  # v entries
            rows.append(np.full(d, ev, np.int64))
            cols.append(r0 + np.arange(d, dtype=np.int64))
        for ev, eu, r0, d in soc_ext_pairs:  # u entries
            rows.append(np.full(d, eu, np.int64))
            cols.append(r0 + np.arange(d, dtype=np.int64))
        for ev, eu, r0, d in soc_ext_pairs:  # ext diagonal
            rows.append(np.asarray([ev, eu], np.int64))
            cols.append(np.asarray([ev, eu], np.int64))
        signs += [-1.0, 1.0] * len(soc_ext_pairs)

    if genpow_expanded and layout.num_genpow:
        off = layout.slice_of(api.GENPOW).start
        gp_ext = []  # (ext_q, ext_r, ext_p, row0, dim1, dim2)
        pos = 0
        for c in layout.genpow_cones:
            d1, d2 = len(c.alpha), c.dim2
            gp_ext.append((ext, ext + 1, ext + 2, off + pos, d1, d2))
            ext += 3
            pos += c.nvars
        for eq, er, ep, r0, d1, d2 in gp_ext:  # q over the alpha part
            rows.append(np.full(d1, eq, np.int64))
            cols.append(r0 + np.arange(d1, dtype=np.int64))
        for eq, er, ep, r0, d1, d2 in gp_ext:  # r over the q part
            rows.append(np.full(d2, er, np.int64))
            cols.append(r0 + d1 + np.arange(d2, dtype=np.int64))
        for eq, er, ep, r0, d1, d2 in gp_ext:  # p over the whole cone
            rows.append(np.full(d1 + d2, ep, np.int64))
            cols.append(r0 + np.arange(d1 + d2, dtype=np.int64))
        for eq, er, ep, r0, d1, d2 in gp_ext:
            rows.append(np.asarray([eq, er, ep], np.int64))
            cols.append(np.asarray([eq, er, ep], np.int64))
        signs += [-1.0, -1.0, 1.0] * len(gp_ext)

    if not rows:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    return (
        np.concatenate(rows),
        np.concatenate(cols),
        np.asarray(signs, np.float64),
    )


def expansion_vals(layout: ConeLayout, state, dtype, soc_expanded=(),
                   genpow_expanded=False):
    """Device-side: expansion entry values in the order of
    :func:`expansion_coords`.

    SOC rank-2 factors (socone.rs:186-207): with normalized w and
    wsq = w'w,  d = 1/(2 wsq),  u = [sqrt(wsq - d); (2 w0 / u0) w_1:],
    v = [0; v1 w_1:],  v1 = sqrt(2 (2 + 1/wsq) / (2 wsq - 1/wsq)); the
    K entries are -eta^2 u / -eta^2 v with ext diag eta^2 (-1, 1).
    GenPow (datamaps.rs:330-343): columns -sqrt(mu) q/r/p, diag (-1,-1,1).
    """
    parts = []

    if layout.num_soc and soc_expanded and any(soc_expanded):
        exp_mask = np.asarray(soc_expanded, bool)
        sel = np.where(exp_mask[layout.soc_seg])[0]  # static row indices
        cids = np.where(exp_mask)[0]  # static expanded cone ids
        w, eta = state["soc_w"], state["soc_eta"]
        seg = layout.soc_seg
        head = jnp.asarray(layout.soc_head_mask)
        w1sq = _soc_sum(layout, _tail(layout, w) ** 2)
        w0 = _heads(layout, w)
        wsq = w0**2 + w1sq
        dd = 0.5 / wsq
        u0 = jnp.sqrt(wsq - dd)
        u1 = 2.0 * w0 / u0
        v1 = jnp.sqrt(2.0 * (2.0 + 1.0 / wsq) / (2.0 * wsq - 1.0 / wsq))
        u_row = jnp.where(head, u0[seg], u1[seg] * w)
        v_row = jnp.where(head, 0.0, v1[seg] * w)
        eta2r = (eta**2)[seg]
        parts.append((-eta2r * v_row)[sel])
        parts.append((-eta2r * u_row)[sel])
        eta2c = (eta**2)[cids]
        parts.append(jnp.stack([-eta2c, eta2c], axis=1).reshape(-1))

    if genpow_expanded and layout.num_genpow:
        isq = np.asarray(layout.genpow_is_q, bool)
        sqmu = jnp.sqrt(state["gp_mu"])
        parts.append((-sqmu * state["gp_q"])[np.where(~isq)[0]])
        parts.append((-sqmu * state["gp_r"])[np.where(isq)[0]])
        parts.append(-sqmu * state["gp_p"])
        ones = jnp.ones(layout.num_genpow, dtype)
        parts.append(jnp.stack([-ones, -ones, ones], axis=1).reshape(-1))

    if not parts:
        return jnp.zeros(0, dtype)
    return jnp.concatenate([jnp.asarray(p, dtype) for p in parts])


def hs_diag(layout: ConeLayout, state, dtype):
    """diag(Hs) for diagonal-Hs layouts (zero/NN cones only) — the
    structured Schur path needs no other Hs data.  reference:
    nonnegativecone.rs:96-101 (diag Hs = w^2), zerocone.rs (Hs = 0)."""
    h = jnp.zeros(layout.m, dtype)
    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        h = h.at[sl].set(state["nn_w"] ** 2)
    return h


def hs_diag_lowrank(layout: ConeLayout, state, dtype):
    """Diagonal + per-SOC rank-1 representation of Hs for the Woodbury
    Schur path (zero/NN/SOC layouts).

    Returns ``(h, U)`` with ``Hs = diag(h) + U Uᵀ`` *exactly*: each SOC's
    dense NT block WᵀW = η²(2wwᵀ - J) (socone.rs:227-245) is a *signed*
    diagonal η²·(-1, +1, …, +1) plus the rank-1 term (√2ηw)(√2ηw)ᵀ.  Each
    cone's Woodbury capacitance 1 + cᵀD⁻¹c = 1 - 2w₀² + 2w̄ᵀw̄ = -1
    analytically (w is normalized: w₀² - w̄ᵀw̄ = 1), so the correction is
    perfectly conditioned — unlike the PSD-diagonal rank-2 (d,u,v) form of
    the sparse expansion (datamaps.rs:112-221), whose 2x2 capacitance
    determinant cancels catastrophically in f32 as the cone degenerates.
    ``U`` is [m, k] with column √2·η_c·w_c per cone c.
    """
    h = jnp.zeros(layout.m, dtype)
    if layout.n_nn:
        sl = layout.slice_of(api.NONNEGATIVE)
        h = h.at[sl].set(state["nn_w"] ** 2)

    k = layout.num_soc
    U = jnp.zeros((layout.m, k), dtype)
    if k:
        sl = layout.slice_of(api.SOC)
        off = sl.start
        w, eta = state["soc_w"], state["soc_eta"]
        seg = layout.soc_seg
        head = jnp.asarray(layout.soc_head_mask)
        eta2 = (eta**2)[seg]
        dvals = jnp.where(head, -eta2, eta2)
        h = h.at[sl].set(dvals.astype(dtype))
        c = jnp.sqrt(jnp.asarray(2.0, dtype)) * eta[seg] * w
        ridx = np.arange(layout.m_soc, dtype=np.int64) + off
        U = U.at[ridx, layout.soc_seg].set(c.astype(dtype))
    return h, U
