"""Nonsymmetric cones: exponential, 3-D power, generalized power.

Vectorized functional counterparts of the reference's per-cone objects
(reference: src/solver/core/cones/expcone.rs, powcone.rs, genpowcone.rs,
nonsymmetric_common.rs).  All exponential cones batch into one [k, 3]
computation, all power cones into another; generalized power cones use the
segment algebra.  Data-dependent iterations (Wright-Omega refinement,
Newton-Raphson for primal gradients, feasibility backtracking) become
fixed-bound ``lax`` loops or fixed-iteration unrolls, so everything vmaps
and shards.

Scaling-state entries produced here:
    exp_hs  [k,3,3]   scaling matrix Hs per exponential cone
    exp_hd  [k,3,3]   dual-barrier Hessian H(z) per cone
    exp_grad [k,3]    dual-barrier gradient per cone
    exp_z   [k,3]     copy of z at the scaling point
    (pow_* identically for power cones)
    gp_*              generalized power data (grad, p, q, r, d1, d2, mu)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import api
from .layout import ConeLayout
from ..statuses import SCALING_DUAL


def _logsafe(x):
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), -jnp.inf)


# =================================================================
# Wright-Omega function (vectorized)
# =================================================================


def wright_omega(z):
    """ω(z) solving y + log(y) = z for z >= 0.

    reference: expcone.rs:396-458 (Algorithm 4, §8.4 of Serrano's thesis),
    vectorized: both initializations are computed and selected by mask,
    followed by the two fixed refinement iterations.
    """
    zm1 = z - 1.0
    # Taylor series initialization for z < 1 + π
    w_small = (
        1.0
        + 0.5 * zm1
        + (1.0 / 16.0) * zm1**2
        - (1.0 / 192.0) * zm1**3
        - (1.0 / 3072.0) * zm1**4
        + (13.0 / 61440.0) * zm1**5
    )
    # log-series initialization for large z
    zsafe = jnp.maximum(z, 1.0)
    logz = jnp.log(zsafe)
    zinv = 1.0 / zsafe
    w_big = zsafe - logz
    q = logz * zinv
    w_big = w_big + q
    q = q * zinv
    w_big = w_big + q * (logz / 2.0 - 1.0)
    q = q * zinv
    w_big = w_big + q * (logz * logz / 3.0 - 1.5 * logz + 1.0)

    w = jnp.where(z < 1.0 + jnp.pi, w_small, w_big)

    r = z - w - jnp.log(w)
    for _ in range(2):
        wp1 = w + 1.0
        t = wp1 * (wp1 + 2.0 * r / 3.0)
        w = w * (1.0 + (r / wp1) * (t - 0.5 * r) / (t - r))
        r = (2.0 * w * w - 8.0 * w - 1.0) / (72.0 * wp1**6) * r**4
    return w


# =================================================================
# 3x3 helpers (operate on [..., 3, 3] / [..., 3] batches)
# =================================================================


def _solve3(H, b):
    """Solve H u = b for symmetric positive definite 3x3 batches.

    The reference uses an explicit 3x3 Cholesky (dense/fixed/dense3x3); a
    closed-form adjugate solve is equivalent and fully parallel.  Returns
    (u, ok) where ok requires positive definiteness (checked via the
    leading minors, mirroring the Cholesky failure mode).
    """
    a, b01, b02 = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    c, c12 = H[..., 1, 1], H[..., 1, 2]
    d = H[..., 2, 2]

    m1 = a
    m2 = a * c - b01 * b01
    det = (
        a * (c * d - c12 * c12)
        - b01 * (b01 * d - c12 * b02)
        + b02 * (b01 * c12 - c * b02)
    )
    ok = (m1 > 0) & (m2 > 0) & (det > 0)

    adj = jnp.stack(
        [
            jnp.stack([c * d - c12 * c12, b02 * c12 - b01 * d, b01 * c12 - b02 * c], -1),
            jnp.stack([c12 * b02 - b01 * d, a * d - b02 * b02, b01 * b02 - a * c12], -1),
            jnp.stack([b01 * c12 - c * b02, b02 * b01 - a * c12, a * c - b01 * b01], -1),
        ],
        -2,
    )
    safe_det = jnp.where(det != 0, det, 1.0)
    u = jnp.einsum("...ij,...j->...i", adj, b) / safe_det[..., None]
    return u, ok


# =================================================================
# exponential cone (batched [k, 3])
# =================================================================
#
# Primal: s3 >= s2*e^(s1/s2), s2, s3 > 0
# Dual:   z3 >= -z1*e^(z2/z1 - 1), z3 > 0, z1 < 0
# reference: expcone.rs:192-353


def exp_unit_init():
    """Hard-coded interior point (expcone.rs:88-94)."""
    return np.array([-1.051383945322714, 0.556409619469370, 1.258967884768947])


def exp_is_primal_feasible(s):
    ok = (s[..., 2] > 0) & (s[..., 1] > 0)
    res = s[..., 1] * _logsafe(s[..., 2] / jnp.where(ok, s[..., 1], 1.0)) - s[..., 0]
    return ok & (res > 0)


def exp_is_dual_feasible(z):
    ok = (z[..., 2] > 0) & (z[..., 0] < 0)
    zsafe0 = jnp.where(ok, z[..., 0], -1.0)
    res = z[..., 1] - z[..., 0] - z[..., 0] * _logsafe(-z[..., 2] / zsafe0)
    return ok & (res > 0)


def exp_barrier_dual(z):
    """f*(z) = -log(-z3 z1) - log(z2 - z1 - z1 log(-z3/z1))  (expcone.rs:245-254)"""
    l = _logsafe(-z[..., 2] / z[..., 0])
    return -_logsafe(-z[..., 2] * z[..., 0]) - _logsafe(
        z[..., 1] - z[..., 0] - z[..., 0] * l
    )


def exp_barrier_primal(s):
    """f(s) via the Wright-Omega closed form (expcone.rs:228-243)."""
    w = wright_omega(1.0 - s[..., 0] / s[..., 1] - _logsafe(s[..., 1] / s[..., 2]))
    w = (w - 1.0) ** 2 / w
    return -_logsafe(w) - 2.0 * _logsafe(s[..., 1]) - _logsafe(s[..., 2]) - 3.0


def exp_grad_dual(z):
    """Gradient of f* at z (expcone.rs:338-343)."""
    l = _logsafe(-z[..., 2] / z[..., 0])
    r = -z[..., 0] * l - z[..., 0] + z[..., 1]
    c2 = 1.0 / r
    g0 = c2 * l - 1.0 / z[..., 0]
    g1 = -c2
    g2 = (c2 * z[..., 0] - 1.0) / z[..., 2]
    return jnp.stack([g0, g1, g2], -1)


def exp_hess_dual(z):
    """Hessian of f* at z (expcone.rs:345-353)."""
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    l = _logsafe(-z2 / z0)
    r = -z0 * l - z0 + z1
    H00 = (r * r - z0 * r + l * l * z0 * z0) / (r * z0 * z0 * r)
    H01 = -l / (r * r)
    H11 = 1.0 / (r * r)
    H02 = (z1 - z0) / (r * r * z2)
    H12 = -z0 / (r * r * z2)
    H22 = (r * r - z0 * r + z0 * z0) / (r * r * z2 * z2)
    return _sym3(H00, H01, H02, H11, H12, H22)


def _sym3(a00, a01, a02, a11, a12, a22):
    row0 = jnp.stack([a00, a01, a02], -1)
    row1 = jnp.stack([a01, a11, a12], -1)
    row2 = jnp.stack([a02, a12, a22], -1)
    return jnp.stack([row0, row1, row2], -2)


def exp_grad_primal(s):
    """Gradient of the primal barrier (expcone.rs:361-372)."""
    w = wright_omega(1.0 - s[..., 0] / s[..., 1] - _logsafe(s[..., 1] / s[..., 2]))
    g0 = 1.0 / ((w - 1.0) * s[..., 1])
    g1 = g0 + g0 * _logsafe(w * s[..., 1] / s[..., 2]) - 1.0 / s[..., 1]
    g2 = w / ((1.0 - w) * s[..., 2])
    return jnp.stack([g0, g1, g2], -1)


def exp_higher_correction(Hd, z, ds, v):
    """Third-order correction η (expcone.rs:256-308)."""
    u, ok = _solve3(Hd, ds)

    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    eta2 = -z0 / z2
    eta = jnp.stack([_logsafe(eta2), jnp.ones_like(z0), eta2], -1)
    psi = z0 * eta[..., 0] - z0 + z1

    dpsi_u = jnp.einsum("...i,...i->...", u, eta)
    dpsi_v = jnp.einsum("...i,...i->...", v, eta)

    u0, u2 = u[..., 0], u[..., 2]
    v0, v2 = v[..., 0], v[..., 2]

    coef = (
        (u0 * (v0 / z0 - v2 / z2) + u2 * (z0 * v2 / z2 - v0) / z2) * psi
        - 2.0 * dpsi_u * dpsi_v
    ) / (psi**3)
    out = coef[..., None] * eta

    inv_psi2 = 1.0 / (psi * psi)
    add0 = (
        (1.0 / psi - 2.0 / z0) * u0 * v0 / (z0 * z0)
        - u2 * v2 / (z2 * z2) / psi
        + dpsi_u * inv_psi2 * (v0 / z0 - v2 / z2)
        + dpsi_v * inv_psi2 * (u0 / z0 - u2 / z2)
    )
    add2 = (
        2.0 * (z0 / psi - 1.0) * u2 * v2 / (z2**3)
        - (u2 * v0 + u0 * v2) / (z2 * z2) / psi
        + dpsi_u * inv_psi2 * (z0 * v2 / (z2 * z2) - v0 / z2)
        + dpsi_v * inv_psi2 * (z0 * u2 / (z2 * z2) - u0 / z2)
    )
    out = out.at[..., 0].add(add0)
    out = out.at[..., 2].add(add2)
    out = 0.5 * out
    return jnp.where(ok[..., None], out, 0.0)


# =================================================================
# power cone (batched [k, 3], exponent a in (0,1))
# =================================================================
#
# Primal: s1^a s2^(1-a) >= |s3|, s1, s2 >= 0
# Dual:   (z1/a)^a (z2/(1-a))^(1-a) >= |z3|, z1, z2 >= 0
# reference: powcone.rs:185-433


def pow_unit_init(a):
    """Unit initialization: z = s = (sqrt(1+a), sqrt(2-a), 0).

    reference: powcone.rs unit_initialization (via GenPow formula
    sqrt(1+αi) with the 3-D layout)
    """
    return np.stack(
        [np.sqrt(1.0 + a), np.sqrt(1.0 + (1.0 - a)), np.zeros_like(a)], -1
    )


def pow_is_primal_feasible(a, s):
    ok = (s[..., 0] > 0) & (s[..., 1] > 0)
    res = (
        jnp.exp(2.0 * a * _logsafe(s[..., 0]) + 2.0 * (1.0 - a) * _logsafe(s[..., 1]))
        - s[..., 2] * s[..., 2]
    )
    return ok & (res > 0)


def pow_is_dual_feasible(a, z):
    ok = (z[..., 0] > 0) & (z[..., 1] > 0)
    res = (
        jnp.exp(
            2.0 * a * _logsafe(z[..., 0] / a)
            + 2.0 * (1.0 - a) * _logsafe(z[..., 1] / (1.0 - a))
        )
        - z[..., 2] * z[..., 2]
    )
    return ok & (res > 0)


def _pow_phi(a, z):
    return (z[..., 0] / a) ** (2.0 * a) * (z[..., 1] / (1.0 - a)) ** (2.0 - 2.0 * a)


def pow_barrier_dual(a, z):
    """powcone.rs:249-261"""
    arg1 = _pow_phi(a, z) - z[..., 2] * z[..., 2]
    return (
        -_logsafe(arg1)
        - (1.0 - a) * _logsafe(z[..., 0])
        - a * _logsafe(z[..., 1])
    )


def pow_barrier_primal(a, s):
    """powcone.rs:226-247 — f(s) = -f*(-g(s)) - 3 with ⟨s, g⟩ = -3."""
    g = pow_grad_primal(a, s)
    out = _logsafe(
        (-g[..., 0] / a) ** (2.0 * a)
        * (-g[..., 1] / (1.0 - a)) ** (2.0 - 2.0 * a)
        - g[..., 2] * g[..., 2]
    )
    out = out + (1.0 - a) * _logsafe(-g[..., 0])
    out = out + a * _logsafe(-g[..., 1]) - 3.0
    return out


def pow_grad_dual_and_hess(a, z):
    """Gradient and Hessian of f* at z (powcone.rs:354-386)."""
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    phi = _pow_phi(a, z)
    psi = phi - z2 * z2

    g0 = 2.0 * a * phi / (z0 * psi)
    g1 = 2.0 * (1.0 - a) * phi / (z1 * psi)
    g2 = -2.0 * z2 / psi

    H00 = g0 * g0 - 2.0 * a * (2.0 * a - 1.0) * phi / (z0 * z0 * psi) + (1.0 - a) / (
        z0 * z0
    )
    H01 = g0 * g1 - 4.0 * a * (1.0 - a) * phi / (z0 * z1 * psi)
    H11 = g1 * g1 - 2.0 * (1.0 - a) * (1.0 - 2.0 * a) * phi / (z1 * z1 * psi) + a / (
        z1 * z1
    )
    H02 = g0 * g2
    H12 = g1 * g2
    H22 = g2 * g2 + 2.0 / psi

    grad = jnp.stack([-g0 - (1.0 - a) / z0, -g1 - a / z1, -g2], -1)
    return grad, _sym3(H00, H01, H02, H11, H12, H22)


def _newton_raphson(x0, f0, f1, iters=100):
    """One-sided Newton-Raphson with the reference's stopping rules
    (nonsymmetric_common.rs:193-219), batched: the loop runs until every
    lane has converged, with per-lane freeze masks."""

    def cond_all(carry):
        _, k, done = carry
        return (~jnp.all(done)) & (k < iters)

    def body_all(carry):
        x, k, done = carry
        dfdx = f1(x)
        safe = jnp.where(dfdx != 0, dfdx, 1.0)
        dx = -f0(x) / safe
        eps = jnp.finfo(x.dtype).eps
        stop = (
            (dx < eps)
            | (jnp.abs(dx / jnp.where(x != 0, x, 1.0)) < jnp.sqrt(eps))
            | (jnp.abs(dfdx) < eps)
        )
        x = jnp.where(done | stop, x, x + dx)
        return x, k + 1, done | stop

    x, _, _ = jax.lax.while_loop(
        cond_all, body_all, (x0, 0, jnp.zeros(jnp.shape(x0), bool))
    )
    return x


def pow_grad_primal(a, s):
    """Primal-barrier gradient via Newton-Raphson (powcone.rs:394-420,
    447-491)."""
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    phi = s0 ** (2.0 * a) * s1 ** (2.0 - 2.0 * a)
    abs_s = jnp.abs(s2)
    eps = jnp.finfo(s.dtype).eps

    big = abs_s > eps
    sa = jnp.where(big, abs_s, 1.0)

    x0 = -1.0 / sa + (2.0 * sa + jnp.sqrt(phi * phi / (sa * sa) + 3.0 * phi)) / (
        phi - sa * sa
    )
    t0 = -2.0 * a * _logsafe(a) - 2.0 * (1.0 - a) * _logsafe(1.0 - a)

    def f0(x):
        t1 = x * x
        t2 = 2.0 * x / sa
        return (
            2.0 * a * _logsafe(2.0 * a * t1 + (1.0 + a) * t2)
            + 2.0 * (1.0 - a) * _logsafe(2.0 * (1.0 - a) * t1 + (2.0 - a) * t2)
            - _logsafe(phi)
            - _logsafe(t1 + t2)
            - 2.0 * _logsafe(t2)
            + t0
        )

    def f1(x):
        t1 = x * x
        t2 = 2.0 * x / sa
        return (
            2.0 * a * a / (a * x + (1.0 + a) / sa)
            + 2.0 * (1.0 - a) * (1.0 - a) / ((1.0 - a) * x + (2.0 - a) / sa)
            - 2.0 * (x + 1.0 / sa) / (t1 + t2)
        )

    g2abs = _newton_raphson(x0, f0, f1)
    g2 = jnp.where(big, jnp.where(s2 < 0, -g2abs, g2abs), 0.0)
    g0 = jnp.where(big, -(a * g2 * s2 + 1.0 + a) / s0, -(1.0 + a) / s0)
    g1 = jnp.where(
        big, -((1.0 - a) * g2 * s2 + 2.0 - a) / s1, -(2.0 - a) / s1
    )
    return jnp.stack([g0, g1, g2], -1)


def pow_higher_correction(a, Hd, z, ds, v):
    """Third-order correction η (powcone.rs:263-341)."""
    u, ok = _solve3(Hd, ds)
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]

    phi = _pow_phi(a, z)
    psi = phi - z2 * z2

    eta = jnp.stack(
        [2.0 * a * phi / z0, 2.0 * (1.0 - a) * phi / z1, -2.0 * z2], -1
    )

    Hpsi = _sym3(
        2.0 * a * (2.0 * a - 1.0) * phi / (z0 * z0),
        4.0 * a * (1.0 - a) * phi / (z0 * z1),
        jnp.zeros_like(z0),
        2.0 * (1.0 - a) * (1.0 - 2.0 * a) * phi / (z1 * z1),
        jnp.zeros_like(z0),
        -2.0 * jnp.ones_like(z0),
    )

    dpsi_u = jnp.einsum("...i,...i->...", u, eta)
    dpsi_v = jnp.einsum("...i,...i->...", v, eta)
    Hpsi_v = jnp.einsum("...ij,...j->...i", Hpsi, v)
    Hpsi_u = jnp.einsum("...ij,...j->...i", Hpsi, u)

    coef = (
        jnp.einsum("...i,...i->...", u, Hpsi_v) * psi - 2.0 * dpsi_u * dpsi_v
    ) / (psi**3)
    coef2 = (
        4.0
        * a
        * (2.0 * a - 1.0)
        * (1.0 - a)
        * phi
        * (u[..., 0] / z0 - u[..., 1] / z1)
        * (v[..., 0] / z0 - v[..., 1] / z1)
        / psi
    )
    inv_psi2 = 1.0 / (psi * psi)

    e0 = (
        coef * eta[..., 0]
        - 2.0 * (1.0 - a) * u[..., 0] * v[..., 0] / (z0**3)
        + coef2 / z0
        + Hpsi_v[..., 0] * dpsi_u * inv_psi2
    )
    e1 = (
        coef * eta[..., 1]
        - 2.0 * a * u[..., 1] * v[..., 1] / (z1**3)
        - coef2 / z1
        + Hpsi_v[..., 1] * dpsi_u * inv_psi2
    )
    e2 = coef * eta[..., 2] + Hpsi_v[..., 2] * dpsi_u * inv_psi2

    out = jnp.stack([e0, e1, e2], -1)
    out = 0.5 * (out + Hpsi_u * (dpsi_v * inv_psi2)[..., None])
    return jnp.where(ok[..., None], out, 0.0)


# =================================================================
# primal-dual scaling for the 3-D cones
# =================================================================


def pd_scaling_hs(Hd, grad_dual, grad_primal_fn, s, z):
    """Mosek-style primal-dual scaling with rank-3 structure, falling back
    to dual scaling near the central path.

    reference: nonsymmetric_common.rs:69-142.  Batched over [..., 3].
    """
    zt = grad_primal_fn(s)
    st = grad_dual

    dot_sz = jnp.einsum("...i,...i->...", s, z)
    mu = dot_sz / 3.0
    mut = jnp.einsum("...i,...i->...", st, zt) / 3.0

    ds = s + mu[..., None] * st
    dz = z + mu[..., None] * zt
    dot_dsz = jnp.einsum("...i,...i->...", ds, dz)

    Hzt = jnp.einsum("...ij,...j->...i", Hd, zt)
    de1 = mu * mut - 1.0
    de2 = jnp.einsum("...i,...i->...", zt, Hzt) - 3.0 * mut * mut

    eps = jnp.finfo(s.dtype).eps
    use_pd = (
        (jnp.abs(de1) > jnp.sqrt(eps))
        & (jnp.abs(de2) > eps)
        & (dot_sz > 0)
        & (dot_dsz > 0)
    )

    safe_de2 = jnp.where(de2 != 0, de2, 1.0)
    tmp = mut[..., None] * st - Hzt
    Hwork = (
        Hd
        - jnp.einsum("...i,...j->...ij", st, st) / 3.0
        - jnp.einsum("...i,...j->...ij", tmp, tmp) / safe_de2[..., None, None]
    )
    t = mu * jnp.sqrt(jnp.sum(Hwork * Hwork, axis=(-2, -1)))

    axis_z = jnp.cross(z, zt)
    axis_norm = jnp.linalg.norm(axis_z, axis=-1, keepdims=True)
    axis_z = axis_z / jnp.where(axis_norm > 0, axis_norm, 1.0)

    safe_dot_sz = jnp.where(dot_sz != 0, dot_sz, 1.0)
    safe_dot_dsz = jnp.where(dot_dsz != 0, dot_dsz, 1.0)
    # Hs = s·sᵀ/⟨s,z⟩ + δs·δsᵀ/⟨δs,δz⟩ + t·axis_z·axis_zᵀ
    Hs_pd = (
        jnp.einsum("...i,...j->...ij", s, s) / safe_dot_sz[..., None, None]
        + jnp.einsum("...i,...j->...ij", ds, ds) / safe_dot_dsz[..., None, None]
        + t[..., None, None] * jnp.einsum("...i,...j->...ij", axis_z, axis_z)
    )

    Hs_dual = mu[..., None, None] * Hd
    return jnp.where(use_pd[..., None, None], Hs_pd, Hs_dual)


# =================================================================
# layout-level composite hooks (called from cones.ops)
# =================================================================


def _exp_slice(layout):
    return layout.slice_of(api.EXP)


def _pow_slice(layout):
    return layout.slice_of(api.POW)


def _gp_slice(layout):
    return layout.slice_of(api.GENPOW)


def unit_initialization(layout: ConeLayout, z, s):
    dt = z.dtype  # NumPy init points are f64; cast to the solve dtype
    if layout.num_exp:
        sl = _exp_slice(layout)
        pt = np.tile(exp_unit_init(), layout.num_exp).astype(dt)
        z = z.at[sl].set(pt)
        s = s.at[sl].set(pt)
    if layout.num_pow:
        sl = _pow_slice(layout)
        pt = pow_unit_init(layout.pow_alpha).reshape(-1).astype(dt)
        z = z.at[sl].set(pt)
        s = s.at[sl].set(pt)
    if layout.num_genpow:
        sl = _gp_slice(layout)
        # reference: genpowcone.rs:132-140 — sqrt(1+αi) on the α part,
        # zero on the q part
        pt = np.where(
            layout.genpow_is_q, 0.0, np.sqrt(1.0 + layout.genpow_alpha)
        ).astype(dt)
        z = z.at[sl].set(pt)
        s = s.at[sl].set(pt)
    return z, s


def update_scaling(layout: ConeLayout, state, s, z, mu, strategy):
    ok = jnp.asarray(True)

    if layout.num_exp:
        sl = _exp_slice(layout)
        zi = z[sl].reshape(-1, 3)
        si = s[sl].reshape(-1, 3)
        Hd = exp_hess_dual(zi)
        grad = exp_grad_dual(zi)
        Hs_dual = ((si * zi).sum(-1) / 3.0)[..., None, None] * Hd
        Hs_pd = pd_scaling_hs(Hd, grad, exp_grad_primal, si, zi)
        Hs = jnp.where(strategy == SCALING_DUAL, Hs_dual, Hs_pd)
        state["exp_hs"] = Hs
        state["exp_hd"] = Hd
        state["exp_grad"] = grad
        state["exp_z"] = zi
        ok = ok & jnp.all(jnp.isfinite(Hs))

    if layout.num_pow:
        sl = _pow_slice(layout)
        a = layout.pow_alpha
        zi = z[sl].reshape(-1, 3)
        si = s[sl].reshape(-1, 3)
        grad, Hd = pow_grad_dual_and_hess(a, zi)
        Hs_dual = ((si * zi).sum(-1) / 3.0)[..., None, None] * Hd
        Hs_pd = pd_scaling_hs(Hd, grad, lambda ss: pow_grad_primal(a, ss), si, zi)
        Hs = jnp.where(strategy == SCALING_DUAL, Hs_dual, Hs_pd)
        state["pow_hs"] = Hs
        state["pow_hd"] = Hd
        state["pow_grad"] = grad
        state["pow_z"] = zi
        ok = ok & jnp.all(jnp.isfinite(Hs))

    if layout.num_genpow:
        state, ok_gp = _gp_update_scaling(layout, state, z, mu)
        ok = ok & ok_gp

    return state, ok


def _gp_seg_sum(layout, x):
    # per-cone sums as a 0/1 matmul against a trace-time constant instead
    # of segment_sum: the scatter-add lowering's index-clamp pattern
    # (gt/sub control deps) trips an XLA TPU algebraic-simplifier CHECK
    # ("A cycle is detected ... scatter-add") inside the solver loop's
    # cond, SIGABRTing the compiler on every genpow problem.  The matmul
    # is exact (0/1 weights) and MXU-friendly.
    onehot = np.equal(
        layout.genpow_seg[:, None],
        np.arange(layout.num_genpow)[None, :],
    )
    return x @ jnp.asarray(onehot, x.dtype)


def _gp_update_scaling(layout, state, z, mu):
    """Generalized power cone dual gradient / Hessian factors.

    reference: genpowcone.rs:360-401.  Hs = μ(D + pp' − qq' − rr').
    """
    sl = _gp_slice(layout)
    zi = z[sl]
    a = layout.genpow_alpha
    is_q = layout.genpow_is_q
    seg = layout.genpow_seg

    # φ = Π (z_i/α_i)^(2α_i) over the α part
    logphi_terms = jnp.where(is_q, 0.0, 2.0 * a * _logsafe(zi / jnp.where(is_q, 1.0, a)))
    phi = jnp.exp(_gp_seg_sum(layout, logphi_terms))
    norm2w = _gp_seg_sum(layout, jnp.where(is_q, zi * zi, 0.0))
    zeta = phi - norm2w
    ok = jnp.all(zeta > 0)

    tau = jnp.where(is_q, 0.0, 2.0 * a / zi)
    grad = jnp.where(
        is_q,
        (2.0 / zeta[seg]) * zi,
        -tau * phi[seg] / zeta[seg] - (1.0 - a) / zi,
    )

    p0 = jnp.sqrt(phi * (phi + norm2w) / 2.0)
    p1 = -2.0 * phi / p0
    q0 = jnp.sqrt(zeta * phi / 2.0)
    r1 = 2.0 * jnp.sqrt(zeta / (phi + norm2w))

    d1 = jnp.where(is_q, 0.0, tau * phi[seg] / (zeta[seg] * zi) + (1.0 - a) / (zi * zi))
    d2 = 2.0 / zeta

    p = jnp.where(is_q, (p1 / zeta)[seg] * zi, (p0 / zeta)[seg] * tau)
    qv = jnp.where(is_q, 0.0, (q0 / zeta)[seg] * tau)
    rv = jnp.where(is_q, (r1 / zeta)[seg] * zi, 0.0)

    state["gp_grad"] = grad
    state["gp_p"] = p
    state["gp_q"] = qv
    state["gp_r"] = rv
    state["gp_d1"] = d1  # per-entry diag (zero on q part)
    state["gp_d2"] = d2  # per-cone scalar for the q part
    state["gp_mu"] = mu
    state["gp_z"] = zi
    return state, ok


def hs_dense(layout: ConeLayout, state, H):
    if layout.num_exp:
        sl = _exp_slice(layout)
        H = _embed_3x3_blocks(H, state["exp_hs"], sl.start)
    if layout.num_pow:
        sl = _pow_slice(layout)
        H = _embed_3x3_blocks(H, state["pow_hs"], sl.start)
    if layout.num_genpow:
        sl = _gp_slice(layout)
        seg = layout.genpow_seg
        same = seg[:, None] == seg[None, :]
        p, qv, rv = state["gp_p"], state["gp_q"], state["gp_r"]
        diag = jnp.where(
            layout.genpow_is_q, state["gp_d2"][seg], state["gp_d1"]
        )
        blk = (
            jnp.where(same, p[:, None] * p[None, :], 0.0)
            - jnp.where(same, qv[:, None] * qv[None, :], 0.0)
            - jnp.where(same, rv[:, None] * rv[None, :], 0.0)
            + jnp.diag(diag)
        )
        H = H.at[sl, sl].set(state["gp_mu"] * blk)
    return H


def _embed_3x3_blocks(H, blocks, start):
    """Place [k,3,3] blocks on the diagonal of H beginning at ``start``."""
    k = blocks.shape[0]
    idx = start + np.arange(3 * k).reshape(k, 3)
    rows = idx[:, :, None]  # [k,3,1]
    cols = idx[:, None, :]  # [k,1,3]
    return H.at[rows, cols].set(blocks)


def mul_hs(layout: ConeLayout, state, x, y):
    if layout.num_exp:
        sl = _exp_slice(layout)
        xi = x[sl].reshape(-1, 3)
        y = y.at[sl].set(
            jnp.einsum("kij,kj->ki", state["exp_hs"], xi).reshape(-1)
        )
    if layout.num_pow:
        sl = _pow_slice(layout)
        xi = x[sl].reshape(-1, 3)
        y = y.at[sl].set(
            jnp.einsum("kij,kj->ki", state["pow_hs"], xi).reshape(-1)
        )
    if layout.num_genpow:
        sl = _gp_slice(layout)
        xi = x[sl]
        seg = layout.genpow_seg
        is_q = layout.genpow_is_q
        p, qv, rv = state["gp_p"], state["gp_q"], state["gp_r"]
        coef_p = _gp_seg_sum(layout, p * xi)
        coef_q = _gp_seg_sum(layout, qv * xi)
        coef_r = _gp_seg_sum(layout, rv * xi)
        diag = jnp.where(is_q, state["gp_d2"][seg], state["gp_d1"])
        out = diag * xi - coef_q[seg] * qv - coef_r[seg] * rv + coef_p[seg] * p
        y = y.at[sl].set(state["gp_mu"] * out)
    return y


def affine_ds(layout: ConeLayout, ds, s):
    """Nonsymmetric cones use ds = s (expcone.rs:134-136 etc.)."""
    for sl in _present_slices(layout):
        ds = ds.at[sl].set(s[sl])
    return ds


def _present_slices(layout):
    out = []
    if layout.num_exp:
        out.append(_exp_slice(layout))
    if layout.num_pow:
        out.append(_pow_slice(layout))
    if layout.num_genpow:
        out.append(_gp_slice(layout))
    return out


def combined_ds_shift(layout: ConeLayout, state, shift, step_z, step_s, sigma_mu, z):
    """shift = σμ·g(z) − η(Δs, Δz)  (expcone.rs:138-147, powcone.rs:131-140,
    genpowcone.rs:208-213 — no 3rd-order term for genpow)."""
    if layout.num_exp:
        sl = _exp_slice(layout)
        dz = step_z[sl].reshape(-1, 3)
        dsv = step_s[sl].reshape(-1, 3)
        eta = exp_higher_correction(state["exp_hd"], state["exp_z"], dsv, dz)
        out = state["exp_grad"] * sigma_mu - eta
        shift = shift.at[sl].set(out.reshape(-1))
    if layout.num_pow:
        sl = _pow_slice(layout)
        a = layout.pow_alpha
        dz = step_z[sl].reshape(-1, 3)
        dsv = step_s[sl].reshape(-1, 3)
        eta = pow_higher_correction(a, state["pow_hd"], state["pow_z"], dsv, dz)
        out = state["pow_grad"] * sigma_mu - eta
        shift = shift.at[sl].set(out.reshape(-1))
    if layout.num_genpow:
        sl = _gp_slice(layout)
        shift = shift.at[sl].set(state["gp_grad"] * sigma_mu)
    return shift


def _backtrack(feasible_fn, q, dq, alpha, settings):
    """Vectorized feasibility backtracking (nonsymmetric_common.rs:164-192):
    shrink the shared α until every cone admits q + α·dq, or α < α_min."""
    step = settings.linesearch_backtrack_step
    amin = settings.min_terminate_step_length

    def cond(a):
        inside = jnp.all(feasible_fn(q + a * dq))
        return (~inside) & (a >= amin)

    def body(a):
        return a * step

    a = jax.lax.while_loop(cond, body, alpha)
    a = jnp.where(a < amin, 0.0, a)
    return a


def step_length(layout: ConeLayout, state, dz, ds, z, s, settings, alpha):
    if layout.num_exp:
        sl = _exp_slice(layout)
        zi, dzi = z[sl].reshape(-1, 3), dz[sl].reshape(-1, 3)
        si, dsi = s[sl].reshape(-1, 3), ds[sl].reshape(-1, 3)
        alpha = _backtrack(exp_is_dual_feasible, zi, dzi, alpha, settings)
        alpha = _backtrack(exp_is_primal_feasible, si, dsi, alpha, settings)
    if layout.num_pow:
        sl = _pow_slice(layout)
        a_ = layout.pow_alpha
        zi, dzi = z[sl].reshape(-1, 3), dz[sl].reshape(-1, 3)
        si, dsi = s[sl].reshape(-1, 3), ds[sl].reshape(-1, 3)
        alpha = _backtrack(lambda v: pow_is_dual_feasible(a_, v), zi, dzi, alpha, settings)
        alpha = _backtrack(lambda v: pow_is_primal_feasible(a_, v), si, dsi, alpha, settings)
    if layout.num_genpow:
        sl = _gp_slice(layout)
        zi, dzi = z[sl], dz[sl]
        si, dsi = s[sl], ds[sl]
        alpha = _backtrack(
            lambda v: _gp_is_dual_feasible(layout, v), zi, dzi, alpha, settings
        )
        alpha = _backtrack(
            lambda v: _gp_is_primal_feasible(layout, v), si, dsi, alpha, settings
        )
    return alpha


def _gp_is_primal_feasible(layout, s):
    """genpowcone.rs:269-288 — returns per-cone feasibility flags [k]."""
    a = layout.genpow_alpha
    is_q = layout.genpow_is_q
    pos = _gp_seg_sum(layout, jnp.where(is_q | (s > 0), 0.0, 1.0)) == 0
    logterm = jnp.where(is_q, 0.0, 2.0 * a * _logsafe(jnp.where(is_q, 1.0, s)))
    res = jnp.exp(_gp_seg_sum(layout, logterm)) - _gp_seg_sum(
        layout, jnp.where(is_q, s * s, 0.0)
    )
    return pos & (res > 0)


def _gp_is_dual_feasible(layout, z):
    """genpowcone.rs:291-310"""
    a = layout.genpow_alpha
    is_q = layout.genpow_is_q
    pos = _gp_seg_sum(layout, jnp.where(is_q | (z > 0), 0.0, 1.0)) == 0
    logterm = jnp.where(
        is_q, 0.0, 2.0 * a * _logsafe(jnp.where(is_q, 1.0, z / jnp.where(is_q, 1.0, a)))
    )
    res = jnp.exp(_gp_seg_sum(layout, logterm)) - _gp_seg_sum(
        layout, jnp.where(is_q, z * z, 0.0)
    )
    return pos & (res > 0)


def compute_barrier(layout: ConeLayout, z, s, dz, ds, alpha):
    barrier = jnp.asarray(0.0, z.dtype)
    if layout.num_exp:
        sl = _exp_slice(layout)
        cz = (z[sl] + alpha * dz[sl]).reshape(-1, 3)
        cs = (s[sl] + alpha * ds[sl]).reshape(-1, 3)
        barrier = barrier + jnp.sum(exp_barrier_dual(cz)) + jnp.sum(
            exp_barrier_primal(cs)
        )
    if layout.num_pow:
        sl = _pow_slice(layout)
        a = layout.pow_alpha
        cz = (z[sl] + alpha * dz[sl]).reshape(-1, 3)
        cs = (s[sl] + alpha * ds[sl]).reshape(-1, 3)
        barrier = barrier + jnp.sum(pow_barrier_dual(a, cz)) + jnp.sum(
            pow_barrier_primal(a, cs)
        )
    if layout.num_genpow:
        sl = _gp_slice(layout)
        cz = z[sl] + alpha * dz[sl]
        cs = s[sl] + alpha * ds[sl]
        barrier = barrier + jnp.sum(_gp_barrier_dual(layout, cz))
        barrier = barrier + jnp.sum(_gp_barrier_primal(layout, cs))
    return barrier


def _gp_barrier_dual(layout, z):
    """genpowcone.rs:333-354"""
    a = layout.genpow_alpha
    is_q = layout.genpow_is_q
    logterm = jnp.where(
        is_q, 0.0, 2.0 * a * _logsafe(jnp.where(is_q, 1.0, z / jnp.where(is_q, 1.0, a)))
    )
    res = jnp.exp(_gp_seg_sum(layout, logterm)) - _gp_seg_sum(
        layout, jnp.where(is_q, z * z, 0.0)
    )
    per_entry = jnp.where(is_q, 0.0, -(1.0 - a) * _logsafe(z))
    return -_logsafe(res) + _gp_seg_sum(layout, per_entry)


def _gp_barrier_primal(layout, s):
    """genpowcone.rs:312-331 — f(s) = -f*(-g(s)) - ν."""
    g = _gp_gradient_primal(layout, s)
    degs = np.asarray(
        [len(c.alpha) + 1 for c in layout.genpow_cones], np.float64
    )
    return -_gp_barrier_dual(layout, -g) - degs


def _gp_gradient_primal(layout, s):
    """genpowcone.rs:409-441"""
    a = layout.genpow_alpha
    is_q = layout.genpow_is_q
    seg = layout.genpow_seg

    logphi = _gp_seg_sum(layout, jnp.where(is_q, 0.0, 2.0 * a * _logsafe(s)))
    phi = jnp.exp(logphi)
    norm_r = jnp.sqrt(_gp_seg_sum(layout, jnp.where(is_q, s * s, 0.0)))
    eps = jnp.finfo(s.dtype).eps
    big = norm_r > eps
    nr = jnp.where(big, norm_r, 1.0)

    psi = np.asarray(
        [1.0 / sum(x * x for x in c.alpha) for c in layout.genpow_cones],
        np.float64,
    )

    x0 = -1.0 / nr + (psi * nr + jnp.sqrt((phi / nr / nr + psi * psi - 1.0) * phi)) / (
        phi - nr * nr
    )

    asafe = np.where(is_q, 1.0, a)  # avoid 0-division on the masked q part

    def f0(x):
        finit = -_logsafe(2.0 * x / nr + x * x)
        terms = jnp.where(
            is_q,
            0.0,
            2.0 * a * (_logsafe(x[seg] * nr[seg] + (1.0 + asafe) / asafe) - _logsafe(s)),
        )
        return finit + _gp_seg_sum(layout, terms)

    def f1(x):
        finit = -(2.0 * x + 2.0 / nr) / (x * x + 2.0 * x / nr)
        terms = jnp.where(
            is_q, 0.0, 2.0 * a * nr[seg] / (nr[seg] * x[seg] + (1.0 + asafe) / asafe)
        )
        return finit + _gp_seg_sum(layout, terms)

    g1 = _newton_raphson(x0, f0, f1)

    gq = jnp.where(is_q, (g1 / nr)[seg] * s, 0.0)
    gp_big = -(1.0 + a + a * (g1 * nr)[seg]) / jnp.where(is_q, 1.0, s)
    gp_small = -(1.0 + a) / jnp.where(is_q, 1.0, s)
    gp = jnp.where(is_q, 0.0, jnp.where(big[seg], gp_big, gp_small))
    return jnp.where(is_q, jnp.where(big[seg], gq, 0.0), gp)
