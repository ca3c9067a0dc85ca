"""Ruiz equilibration, fully jitted.

Functional re-expression of the reference's in-place Ruiz loop
(reference: src/solver/implementations/default/problemdata.rs:229-312) over
dense problem data.  The loop runs a fixed ``equilibrate_max_iter`` passes
under ``lax.fori_loop`` (the reference also runs a fixed count), so it traces
to a single compiled region and vmaps cleanly over problem batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cones import ops as cone_ops
from .cones.layout import ConeLayout


def equilibrate(layout: ConeLayout, settings, P, q, A, b, triu_mask):
    """Returns (P, q, A, b, d, e, c) with data scaled in the equilibrated
    frame: P' = c·dPd, q' = c·dq, A' = eAd, b' = eb.

    ``triu_mask`` is the static upper-triangle mask of P used for the cost
    normalization term (the reference computes column norms of the
    triu-stored P there; problemdata.rs:280-295).
    """
    n, m = q.shape[0], b.shape[0]
    dtype = q.dtype

    d = jnp.ones(n, dtype)
    e = jnp.ones(m, dtype)
    c = jnp.asarray(1.0, dtype)

    if not settings.equilibrate_enable:
        return P, q, A, b, d, e, c

    scale_min = settings.equilibrate_min_scaling
    scale_max = settings.equilibrate_max_scaling

    def body(_, carry):
        P, q, A, b, d, e, c = carry

        # inf-norms of the KKT columns (problemdata.rs:319-328):
        # LHS cols: symmetric P column norms joined with A column norms;
        # RHS rows: A row norms
        dwork = jnp.maximum(
            jnp.max(jnp.abs(P), axis=0), jnp.max(jnp.abs(A), axis=0, initial=0.0)
        )
        ework = jnp.max(jnp.abs(A), axis=1, initial=0.0)

        # zero rows / columns are left unscaled
        dwork = jnp.where(dwork == 0, 1.0, dwork)
        ework = jnp.where(ework == 0, 1.0, ework)

        dwork = 1.0 / jnp.sqrt(dwork)
        ework = 1.0 / jnp.sqrt(ework)

        # bound the cumulative scaling
        dwork = jnp.clip(dwork, scale_min / d, scale_max / d)
        ework = jnp.clip(ework, scale_min / e, scale_max / e)

        # scale data
        P = P * dwork[:, None] * dwork[None, :]
        A = A * ework[:, None] * dwork[None, :]
        q = q * dwork
        b = b * ework
        d = d * dwork
        e = e * ework

        # cost normalization (problemdata.rs:280-295).  The reference takes
        # per-column max-abs over the triu-stored P only.
        col_norm_P = jnp.max(jnp.abs(P) * triu_mask, axis=0, initial=0.0)
        mean_col_norm_P = jnp.mean(col_norm_P) if n > 0 else jnp.asarray(0.0, dtype)
        inf_norm_q = jnp.max(jnp.abs(q), initial=0.0)

        do_cost = (mean_col_norm_P != 0) & (inf_norm_q != 0)
        scale_cost = jnp.maximum(inf_norm_q, mean_col_norm_P)
        ctmp = jnp.where(do_cost, 1.0 / jnp.where(do_cost, scale_cost, 1.0), 1.0)
        ctmp = jnp.where(do_cost, jnp.clip(ctmp, scale_min / c, scale_max / c), 1.0)

        P = P * ctmp
        q = q * ctmp
        c = c * ctmp

        return P, q, A, b, d, e, c

    P, q, A, b, d, e, c = jax.lax.fori_loop(
        0, settings.equilibrate_max_iter, body, (P, q, A, b, d, e, c)
    )

    # per-cone rectification: cones that only admit a scalar scaling get
    # their rows replaced by the cone mean (problemdata.rs:299-307)
    delta, changed = cone_ops.rectify_equilibration(layout, e)
    if changed:
        A = A * delta[:, None]
        b = b * delta
        e = e * delta

    return P, q, A, b, d, e, c


def equilibrate_sparse(layout: ConeLayout, settings, P, q, A, b):
    """Ruiz equilibration over COO sparse data (same math as
    :func:`equilibrate`; problemdata.rs:229-312).  ``P`` is the FULL
    symmetric matrix as a :class:`~clarabel_tpu.algebra.coo.COOMat`;
    ``A`` the cone-permuted constraint matrix.  Norms are segment
    reductions over the triplet sets instead of dense axis reductions."""
    n, m = q.shape[0], b.shape[0]
    dtype = q.dtype

    d = jnp.ones(n, dtype)
    e = jnp.ones(m, dtype)
    c = jnp.asarray(1.0, dtype)

    if not settings.equilibrate_enable:
        return P, q, A, b, d, e, c

    scale_min = settings.equilibrate_min_scaling
    scale_max = settings.equilibrate_max_scaling

    Pr, Pc = P.rows, P.cols
    Ar, Ac = A.rows, A.cols
    triu_mask = Pr <= Pc  # triu-stored-P entries for cost normalization

    def _colmax(vals, idx, num):
        mx = jax.ops.segment_max(vals, idx, num_segments=num)
        return jnp.maximum(mx, 0.0)  # empty segments -> 0

    def body(_, carry):
        Pv, q, Av, b, d, e, c = carry

        dwork = jnp.maximum(
            _colmax(jnp.abs(Pv), Pc, n), _colmax(jnp.abs(Av), Ac, n)
        )
        ework = _colmax(jnp.abs(Av), Ar, m)

        dwork = jnp.where(dwork == 0, 1.0, dwork)
        ework = jnp.where(ework == 0, 1.0, ework)

        dwork = 1.0 / jnp.sqrt(dwork)
        ework = 1.0 / jnp.sqrt(ework)

        dwork = jnp.clip(dwork, scale_min / d, scale_max / d)
        ework = jnp.clip(ework, scale_min / e, scale_max / e)

        Pv = Pv * dwork[Pr] * dwork[Pc]
        Av = Av * ework[Ar] * dwork[Ac]
        q = q * dwork
        b = b * ework
        d = d * dwork
        e = e * ework

        col_norm_P = _colmax(jnp.where(triu_mask, jnp.abs(Pv), 0.0), Pc, n)
        mean_col_norm_P = (
            jnp.mean(col_norm_P) if n > 0 else jnp.asarray(0.0, dtype)
        )
        inf_norm_q = jnp.max(jnp.abs(q), initial=0.0)

        do_cost = (mean_col_norm_P != 0) & (inf_norm_q != 0)
        scale_cost = jnp.maximum(inf_norm_q, mean_col_norm_P)
        ctmp = jnp.where(do_cost, 1.0 / jnp.where(do_cost, scale_cost, 1.0), 1.0)
        ctmp = jnp.where(do_cost, jnp.clip(ctmp, scale_min / c, scale_max / c), 1.0)

        Pv = Pv * ctmp
        q = q * ctmp
        c = c * ctmp

        return Pv, q, Av, b, d, e, c

    Pv, q, Av, b, d, e, c = jax.lax.fori_loop(
        0, settings.equilibrate_max_iter, body,
        (P.data, q, A.data, b, d, e, c),
    )

    delta, changed = cone_ops.rectify_equilibration(layout, e)
    if changed:
        Av = Av * delta[Ar]
        b = b * delta
        e = e * delta

    return P.with_data(Pv), q, A.with_data(Av), b, d, e, c


def equilibrate_ell(layout: ConeLayout, settings, P, q, A, b, triu_mask):
    """Ruiz equilibration with A stored as a row-sharded
    :class:`~clarabel_tpu.algebra.ell.ELLRowMat` (P dense replicated).
    Same math as :func:`equilibrate`; A's norms/scalings run as per-shard
    ops + collectives inside the ELL methods, so A is never gathered.
    """
    n, m = q.shape[0], b.shape[0]
    dtype = q.dtype

    d = jnp.ones(n, dtype)
    e = jnp.ones(m, dtype)
    c = jnp.asarray(1.0, dtype)

    if not settings.equilibrate_enable:
        return P, q, A, b, d, e, c

    scale_min = settings.equilibrate_min_scaling
    scale_max = settings.equilibrate_max_scaling

    def body(_, carry):
        P, q, A, b, d, e, c = carry

        dwork = jnp.maximum(jnp.max(jnp.abs(P), axis=0), A.col_abs_max())
        ework = A.row_abs_max()

        dwork = jnp.where(dwork == 0, 1.0, dwork)
        ework = jnp.where(ework == 0, 1.0, ework)

        dwork = 1.0 / jnp.sqrt(dwork)
        ework = 1.0 / jnp.sqrt(ework)

        dwork = jnp.clip(dwork, scale_min / d, scale_max / d)
        ework = jnp.clip(ework, scale_min / e, scale_max / e)

        P = P * dwork[:, None] * dwork[None, :]
        A = A.scale(ework, dwork)
        q = q * dwork
        b = b * ework
        d = d * dwork
        e = e * ework

        col_norm_P = jnp.max(jnp.abs(P) * triu_mask, axis=0, initial=0.0)
        mean_col_norm_P = (
            jnp.mean(col_norm_P) if n > 0 else jnp.asarray(0.0, dtype)
        )
        inf_norm_q = jnp.max(jnp.abs(q), initial=0.0)

        do_cost = (mean_col_norm_P != 0) & (inf_norm_q != 0)
        scale_cost = jnp.maximum(inf_norm_q, mean_col_norm_P)
        ctmp = jnp.where(do_cost, 1.0 / jnp.where(do_cost, scale_cost, 1.0), 1.0)
        ctmp = jnp.where(do_cost, jnp.clip(ctmp, scale_min / c, scale_max / c), 1.0)

        P = P * ctmp
        q = q * ctmp
        c = c * ctmp

        return P, q, A, b, d, e, c

    P, q, A, b, d, e, c = jax.lax.fori_loop(
        0, settings.equilibrate_max_iter, body, (P, q, A, b, d, e, c)
    )

    # diag-Hs layouts (zero/NN cones only) never need rectification
    # (rectify_equilibration only modifies e for cones requiring a scalar
    # scaling: SOC/exp/pow/genpow/PSD)
    delta, changed = cone_ops.rectify_equilibration(layout, e)
    if changed:
        A = A.scale(delta, jnp.ones(n, dtype))
        b = b * delta
        e = e * delta

    return P, q, A, b, d, e, c
