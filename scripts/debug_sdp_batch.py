"""Why does the vmapped batch degrade directions near mu -> 0?

Stop a B=4 batch at iteration K, extract lane 0's equilibrated iterate,
and compute ONE predictor direction at that iterate three ways:
unbatched f32, vmapped f32 (lane 0 of 4), and f64.  If unbatched and
vmapped disagree, bisect the stage that differs under vmap.
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp

import clarabel_tpu as ct
from clarabel_tpu import loop as L
from clarabel_tpu.cones import ops as cone_ops
from clarabel_tpu.cones import api
from clarabel_tpu.cones.layout import ConeLayout
from bench import _svec  # type: ignore

STOP = int(sys.argv[1]) if len(sys.argv) > 1 else 6

B, n, dmat = 64, 16, 4
tri = dmat * (dmat + 1) // 2
rng = np.random.default_rng(2)
M = rng.normal(size=(B, n, n)) / np.sqrt(n)
P = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(n)
Apsd = np.zeros((tri, n)); Apsd[:tri, :min(tri, n)] = -np.eye(tri)[:, :min(tri, n)]
A = np.tile(np.vstack([np.eye(n), -np.eye(n), Apsd]), (B, 1, 1))
x_star = 0.5 * rng.normal(size=(B, n))
m_nn = 2 * n
s_nn = rng.uniform(0.5, 1.5, (B, m_nn))
z_nn = np.zeros((B, m_nn))
act = rng.uniform(size=(B, m_nn)) < 0.25
z_nn[act] = rng.uniform(0.5, 1.5, act.sum())
s_nn[act] = 0.0
G = rng.normal(size=(B, dmat, dmat))
Qo, _ = np.linalg.qr(G)
k = dmat // 2
ls = rng.uniform(0.5, 1.5, (B, k))
lz = rng.uniform(0.5, 1.5, (B, dmat - k))
Smat = np.einsum("bik,bk,bjk->bij", Qo[:, :, :k], ls, Qo[:, :, :k])
Zmat = np.einsum("bik,bk,bjk->bij", Qo[:, :, k:], lz, Qo[:, :, k:])
s_star = np.concatenate([s_nn, _svec(Smat)], axis=1)
z_star = np.concatenate([z_nn, _svec(Zmat)], axis=1)
b = np.einsum("bmn,bn->bm", A, x_star) + s_star
q = -(np.einsum("bij,bj->bi", P, x_star) + np.einsum("bmn,bm->bn", A, z_star))

cpu = jax.devices("cpu")[0]
cones = [ct.NonnegativeConeT(2 * n), ct.PSDTriangleConeT(dmat)]
settings = ct.DefaultSettings.for_float32(verbose=False, max_iter=STOP)

b4 = ct.BatchSolver(P[0:4], q[0:4], A[0:4], b[0:4], cones, settings,
                    dtype="float32", device=cpu)
sol4 = b4.solve()
out = b4._last_out
print("B4 statuses at stop:", [str(s) for s in sol4.statuses()])

cones_int = tuple(api.collapse_cones(tuple(cones)))
layout = ConeLayout(cones_int)
perm = layout.perm
LANE = 0

d = np.asarray(out["equil_d"][LANE], np.float64)
e = np.asarray(out["equil_e"][LANE], np.float64)
c_scale = float(out["equil_c"][LANE])
tau = float(out["tau"][LANE]); kappa = float(out["kappa"][LANE])

# out["z"]/["s"] from BatchSolver are raw core outputs in PERMUTED order
# pre-iperm?  _gather_local output z/s then solve() applied iperm to make
# user order in BatchSolution; _last_out holds the RAW dict (permuted).
x_eq = np.asarray(out["x"][LANE], np.float64) * tau / d
z_eq = np.asarray(out["z"][LANE], np.float64) * tau * c_scale / e
s_eq = np.asarray(out["s"][LANE], np.float64) * tau * e

P1 = P[LANE]; q1 = q[LANE]; A1 = A[LANE][perm, :]; b1 = b[LANE][perm]
P_eq = c_scale * (d[:, None] * ((np.triu(P1) + np.triu(P1, 1).T)) * d[None, :])
q_eq = c_scale * d * q1
A_eq = e[:, None] * A1 * d[None, :]
b_eq = e * b1
nn = n


def direction(dtype_name, vmap_b=0):
    """vmap_b = 0: unbatched; else replicate the iterate vmap_b times and
    take lane 0 of a vmapped computation."""
    dtype = jnp.dtype(dtype_name)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)

    def one(Pj, qj, Aj, bj, x, s, z, tj, kj):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        scaling_state, ok_scale = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx, cone_ops.affine_ds(layout, scaling_state, s),
            res.rz, res.rtau, tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, scaling_state, affine_rhs, variables, is_combined=False
        )
        factors, K, ok_f = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, scaling_state
        )
        sol_c, ok_c = L.solve_kkt_refined(factors, K, rhs_const,
                                          st_settings, want_lo=True)
        sol_a, ok_a = L.solve_kkt_refined(factors, K, rhs_aff,
                                          st_settings, want_lo=True)
        if isinstance(sol_c, tuple):
            (c_hi, c_lo) = sol_c
            x2 = (c_hi[:nn], None if c_lo is None else c_lo[:nn])
            z2 = (c_hi[nn:], None if c_lo is None else c_lo[nn:])
        else:
            x2, z2 = sol_c[:nn], sol_c[nn:]
        aff = L.kkt_solve_finish(
            layout, scaling_state, Pj, qj, Aj, bj, x2, z2, sol_a, dsc_aff,
            affine_rhs, variables, K_true=K,
        )
        alpha_aff = L.calc_step_length(
            layout, scaling_state, aff, variables, st_settings,
            is_combined=False, scaling=L.SCALING_PRIMAL_DUAL,
        )
        return alpha_aff, aff

    f = lambda v: jnp.asarray(v, dtype)
    args = (f(P_eq), f(q_eq), f(A_eq), f(b_eq), f(x_eq), f(s_eq), f(z_eq),
            f(tau), f(kappa))
    with jax.default_matmul_precision("highest"):
        if vmap_b == 0:
            a, aff = jax.jit(one)(*args)
        else:
            argsb = jax.tree.map(
                lambda v: jnp.broadcast_to(v, (vmap_b,) + v.shape), args
            )
            a, aff = jax.jit(jax.vmap(one))(*argsb)
            a = a[0]
            aff = jax.tree.map(lambda v: v[0], aff)
    return float(a), [np.asarray(v, np.float64) for v in aff]


a1, aff1 = direction("float32", 0)
a4, aff4 = direction("float32", 4)
a64, aff64 = direction("float64", 0)
print(f"alpha_aff unbatched f32: {a1:.4f}  vmap4 f32: {a4:.4f}  f64: {a64:.4f}")
names = ["dx", "ds", "dz", "dtau", "dkappa"]
for nm, v1, v4, v6 in zip(names, aff1, aff4, aff64):
    den = max(np.max(np.abs(v6)), 1e-30)
    print(f"{nm}: unb-vs-f64 {np.max(np.abs(v1-v6))/den:.2e}  "
          f"vmap-vs-f64 {np.max(np.abs(v4-v6))/den:.2e}  "
          f"unb-vs-vmap {np.max(np.abs(v1-v4))/den:.2e}")


def stage_vmap_diff():
    dtype = jnp.float32
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    f = lambda v: jnp.asarray(v, dtype)
    args = (f(P_eq), f(q_eq), f(A_eq), f(b_eq), f(x_eq), f(s_eq), f(z_eq),
            f(tau), f(kappa))

    def stages(Pj, qj, Aj, bj, x, s, z, tj, kj):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        ss, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx, cone_ops.affine_ds(layout, ss, s), res.rz, res.rtau,
            tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc = L.kkt_solve_rhs(
            layout, ss, affine_rhs, variables, is_combined=False
        )
        factors, K, _ = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, ss
        )
        sol_c, _ = L.solve_kkt_refined(factors, K, rhs_const, st_settings,
                                       want_lo=True)
        sol_a, _ = L.solve_kkt_refined(factors, K, rhs_aff, st_settings,
                                       want_lo=True)
        Kh = K[0] if isinstance(K, tuple) else K
        return dict(rx=res.rx, rz=res.rz, lam=ss.get("psd0_lam"),
                    R=ss.get("psd0_R"), rhs_aff=rhs_aff, K=Kh,
                    solc=sol_c[0] + sol_c[1], sola=sol_a[0] + sol_a[1])

    with jax.default_matmul_precision("highest"):
        u = jax.jit(stages)(*args)
        argsb = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (4,) + v.shape), args
        )
        v = jax.jit(jax.vmap(stages))(*argsb)
        v = jax.tree.map(lambda t: t[0], v)
    for key in u:
        a, b_ = np.asarray(u[key], np.float64), np.asarray(v[key], np.float64)
        den = max(np.max(np.abs(a)), 1e-30)
        print(f"{key}: vmap-vs-unb max abs {np.max(np.abs(a - b_)):.3e} "
              f"(scale {den:.3e})")
stage_vmap_diff()


def terminal_analysis():
    """At the B4 lane-0 terminal iterate: cone feasibility (f64 chol of
    S/Z), direction quality, and blocking component."""
    nnn = 2 * n

    def unsvec(v):
        Mx = np.zeros((dmat, dmat)); rt2 = np.sqrt(2.0); k_ = 0
        for j in range(dmat):
            for i in range(j + 1):
                if i == j: Mx[i, i] = v[k_]
                else: Mx[i, j] = Mx[j, i] = v[k_] / rt2
                k_ += 1
        return Mx

    Sm = unsvec(s_eq[nnn:nnn + tri])
    Zm = unsvec(z_eq[nnn:nnn + tri])
    print("eig(S):", np.linalg.eigvalsh(Sm))
    print("eig(Z):", np.linalg.eigvalsh(Zm))
    print("min s_nn:", s_eq[:nnn].min(), " min z_nn:", z_eq[:nnn].min())
terminal_analysis()


def full_step_probe(vmap_b=0):
    dtype = jnp.float32
    st_settings = ct.DefaultSettings.for_float32(verbose=False)

    def one(Pj, qj, Aj, bj, x, s, z, tj, kj):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        ss, ok_scale = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx, cone_ops.affine_ds(layout, ss, s), res.rz, res.rtau,
            tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, ss, affine_rhs, variables, is_combined=False
        )
        factors, K, ok_f = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, ss
        )
        sol_c, ok_c = L.solve_kkt_refined(factors, K, rhs_const,
                                          st_settings, want_lo=True)
        sol_a, ok_a = L.solve_kkt_refined(factors, K, rhs_aff,
                                          st_settings, want_lo=True)
        (c_hi, c_lo) = sol_c
        x2 = (c_hi[:nn], c_lo[:nn])
        z2 = (c_hi[nn:], c_lo[nn:])
        aff = L.kkt_solve_finish(
            layout, ss, Pj, qj, Aj, bj, x2, z2, sol_a, dsc_aff,
            affine_rhs, variables, K_true=K,
        )
        alpha_aff = L.calc_step_length(
            layout, ss, aff, variables, st_settings,
            is_combined=False, scaling=L.SCALING_PRIMAL_DUAL,
        )
        sigma = (1.0 - alpha_aff) ** 3
        mu_floor = st_settings.tol_gap_abs / (layout.degree + 1) * 0.25
        sigma = jnp.minimum(
            jnp.maximum(sigma, jnp.minimum(1.0, mu_floor / mu)), 1.0)
        dx_a, ds_a, dz_a, dtau_a, dkappa_a = aff
        sigma_mu = sigma * mu
        shift = cone_ops.combined_ds_shift(
            layout, ss, dz_a, ds_a, sigma_mu, z
        )
        comb_rhs = (
            (1.0 - sigma) * res.rx,
            affine_rhs[1] + shift,
            (1.0 - sigma) * res.rz,
            (1.0 - sigma) * res.rtau,
            -sigma_mu + dtau_a * dkappa_a + tj * kj,
        )
        comb, ok_cb = L.kkt_solve(
            layout, ss, factors, K, Pj, qj, Aj, bj, x2, z2,
            comb_rhs, variables, st_settings, is_combined=True,
        )
        alpha = L.calc_step_length(
            layout, ss, comb, variables, st_settings,
            is_combined=True, scaling=L.SCALING_PRIMAL_DUAL,
        )
        fins = [jnp.all(jnp.isfinite(v)) for v in
                (aff[0], aff[1], aff[2], aff[3], aff[4],
                 shift, comb[0], comb[1], comb[2], comb[3], comb[4])]
        return (alpha_aff, sigma, alpha, jnp.stack(fins),
                jnp.stack([jnp.max(jnp.abs(v)) for v in aff]),
                jnp.stack([jnp.max(jnp.abs(v)) for v in comb]))

    f = lambda v: jnp.asarray(v, dtype)
    args = (f(P_eq), f(q_eq), f(A_eq), f(b_eq), f(x_eq), f(s_eq), f(z_eq),
            f(tau), f(kappa))
    with jax.default_matmul_precision("highest"):
        if vmap_b == 0:
            out = jax.jit(one)(*args)
        else:
            argsb = jax.tree.map(
                lambda v: jnp.broadcast_to(v, (vmap_b,) + v.shape), args
            )
            out = jax.tree.map(lambda t: t[0], jax.jit(jax.vmap(one))(*argsb))
    aa, sg, al, fins, affmax, combmax = [np.asarray(v) for v in out]
    print(f"vmap_b={vmap_b}: alpha_aff={aa:.4f} sigma={sg:.3e} "
          f"alpha={al:.4f}")
    print("  finite flags (dx ds dz dt dk | shift | cdx cds cdz cdt cdk):",
          fins.astype(int))
    print("  aff maxabs:", affmax, "\n  comb maxabs:", combmax)
for vb in (0, 4):
    full_step_probe(vb)


def dtau_pieces_probe():
    dtype = jnp.float32
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    f = lambda v: jnp.asarray(v, dtype)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        ss, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx, cone_ops.affine_ds(layout, ss, s), res.rz, res.rtau,
            tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, ss, affine_rhs, variables, is_combined=False
        )
        factors, K, _ = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, ss
        )
        sol_c, _ = L.solve_kkt_refined(factors, K, rhs_const, st_settings,
                                       want_lo=True)
        sol_a, _ = L.solve_kkt_refined(factors, K, rhs_aff, st_settings,
                                       want_lo=True)
    for nm, v in (("sol_c_hi", sol_c[0]), ("sol_c_lo", sol_c[1]),
                  ("sol_a_hi", sol_a[0]), ("sol_a_lo", sol_a[1]),
                  ("rhs_aff", rhs_aff)):
        a = np.asarray(v, np.float64)
        print(f"{nm}: maxabs {np.abs(a).max():.3e} finite {np.isfinite(a).all()}")
dtau_pieces_probe()


def df_lu_stage_probe():
    dtype = jnp.float32
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    f = lambda v: jnp.asarray(v, dtype)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    from clarabel_tpu.kkt import df_ldl, dense as kkt_dense
    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        ss, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        from clarabel_tpu.cones import ops as co
        Hs, Hs_lo = co.hs_dense(layout, ss, dtype, want_lo=True)
        K, K_reg = kkt_dense.assemble(Pj, Aj, Hs, st_settings)
        K_lo = (jnp.zeros_like(K).at[nn:, nn:].set(-Hs_lo)
                if Hs_lo is not None else None)
        fac, ok = df_ldl.factor(K_reg, K_lo)
        Ah, Al, perm_, sc = fac
        print("factor ok:", bool(ok), " Ah finite:",
              bool(jnp.all(jnp.isfinite(Ah))), " maxabs Ah:",
              float(jnp.max(jnp.abs(Ah))))
        print("diag U maxabs/minabs:",
              float(jnp.max(jnp.abs(jnp.diagonal(Ah)))),
              float(jnp.min(jnp.abs(jnp.diagonal(Ah)))))
        rhs = jnp.concatenate([-qj, bj])
        xsol = df_ldl.solve(fac, rhs)
        print("solve finite:", bool(jnp.all(jnp.isfinite(xsol))),
              " maxabs:", float(jnp.max(jnp.abs(xsol))))
        print("Hs finite:", bool(jnp.all(jnp.isfinite(Hs))),
              "maxabs Hs:", float(jnp.max(jnp.abs(Hs))))
df_lu_stage_probe()


def scaling_probe():
    dtype = jnp.float32
    f = lambda v: jnp.asarray(v, dtype)
    s_, z_ = f(s_eq), f(z_eq)
    from clarabel_tpu.cones import psd as _psd
    b0 = layout.psd_buckets[0]
    sl = layout.slice_of(api.PSD)
    S = _psd._to_mat(b0, s_[sl][b0.gather])
    Z = _psd._to_mat(b0, z_[sl][b0.gather])
    L1 = jnp.linalg.cholesky(S)
    L2 = jnp.linalg.cholesky(Z)
    print("L1 finite:", bool(jnp.all(jnp.isfinite(L1))),
          "L2 finite:", bool(jnp.all(jnp.isfinite(L2))))
    print("eigh S (f32):", np.asarray(jnp.linalg.eigvalsh(S)))
    print("eigh Z (f32):", np.asarray(jnp.linalg.eigvalsh(Z)))
scaling_probe()
