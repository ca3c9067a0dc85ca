"""Direction-quality A/B for a straggler SDP lane: stop the f32 solve at
iteration K, rebuild the equilibrated iterate, then compute ONE
predictor-corrector direction with the package's own internals in BOTH
f32 and f64.  If the f64 direction from the same iterate restores a ~0.9
step, the f32 direction computation is the fault; if both steps are tiny,
the iterate itself has drifted off the central path."""
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

LANE = int(sys.argv[1]) if len(sys.argv) > 1 else 58
STOP = int(sys.argv[2]) if len(sys.argv) > 2 else 5

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

s1 = ct.DefaultSolver(P[LANE], q[LANE], A[LANE], b[LANE], cones, settings,
                      dtype="float32", device=cpu)
r = s1.solve()
out = s1._last_out if hasattr(s1, "_last_out") else None

raw = s1._raw_out
print("status", r.status, "iters", s1.info.iterations,
      "tau", raw["tau"], "kappa", raw["kappa"])

cones_int = tuple(api.collapse_cones(tuple(cones)))
layout = ConeLayout(cones_int)
perm = layout.perm

d = np.asarray(raw["equil_d"], np.float64)
e = np.asarray(raw["equil_e"], np.float64)  # permuted frame
c_scale = float(raw["equil_c"])
tau = float(raw["tau"]); kappa = float(raw["kappa"])

# equilibrated internal iterate (invert solution unscaling at this tau)
x_eq = np.asarray(raw["x"], np.float64) * tau / d
z_eq = np.asarray(raw["z"], np.float64)[perm] * tau * c_scale / e
s_eq = np.asarray(raw["s"], np.float64)[perm] * tau * e

# equilibrated problem data (f64 master copies)
P1 = P[LANE]; q1 = q[LANE]; A1 = A[LANE][perm, :]; b1 = b[LANE][perm]
P_eq = c_scale * (d[:, None] * ((np.triu(P1) + np.triu(P1, 1).T)) * d[None, :])
q_eq = c_scale * d * q1
A_eq = e[:, None] * A1 * d[None, :]
b_eq = e * b1

nn = P1.shape[0]


def one_iteration(dtype_name):
    dtype = jnp.dtype(dtype_name)
    f = lambda v: jnp.asarray(v, dtype)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)

    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        scaling_state, ok_scale = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        factors, K, ok_f = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, scaling_state
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx,
            cone_ops.affine_ds(layout, scaling_state, s),
            res.rz,
            res.rtau,
            tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, scaling_state, affine_rhs, variables, is_combined=False
        )
        sol_c, ok_c = L.solve_kkt_refined(
            factors, K, rhs_const, st_settings, want_lo=True
        )
        sol_a, ok_a = L.solve_kkt_refined(
            factors, K, rhs_aff, st_settings, want_lo=True
        )
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
        sigma = (1.0 - alpha_aff) ** 3
        dx_a, ds_a, dz_a, dtau_a, dkappa_a = aff
        sigma_mu = sigma * mu
        shift = cone_ops.combined_ds_shift(
            layout, scaling_state, dz_a, ds_a, sigma_mu, z
        )
        comb_rhs = (
            (1.0 - sigma) * res.rx,
            affine_rhs[1] + shift,
            (1.0 - sigma) * res.rz,
            (1.0 - sigma) * res.rtau,
            -sigma_mu + dtau_a * dkappa_a + tj * kj,
        )
        comb, ok_cb = L.kkt_solve(
            layout, scaling_state, factors, K, Pj, qj, Aj, bj, x2, z2,
            comb_rhs, variables, st_settings, is_combined=True,
        )
        alpha = L.calc_step_length(
            layout, scaling_state, comb, variables, st_settings,
            is_combined=True, scaling=L.SCALING_PRIMAL_DUAL,
        )
    return dict(
        mu=float(mu), alpha_aff=float(alpha_aff), sigma=float(sigma),
        alpha=float(alpha),
        aff=[np.asarray(v, np.float64) for v in aff],
        comb=[np.asarray(v, np.float64) for v in comb],
        ok=[bool(ok_scale), bool(ok_f), bool(ok_c), bool(ok_a), bool(ok_cb)],
    )


r32 = one_iteration("float32")
r64 = one_iteration("float64")
print(f"mu={r64['mu']:.3e}")
print(f"f32: alpha_aff={r32['alpha_aff']:.4f} sigma={r32['sigma']:.2e} "
      f"alpha={r32['alpha']:.4f} ok={r32['ok']}")
print(f"f64: alpha_aff={r64['alpha_aff']:.4f} sigma={r64['sigma']:.2e} "
      f"alpha={r64['alpha']:.4f} ok={r64['ok']}")
names = ["dx", "ds", "dz", "dtau", "dkappa"]
for nm, a32, a64 in zip(names, r32["comb"], r64["comb"]):
    den = max(np.max(np.abs(a64)), 1e-30)
    err = np.max(np.abs(a32 - a64)) / den
    print(f"comb {nm}: rel err {err:.2e} (scale {den:.2e})")
for nm, a32, a64 in zip(names, r32["aff"], r64["aff"]):
    den = max(np.max(np.abs(a64)), 1e-30)
    err = np.max(np.abs(a32 - a64)) / den
    print(f"aff  {nm}: rel err {err:.2e} (scale {den:.2e})")


# ---------------------------------------------------------------------------
# stage bisection: run the pipeline in f64 but with ONE stage at f32
def hybrid_iteration(stage32):
    """stage32 in {"scaling", "kkt", "finish", "rhs"}: that stage runs in
    f32 (casting its inputs down and its outputs back up); all else f64."""
    dtype = jnp.dtype(np.float64)
    f32 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), t)
    f64 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), t)
    f = lambda v: jnp.asarray(v, dtype)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)

    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        if stage32 == "scaling":
            ss32, ok_scale = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, jnp.float32),
                *f32((s, z, mu)), L.SCALING_PRIMAL_DUAL,
            )
            scaling_state = f64(ss32)
        else:
            scaling_state, ok_scale = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, dtype),
                s, z, mu, L.SCALING_PRIMAL_DUAL,
            )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx,
            cone_ops.affine_ds(layout, scaling_state, s),
            res.rz,
            res.rtau,
            tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, scaling_state, affine_rhs, variables, is_combined=False
        )
        if stage32 == "kkt":
            factors, K, ok_f = L._kkt_prepare(
                layout, st_settings, jnp.float32, nn, False,
                *f32((Pj, Aj)), f32(scaling_state)
            )
            sol_c, ok_c = L.solve_kkt_refined(
                factors, K, f32(rhs_const), st_settings, want_lo=True
            )
            sol_a, ok_a = L.solve_kkt_refined(
                factors, K, f32(rhs_aff), st_settings, want_lo=True
            )
            sol_c, sol_a = f64(sol_c), f64(sol_a)
        else:
            factors, K, ok_f = L._kkt_prepare(
                layout, st_settings, dtype, nn, False, Pj, Aj, scaling_state
            )
            sol_c, ok_c = L.solve_kkt_refined(
                factors, K, rhs_const, st_settings, want_lo=True
            )
            sol_a, ok_a = L.solve_kkt_refined(
                factors, K, rhs_aff, st_settings, want_lo=True
            )
        if isinstance(sol_c, tuple):
            (c_hi, c_lo) = sol_c
            x2 = (c_hi[:nn], None if c_lo is None else c_lo[:nn])
            z2 = (c_hi[nn:], None if c_lo is None else c_lo[nn:])
        else:
            x2, z2 = sol_c[:nn], sol_c[nn:]
        if stage32 == "finish":
            aff = L.kkt_solve_finish(
                layout, f32(scaling_state), *f32((Pj, qj, Aj, bj)),
                f32(x2), f32(z2), f32(sol_a), f32(dsc_aff),
                f32(affine_rhs), f32(variables), K_true=None,
            )
            aff = f64(aff)
        else:
            aff = L.kkt_solve_finish(
                layout, scaling_state, Pj, qj, Aj, bj, x2, z2, sol_a,
                dsc_aff, affine_rhs, variables, K_true=K,
            )
        alpha_aff = L.calc_step_length(
            layout, scaling_state, aff, variables, st_settings,
            is_combined=False, scaling=L.SCALING_PRIMAL_DUAL,
        )
    return float(alpha_aff)


for stage in ("scaling", "kkt", "finish"):
    try:
        a = hybrid_iteration(stage)
        print(f"hybrid f32-{stage}: alpha_aff={a:.4f}  "
              f"(pure f64 {r64['alpha_aff']:.4f}, pure f32 {r32['alpha_aff']:.4f})")
    except Exception as ex:
        print(f"hybrid f32-{stage}: FAILED {type(ex).__name__}: {ex}")


def hybrid2(stage32):
    """More stages: "rhs" = residuals+affine_rhs+reduced-rhs at f32;
    "steplen" = step-length evaluation at f32 on the f64 direction;
    "xeval32" = f32 direction evaluated by f64 step length."""
    f32 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), t)
    f64 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), t)
    f = lambda v: jnp.asarray(v, jnp.float64)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)

    with jax.default_matmul_precision("highest"):
        if stage32 == "xeval32":
            # f32 direction, f64 step-length machinery
            ss64, _ = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, jnp.float64),
                s, z, None, L.SCALING_PRIMAL_DUAL,
            ) if False else (None, None)
            res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
            mu = L.calc_mu(layout, res, tj, kj)
            scaling_state, _ = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, jnp.float64),
                s, z, mu, L.SCALING_PRIMAL_DUAL,
            )
            aff = f64(r32["aff"])
            a = L.calc_step_length(
                layout, scaling_state, tuple(aff), (x, s, z, tj, kj),
                st_settings, is_combined=False,
                scaling=L.SCALING_PRIMAL_DUAL,
            )
            return float(a)
        res64 = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu64 = L.calc_mu(layout, res64, tj, kj)
        scaling_state, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, jnp.float64),
            s, z, mu64, L.SCALING_PRIMAL_DUAL,
        )
        if stage32 == "rhs":
            res32 = L.compute_residuals(*f32((Pj, qj, Aj, bj, x, s, z, tj, kj)))
            ss32 = f32(scaling_state)
            affine_rhs = f64((
                res32.rx,
                cone_ops.affine_ds(layout, ss32, f32(s)),
                res32.rz,
                res32.rtau,
                f32(tj) * f32(kj),
            ))
            rhs_aff, dsc_aff = L.kkt_solve_rhs(
                layout, ss32, f32(affine_rhs), f32((x, s, z, tj, kj)),
                is_combined=False,
            )
            rhs_aff, dsc_aff = f64(rhs_aff), f64(dsc_aff)
        else:
            affine_rhs = (
                res64.rx,
                cone_ops.affine_ds(layout, scaling_state, s),
                res64.rz,
                res64.rtau,
                tj * kj,
            )
            rhs_aff, dsc_aff = L.kkt_solve_rhs(
                layout, scaling_state, affine_rhs, (x, s, z, tj, kj),
                is_combined=False,
            )
        rhs_const = jnp.concatenate([-qj, bj])
        factors, K, ok_f = L._kkt_prepare(
            layout, st_settings, jnp.float64, nn, False, Pj, Aj, scaling_state
        )
        sol_c, _ = L.solve_kkt_refined(factors, K, rhs_const, st_settings,
                                       want_lo=True)
        sol_a, _ = L.solve_kkt_refined(factors, K, rhs_aff, st_settings,
                                       want_lo=True)
        if isinstance(sol_c, tuple):
            (c_hi, c_lo) = sol_c
            x2 = (c_hi[:nn], None if c_lo is None else c_lo[:nn])
            z2 = (c_hi[nn:], None if c_lo is None else c_lo[nn:])
        else:
            x2, z2 = sol_c[:nn], sol_c[nn:]
        aff = L.kkt_solve_finish(
            layout, scaling_state, Pj, qj, Aj, bj, x2, z2, sol_a, dsc_aff,
            affine_rhs, (x, s, z, tj, kj), K_true=K,
        )
        if stage32 == "steplen":
            a = L.calc_step_length(
                layout, f32(scaling_state), f32(aff), f32((x, s, z, tj, kj)),
                st_settings, is_combined=False, scaling=L.SCALING_PRIMAL_DUAL,
            )
        else:
            a = L.calc_step_length(
                layout, scaling_state, aff, (x, s, z, tj, kj),
                st_settings, is_combined=False, scaling=L.SCALING_PRIMAL_DUAL,
            )
    return float(a)


for stage in ("rhs", "steplen", "xeval32"):
    try:
        a = hybrid2(stage)
        print(f"hybrid2 {stage}: alpha_aff={a:.4f}")
    except Exception as ex:
        import traceback; traceback.print_exc()
        print(f"hybrid2 {stage}: FAILED {type(ex).__name__}: {ex}")


def hybrid3(stage64):
    """All-f32 pipeline except ONE stage at f64 (complement bisection):
    which f64 stage RESCUES the step?"""
    f32 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), t)
    f64 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), t)
    g = lambda v: jnp.asarray(v, jnp.float32)
    Pj, qj, Aj, bj = g(P_eq), g(q_eq), g(A_eq), g(b_eq)
    x, s, z = g(x_eq), g(s_eq), g(z_eq)
    tj, kj = g(tau), g(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    P64, q64, A64, b64 = (jnp.asarray(v) for v in (P_eq, q_eq, A_eq, b_eq))
    x64v, s64v, z64v = (jnp.asarray(v) for v in (x_eq, s_eq, z_eq))
    t64, k64 = jnp.asarray(tau), jnp.asarray(kappa)

    with jax.default_matmul_precision("highest"):
        if stage64 == "rhs":
            res = L.compute_residuals(P64, q64, A64, b64, x64v, s64v, z64v,
                                      t64, k64)
        else:
            res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, f32(res), tj, kj)
        if stage64 == "scaling":
            ss, ok_scale = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, jnp.float64),
                s64v, z64v, f64(mu), L.SCALING_PRIMAL_DUAL,
            )
            scaling_state = f32(ss)
        else:
            scaling_state, ok_scale = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, jnp.float32),
                s, z, mu, L.SCALING_PRIMAL_DUAL,
            )
        variables = (x, s, z, tj, kj)
        affine_rhs = f32((
            res.rx,
            cone_ops.affine_ds(layout, scaling_state, s),
            res.rz,
            res.rtau,
            tj * kj,
        ))
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, scaling_state, affine_rhs, variables, is_combined=False
        )
        if stage64 == "kkt":
            factors, K, _ = L._kkt_prepare(
                layout, st_settings, jnp.float64, nn, False, P64, A64,
                f64(scaling_state)
            )
            sol_c, _ = L.solve_kkt_refined(factors, K, f64(rhs_const),
                                           st_settings, want_lo=True)
            sol_a, _ = L.solve_kkt_refined(factors, K, f64(rhs_aff),
                                           st_settings, want_lo=True)
            sol_c, sol_a = f32(sol_c), f32(sol_a)
        else:
            factors, K, _ = L._kkt_prepare(
                layout, st_settings, jnp.float32, nn, False, Pj, Aj,
                scaling_state
            )
            sol_c, _ = L.solve_kkt_refined(factors, K, rhs_const,
                                           st_settings, want_lo=True)
            sol_a, _ = L.solve_kkt_refined(factors, K, rhs_aff,
                                           st_settings, want_lo=True)
        if isinstance(sol_c, tuple):
            (c_hi, c_lo) = sol_c
            x2 = (c_hi[:nn], None if c_lo is None else c_lo[:nn])
            z2 = (c_hi[nn:], None if c_lo is None else c_lo[nn:])
        else:
            x2, z2 = sol_c[:nn], sol_c[nn:]
        if stage64 == "finish":
            aff = L.kkt_solve_finish(
                layout, f64(scaling_state), P64, q64, A64, b64,
                f64(x2), f64(z2), f64(sol_a), f64(dsc_aff),
                f64(affine_rhs), f64(variables), K_true=None,
            )
            aff = f32(aff)
        else:
            aff = L.kkt_solve_finish(
                layout, scaling_state, Pj, qj, Aj, bj, x2, z2, sol_a,
                dsc_aff, affine_rhs, variables, K_true=K,
            )
        a = L.calc_step_length(
            layout, scaling_state, aff, variables, st_settings,
            is_combined=False, scaling=L.SCALING_PRIMAL_DUAL,
        )
    return float(a)


for stage in ("rhs", "scaling", "kkt", "finish"):
    try:
        a = hybrid3(stage)
        print(f"hybrid3 f64-{stage}: alpha_aff={a:.4f}")
    except Exception as ex:
        import traceback; traceback.print_exc()
        print(f"hybrid3 f64-{stage}: FAILED {type(ex).__name__}: {ex}")


def kkt_accuracy_probe():
    """All-f32 context: how accurate is solve_kkt_refined really?"""
    f32 = lambda t: jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), t)
    g = lambda v: jnp.asarray(v, jnp.float32)
    Pj, qj, Aj, bj = g(P_eq), g(q_eq), g(A_eq), g(b_eq)
    x, s, z = g(x_eq), g(s_eq), g(z_eq)
    tj, kj = g(tau), g(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        scaling_state, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, jnp.float32),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx,
            cone_ops.affine_ds(layout, scaling_state, s),
            res.rz,
            res.rtau,
            tj * kj,
        )
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, scaling_state, affine_rhs, variables, is_combined=False
        )
        factors, K, _ = L._kkt_prepare(
            layout, st_settings, jnp.float32, nn, False, Pj, Aj, scaling_state
        )
        sol_a, ok = L.solve_kkt_refined(factors, K, rhs_aff, st_settings,
                                        want_lo=True)
    if isinstance(K, tuple):
        K_hi, K_lo = np.asarray(K[0], np.float64), np.asarray(K[1], np.float64)
        Kfull = K_hi + K_lo
    else:
        Kfull = np.asarray(K, np.float64)
    rhs64 = np.asarray(rhs_aff, np.float64)
    exact = np.linalg.solve(Kfull, rhs64)
    if isinstance(sol_a, tuple):
        hi, lo = sol_a
        got = np.asarray(hi, np.float64) + (
            0 if lo is None else np.asarray(lo, np.float64)
        )
    else:
        got = np.asarray(sol_a, np.float64)
    err = np.linalg.norm(got - exact) / max(np.linalg.norm(exact), 1e-30)
    resid = np.linalg.norm(Kfull @ got - rhs64) / max(
        np.linalg.norm(rhs64), 1e-30
    )
    print(f"kkt probe: ok={bool(ok)} rel_sol_err={err:.2e} "
          f"rel_resid={resid:.2e} cond(K)~{np.linalg.cond(Kfull):.2e}")
    # where is the error largest?
    ae = np.abs(got - exact)
    print("  worst idx:", np.argsort(ae)[-6:], " n =", nn,
          " (>=n are z-rows)")
    print("  |err| top:", np.sort(ae)[-6:])
    print("  |exact| at those:", exact[np.argsort(ae)[-6:]])
kkt_accuracy_probe()


def cond_probe():
    g = lambda v: jnp.asarray(v, jnp.float32)
    Pj, qj, Aj, bj = g(P_eq), g(q_eq), g(A_eq), g(b_eq)
    x, s, z = g(x_eq), g(s_eq), g(z_eq)
    tj, kj = g(tau), g(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        scaling_state, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, jnp.float32),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        factors, K, _ = L._kkt_prepare(
            layout, st_settings, jnp.float32, nn, False, Pj, Aj, scaling_state
        )
    K_hi, K_lo = (K if isinstance(K, tuple) else (K, None))
    Kf = np.asarray(K_hi, np.float64) + (
        0 if K_lo is None else np.asarray(K_lo, np.float64)
    )
    diag = np.abs(np.diag(Kf))
    dsc = 1.0 / np.sqrt(np.maximum(diag, 1e-30))
    Ks = Kf * dsc[:, None] * dsc[None, :]
    print(f"cond raw K: {np.linalg.cond(Kf):.3e}   "
          f"cond Jacobi-scaled: {np.linalg.cond(Ks):.3e}")
cond_probe()


def trace_intermediates():
    """Mirror one_iteration in both dtypes and diff every intermediate."""
    out = {}
    for name in ("f32", "f64"):
        dtype = jnp.float32 if name == "f32" else jnp.float64
        f = lambda v: jnp.asarray(v, dtype)
        Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
        x, s, z = f(x_eq), f(s_eq), f(z_eq)
        tj, kj = f(tau), f(kappa)
        st_settings = ct.DefaultSettings.for_float32(verbose=False)
        with jax.default_matmul_precision("highest"):
            res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
            mu = L.calc_mu(layout, res, tj, kj)
            scaling_state, _ = cone_ops.update_scaling(
                layout, cone_ops.set_identity_scaling(layout, dtype),
                s, z, mu, L.SCALING_PRIMAL_DUAL,
            )
            variables = (x, s, z, tj, kj)
            affine_rhs = (
                res.rx,
                cone_ops.affine_ds(layout, scaling_state, s),
                res.rz,
                res.rtau,
                tj * kj,
            )
            rhs_const = jnp.concatenate([-qj, bj])
            rhs_aff, dsc_aff = L.kkt_solve_rhs(
                layout, scaling_state, affine_rhs, variables,
                is_combined=False,
            )
            factors, K, _ = L._kkt_prepare(
                layout, st_settings, dtype, nn, False, Pj, Aj, scaling_state
            )
            sol_c, _ = L.solve_kkt_refined(factors, K, rhs_const,
                                           st_settings, want_lo=True)
            sol_a, _ = L.solve_kkt_refined(factors, K, rhs_aff,
                                           st_settings, want_lo=True)
            if isinstance(sol_c, tuple):
                ch_, cl_ = sol_c
                ah_, al_ = sol_a
                solc_full = np.asarray(ch_, np.float64) + (
                    0 if cl_ is None else np.asarray(cl_, np.float64))
                sola_full = np.asarray(ah_, np.float64) + (
                    0 if al_ is None else np.asarray(al_, np.float64))
                x2 = (ch_[:nn], None if cl_ is None else cl_[:nn])
                z2 = (ch_[nn:], None if cl_ is None else cl_[nn:])
            else:
                solc_full = np.asarray(sol_c, np.float64)
                sola_full = np.asarray(sol_a, np.float64)
                x2, z2 = sol_c[:nn], sol_c[nn:]
            aff = L.kkt_solve_finish(
                layout, scaling_state, Pj, qj, Aj, bj, x2, z2, sol_a,
                dsc_aff, affine_rhs, variables, K_true=K,
            )
        out[name] = dict(
            rhs_aff=np.asarray(rhs_aff, np.float64),
            dsc=np.asarray(dsc_aff, np.float64),
            sol_c=solc_full, sol_a=sola_full,
            aff=[np.asarray(v, np.float64) for v in aff],
            rx=np.asarray(res.rx, np.float64),
            rz=np.asarray(res.rz, np.float64),
            ads=np.asarray(affine_rhs[1], np.float64),
            rtau=float(res.rtau), mu=float(mu),
        )
    a, b_ = out["f32"], out["f64"]
    for key in ("rx", "rz", "ads", "rhs_aff", "dsc", "sol_c", "sol_a"):
        va, vb = a[key], b_[key]
        den = max(np.max(np.abs(vb)), 1e-30)
        print(f"{key}: rel err {np.max(np.abs(va - vb))/den:.2e} "
              f"(scale {den:.2e})")
    print("rtau:", a["rtau"], "vs", b_["rtau"])
    names = ["dx", "ds", "dz", "dtau", "dkappa"]
    for nm, va, vb in zip(names, a["aff"], b_["aff"]):
        den = max(np.max(np.abs(vb)), 1e-30)
        print(f"aff {nm}: rel err {np.max(np.abs(va - vb))/den:.2e} "
              f"(scale {den:.2e})")
trace_intermediates()


def blocking_analysis():
    """For the pure-f32 direction: which component limits the ratio test,
    and how wrong is that component vs the f64 direction?"""
    a32 = [np.asarray(v, np.float64) for v in r32["aff"]]
    a64 = [np.asarray(v, np.float64) for v in r64["aff"]]
    s_ = s_eq; z_ = z_eq
    names = ["dx", "ds", "dz", "dtau", "dkappa"]
    for tag, aa in (("f32", a32), ("f64", a64)):
        dx, ds, dz, dtau, dkappa = aa
        # NN block ratio tests (rows 0..m_nn of the permuted frame;
        # layout: NN first then PSD)
        nnn = 2 * n
        with np.errstate(divide="ignore"):
            as_ = np.where(ds[:nnn] < 0, -s_[:nnn] / ds[:nnn], np.inf)
            az_ = np.where(dz[:nnn] < 0, -z_[:nnn] / dz[:nnn], np.inf)
        i_s, i_z = np.argmin(as_), np.argmin(az_)
        at = -tau / dtau if dtau < 0 else np.inf
        ak = -kappa / dkappa if dkappa < 0 else np.inf
        print(f"{tag}: min alpha_s(NN)={as_[i_s]:.4f}@{i_s} "
              f"(s={s_[i_s]:.2e}, ds={aa[1][i_s]:.2e}) "
              f"min alpha_z(NN)={az_[i_z]:.4f}@{i_z} "
              f"(z={z_[i_z]:.2e}, dz={aa[2][i_z]:.2e}) "
              f"alpha_tau={at:.4f} alpha_kappa={ak:.4f}")
    # per-component f32 error on the blocking rows
    ds32, ds64 = a32[1], a64[1]
    dz32, dz64 = a32[2], a64[2]
    nnn = 2 * n
    sml = s_[:nnn] < 1e-3
    print("active NN rows (s small):", np.sum(sml))
    print("  ds err on active rows:",
          np.max(np.abs(ds32[:nnn][sml] - ds64[:nnn][sml])),
          " typical s there:", np.median(s_[:nnn][sml]))
    print("  dz err on active rows:",
          np.max(np.abs(dz32[:nnn][sml] - dz64[:nnn][sml])))
    big = ~sml
    print("  ds err on inactive rows:",
          np.max(np.abs(ds32[:nnn][big] - ds64[:nnn][big])),
          " typical z there:", np.median(z_[:nnn][big]))
    print("  dz err on inactive rows:",
          np.max(np.abs(dz32[:nnn][big] - dz64[:nnn][big])))
blocking_analysis()


def psd_blocking():
    """PSD-block step length: eigen ratio test on both directions."""
    nnn = 2 * n
    tri_ = tri

    def unsvec(v):
        # column-wise upper-tri svec (reference convention)
        Mx = np.zeros((dmat, dmat))
        rt2 = np.sqrt(2.0)
        k_ = 0
        for j in range(dmat):
            for i in range(j + 1):
                if i == j:
                    Mx[i, i] = v[k_]
                else:
                    Mx[i, j] = Mx[j, i] = v[k_] / rt2
                k_ += 1
        return Mx

    Sm = unsvec(s_eq[nnn:nnn + tri_])
    Zm = unsvec(z_eq[nnn:nnn + tri_])
    print("eig(S):", np.linalg.eigvalsh(Sm), "\neig(Z):", np.linalg.eigvalsh(Zm))
    for tag, aa in (("f32", r32["aff"]), ("f64", r64["aff"])):
        dS = unsvec(np.asarray(aa[1], np.float64)[nnn:nnn + tri_])
        dZ = unsvec(np.asarray(aa[2], np.float64)[nnn:nnn + tri_])
        # exact max alpha with S + a dS >= 0: min gen-eig of (S, -dS)
        def max_step(M, dM):
            w, V = np.linalg.eigh(M)
            hs = V @ np.diag(1.0 / np.sqrt(np.maximum(w, 1e-30))) @ V.T
            lam = np.linalg.eigvalsh(hs @ dM @ hs)
            lo = lam.min()
            return np.inf if lo >= 0 else -1.0 / lo
        print(f"{tag}: alpha_psd_s={max_step(Sm, dS):.5f} "
              f"alpha_psd_z={max_step(Zm, dZ):.5f}")
psd_blocking()


def psd_ds_error():
    nnn = 2 * n

    def unsvec(v):
        Mx = np.zeros((dmat, dmat)); rt2 = np.sqrt(2.0); k_ = 0
        for j in range(dmat):
            for i in range(j + 1):
                if i == j:
                    Mx[i, i] = v[k_]
                else:
                    Mx[i, j] = Mx[j, i] = v[k_] / rt2
                k_ += 1
        return Mx

    Sm = unsvec(s_eq[nnn:nnn + tri])
    w, V = np.linalg.eigh(Sm)
    ds32 = unsvec(np.asarray(r32["aff"][1], np.float64)[nnn:nnn + tri])
    ds64 = unsvec(np.asarray(r64["aff"][1], np.float64)[nnn:nnn + tri])
    dz32 = unsvec(np.asarray(r32["aff"][2], np.float64)[nnn:nnn + tri])
    dz64 = unsvec(np.asarray(r64["aff"][2], np.float64)[nnn:nnn + tri])
    E = V.T @ (ds32 - ds64) @ V
    Ez = V.T @ (dz32 - dz64) @ V
    D64 = V.T @ ds64 @ V
    print("eig(S):", w)
    print("dS err in S-eigenbasis diag:", np.diag(E))
    print("dS64 in S-eigenbasis diag:", np.diag(D64))
    print("dZ err in S-eigenbasis diag:", np.diag(Ez))
    print("max |dS err|:", np.abs(E).max(), " max |dZ err|:", np.abs(Ez).max())
psd_ds_error()


def ds_piece_bisect():
    """Recompute the PSD ds recovery from the pure-f32 solve outputs with
    each piece (Hs·dz product, ds_const) selectively in f64."""
    nnn = 2 * n
    # rebuild the pure-f32 context to capture sol pieces
    dtype = jnp.float32
    f = lambda v: jnp.asarray(v, dtype)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        ss32, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        variables = (x, s, z, tj, kj)
        affine_rhs = (
            res.rx, cone_ops.affine_ds(layout, ss32, s), res.rz, res.rtau,
            tj * kj,
        )
        rhs_const = jnp.concatenate([-qj, bj])
        rhs_aff, dsc_aff = L.kkt_solve_rhs(
            layout, ss32, affine_rhs, variables, is_combined=False
        )
        factors, K, _ = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, ss32
        )
        sol_c, _ = L.solve_kkt_refined(factors, K, rhs_const, st_settings,
                                       want_lo=True)
        sol_a, _ = L.solve_kkt_refined(factors, K, rhs_aff, st_settings,
                                       want_lo=True)
    (c_hi, c_lo) = sol_c
    (a_hi, a_lo) = sol_a
    # finish internals (mirroring kkt_solve_finish, hi-parts only where
    # noted)
    x2, z2v = c_hi[:nn], c_hi[nn:]
    x1, z1f = a_hi[:nn], a_hi[nn:]
    rx, rs_, rz, rtau_, rkap = affine_rhs
    xi = x / tj
    tau_num = (rtau_ - rkap / tj + qj @ x1 + bj @ z1f + 2.0 * (xi @ (Pj @ x1)))
    xi_m_x2 = xi - x2
    tau_den = (kj / tj - qj @ x2 - bj @ z2v
               + xi_m_x2 @ (Pj @ xi_m_x2) - x2 @ (Pj @ x2))
    dtau = tau_num / tau_den
    dzf64 = (np.asarray(a_hi, np.float64) + np.asarray(a_lo, np.float64))[nn:] \
        + float(dtau) * (np.asarray(c_hi, np.float64)
                         + np.asarray(c_lo, np.float64))[nn:]
    ss64 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), ss32)
    dsc64 = np.asarray(
        cone_ops.affine_ds(layout, ss64, jnp.asarray(s_eq)), np.float64
    )
    dsc32 = np.asarray(rs_, np.float64)  # scaled-frame affine ds constant?
    # NOTE: ds_const for the affine step is dsc_aff from kkt_solve_rhs
    dscA = np.asarray(dsc_aff, np.float64)
    hs64 = np.asarray(
        cone_ops.mul_hs(layout, ss64, jnp.asarray(dzf64)), np.float64
    )
    dz32 = jnp.asarray(dzf64, jnp.float32)
    dzlo32 = jnp.asarray(dzf64 - np.asarray(dz32, np.float64), jnp.float32)
    hs_hi, hs_lo = cone_ops.mul_hs_df(layout, ss32, dz32, dzlo32)
    hs32 = np.asarray(hs_hi, np.float64) + np.asarray(hs_lo, np.float64)

    def unsvec(v):
        Mx = np.zeros((dmat, dmat)); rt2 = np.sqrt(2.0); k_ = 0
        for j in range(dmat):
            for i in range(j + 1):
                if i == j: Mx[i, i] = v[k_]
                else: Mx[i, j] = Mx[j, i] = v[k_] / rt2
                k_ += 1
        return Mx

    Sm = unsvec(s_eq[nnn:nnn + tri])

    def alpha_s(dsvec):
        dS = unsvec(dsvec[nnn:nnn + tri])
        w_, V_ = np.linalg.eigh(Sm)
        hs_ = V_ @ np.diag(1.0/np.sqrt(np.maximum(w_, 1e-30))) @ V_.T
        lam = np.linalg.eigvalsh(hs_ @ dS @ hs_)
        lo = lam.min()
        return np.inf if lo >= 0 else -1.0/lo

    for tag, hsv, dscv in (("hs32+dsc32", hs32, dscA),
                           ("hs64+dsc32", hs64, dscA),
                           ("hs32+dsc64", hs32, dsc64),
                           ("hs64+dsc64", hs64, dsc64)):
        ds = -(hsv + dscv)
        print(f"{tag}: alpha_psd_s={alpha_s(ds):.5f}")
    print("hs32-hs64 max:", np.abs(hs32-hs64).max())
    print("dscA-dsc64 max:", np.abs(dscA-dsc64).max(),
          "  dscA-dsc32(rs) max:", np.abs(dscA-dsc32).max())
ds_piece_bisect()


def skron_probe():
    dtype = jnp.float32
    f = lambda v: jnp.asarray(v, dtype)
    Pj, qj, Aj, bj = f(P_eq), f(q_eq), f(A_eq), f(b_eq)
    x, s, z = f(x_eq), f(s_eq), f(z_eq)
    tj, kj = f(tau), f(kappa)
    st_settings = ct.DefaultSettings.for_float32(verbose=False)
    with jax.default_matmul_precision("highest"):
        res = L.compute_residuals(Pj, qj, Aj, bj, x, s, z, tj, kj)
        mu = L.calc_mu(layout, res, tj, kj)
        ss32, _ = cone_ops.update_scaling(
            layout, cone_ops.set_identity_scaling(layout, dtype),
            s, z, mu, L.SCALING_PRIMAL_DUAL,
        )
        factors, K, _ = L._kkt_prepare(
            layout, st_settings, dtype, nn, False, Pj, Aj, ss32
        )
    from clarabel_tpu.cones import psd as _psd
    b0 = layout.psd_buckets[0]
    R32 = np.asarray(ss32["psd0_R"], np.float64)
    bh, bl = ss32["psd0_skron"]
    sk_pair = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)
    A64 = np.einsum("kij,klj->kil", R32, R32)
    import jax as _jax
    sk64 = np.asarray(_psd._skron(b0, jnp.asarray(A64)), np.float64)
    print("skron pair vs f64-skron(RR^T): max abs diff",
          np.abs(sk_pair - sk64).max(), " scale", np.abs(sk64).max())
    # apply to a vector
    rng2 = np.random.default_rng(1)
    xv = rng2.normal(size=(1, sk64.shape[-1]))
    y64 = np.einsum("kab,kb->ka", sk64, xv)
    from clarabel_tpu.kkt import compensated as dfc
    xq = jnp.asarray(xv, jnp.float32)
    p, e = dfc._two_prod(bh, xq[:, None, :])
    e = e + bl * xq[:, None, :]
    vh, vl = dfc._df_reduce_last(p, e)
    yd = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    print("df matvec vs f64 matvec: max abs diff", np.abs(yd - y64).max(),
          " scale", np.abs(y64).max())
skron_probe()
