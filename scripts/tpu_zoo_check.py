"""Full cone-zoo sweep on the real TPU (f32, for_float32 preset).

Every cone class through both the dense LU and the sparse multifrontal
backends; appends results to TPU_CHECKS.log style output on stdout.
Guards the class of TPU-compiler regressions found in round 2 (genpow
scatter lowering crashed the XLA TPU algebraic simplifier) and validates
f32 convergence per class after engine changes.
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

# NB: insert at RUNTIME, not via PYTHONPATH — a PYTHONPATH entry pointing
# at the repo root breaks the axon TPU plugin's entry-point discovery in
# this environment (importlib.metadata trips on the repo's pyproject)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def problems():
    rng = np.random.default_rng(7)
    out = {}

    n = 8
    out["lp"] = (np.zeros((n, n)), -np.ones(n),
                 np.vstack([np.eye(n), -np.eye(n)]),
                 np.concatenate([2 * np.ones(n), np.zeros(n)]),
                 lambda ct: [ct.NonnegativeConeT(2 * n)])

    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    out["qp"] = (P, np.array([1.0, 1.0]), np.vstack([-A1, A1]),
                 np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7]),
                 lambda ct: [ct.NonnegativeConeT(3), ct.NonnegativeConeT(3)])

    d = 6
    q = rng.standard_normal(d)
    out["socp"] = (np.eye(d), q,
                   np.vstack([np.zeros((1, d)), -np.eye(d)]),
                   np.concatenate([[2.0], np.zeros(d)]),
                   lambda ct, d=d: [ct.SecondOrderConeT(d + 1)])

    d = 300  # past the f32 dense-fallback threshold: rank-2 expansion
    qb = rng.standard_normal(d)
    out["soc_big"] = (sp.eye(d, format="csc"), qb,
                      sp.vstack([sp.csc_matrix((1, d)), -sp.eye(d)],
                                format="csc"),
                      np.concatenate([[2.0], np.zeros(d)]),
                      lambda ct, d=d: [ct.SecondOrderConeT(d + 1)])

    out["exp"] = (np.zeros((3, 3)), np.array([-1.0, 0.0, 0.0]),
                  np.vstack([-np.eye(3), [[0, 1, 0], [0, 0, 1]]]),
                  np.array([0, 0, 0, 1.0, np.e]),
                  lambda ct: [ct.ExponentialConeT(), ct.ZeroConeT(2)])

    out["pow"] = (np.zeros((3, 3)), np.array([0.0, 0.0, -1.0]),
                  np.vstack([-np.eye(3), [[1.0, 0, 0], [0, 1.0, 0]]]),
                  np.array([0, 0, 0, 1.0, 1.0]),
                  lambda ct: [ct.PowerConeT(0.6), ct.ZeroConeT(2)])

    out["genpow"] = (np.zeros((4, 4)), np.array([0.0, 0.0, -1.0, 0.0]),
                     np.vstack([-np.eye(4), [[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                                             [0, 0, 0, 1.0]]]),
                     np.array([0, 0, 0, 0, 1.0, 1.0, 0.5]),
                     lambda ct: [ct.GenPowerConeT([0.5, 0.5], 2),
                                 ct.ZeroConeT(3)])

    out["sdp"] = (np.zeros((3, 3)), np.array([1.0, 0.0, 2.0]),
                  np.vstack([np.array([[1.0, 0.0, 1.0]]), -np.eye(3)]),
                  np.array([1.0, 0, 0, 0]),
                  lambda ct: [ct.ZeroConeT(1), ct.PSDTriangleConeT(2)])
    return out


def main():
    import jax
    import clarabel_tpu as ct

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    ok_states = (ct.SolverStatus.Solved, ct.SolverStatus.AlmostSolved)
    failures = 0
    for name, (P, q, A, b, mk) in problems().items():
        line = f"{name:9s}"
        for method in ("lu", "multifrontal"):
            s = ct.DefaultSettings.for_float32(
                direct_solve_method=method, verbose=False
            )
            t0 = time.perf_counter()
            try:
                sol = ct.DefaultSolver(P, q, A, b, mk(ct), s,
                                       dtype="float32", device=dev).solve()
                t = time.perf_counter() - t0
                line += (f" {method}:{sol.status.name}/{sol.obj_val:.5f}"
                         f"/it{sol.iterations}/{t:.1f}s")
                if sol.status not in ok_states:
                    failures += 1
            except Exception as e:  # noqa: BLE001 - report, keep sweeping
                line += f" {method}:EXC({type(e).__name__})"
                failures += 1
        print(line, flush=True)
    print(f"failures: {failures}", flush=True)
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
