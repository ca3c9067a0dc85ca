"""Model-predictive control with the batched sparse solver.

A fleet of double-integrator plants tracks per-plant setpoints.  Every
plant's condensed QP has the SAME sparsity (block-banded dynamics
equalities + input/state box constraints); only values differ — exactly
``SparseBatchSolver``'s contract.  The receding-horizon loop re-solves the
whole fleet per step, warm-started from the previous solution, with RHS
updates only (`update_values(q=..., b=...)`).

Run:  python examples/example_mpc.py
"""

import pathlib
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import clarabel_tpu as ct  # noqa: E402
from clarabel_tpu.statuses import SolverStatus  # noqa: E402

OK_STATES = (SolverStatus.Solved, SolverStatus.AlmostSolved)

T = 20          # horizon
DT = 0.1
NX, NU = 2, 1   # state [pos, vel], input [accel]


def build_template():
    """Sparsity-fixed condensed MPC QP over z = [x_1..x_T, u_0..u_{T-1}].

    min  Σ ||x_t - x_ref||²_Q + ||u_t||²_R
    s.t. x_{t+1} = A x_t + B u_t   (zero cones)
         |u_t| <= u_max, |vel| <= v_max   (nonnegative cones)
    """
    Ad = np.array([[1.0, DT], [0.0, 1.0]])
    Bd = np.array([[0.5 * DT * DT], [DT]])

    nz = T * NX + T * NU
    Q = np.array([10.0, 1.0])
    R = 0.1

    P = sp.diags(
        np.concatenate([np.tile(Q, T), np.full(T * NU, R)]), format="csc"
    )

    # dynamics rows: x_{t+1} - A x_t - B u_t = 0
    rows, cols, vals = [], [], []
    for t in range(T):
        for i in range(NX):
            r = t * NX + i
            rows.append(r); cols.append(t * NX + i); vals.append(1.0)
            if t > 0:
                for j in range(NX):
                    if Ad[i, j] != 0.0:
                        rows.append(r); cols.append((t - 1) * NX + j)
                        vals.append(-Ad[i, j])
            if Bd[i, 0] != 0.0:
                rows.append(r); cols.append(T * NX + t * NU)
                vals.append(-Bd[i, 0])
    A_dyn = sp.csc_matrix((vals, (rows, cols)), shape=(T * NX, nz))

    # box rows: u <= u_max, -u <= u_max, vel <= v_max, -vel <= v_max
    sel_u = sp.csc_matrix(
        (np.ones(T * NU), (np.arange(T * NU), T * NX + np.arange(T * NU))),
        shape=(T * NU, nz),
    )
    sel_v = sp.csc_matrix(
        (np.ones(T), (np.arange(T), NX * np.arange(T) + 1)), shape=(T, nz)
    )
    A = sp.vstack([A_dyn, sel_u, -sel_u, sel_v, -sel_v], format="csc")
    m_eq = T * NX
    m_in = 2 * T * NU + 2 * T
    cones = [ct.ZeroConeT(m_eq), ct.NonnegativeConeT(m_in)]
    return P, A, Ad, Bd, cones, m_eq, m_in, nz


def rhs_for(x0, x_ref, Ad, m_in, nz):
    """(q, b) for initial state x0 and tracked setpoint x_ref."""
    Q = np.array([10.0, 1.0])
    q = np.zeros(nz)
    for t in range(T):
        q[t * NX : t * NX + NX] = -Q * x_ref
    b_eq = np.zeros(T * NX)
    b_eq[:NX] = Ad @ x0  # x_1 = A x_0 + B u_0
    u_max, v_max = 2.0, 3.0
    b_in = np.concatenate(
        [np.full(T * NU, u_max), np.full(T * NU, u_max),
         np.full(T, v_max), np.full(T, v_max)]
    )
    return q, np.concatenate([b_eq, b_in])


def main():
    rng = np.random.default_rng(0)
    B = 16  # fleet size
    P, A, Ad, Bd, cones, m_eq, m_in, nz = build_template()

    x = rng.uniform(-1.5, 1.5, (B, NX))          # plant states
    x_ref = rng.uniform(-1.0, 1.0, (B,))          # position setpoints

    qs, bs = zip(*[
        rhs_for(x[i], np.array([x_ref[i], 0.0]), Ad, m_in, nz)
        for i in range(B)
    ])
    solver = ct.SparseBatchSolver(
        P, np.stack(qs), A, np.stack(bs), cones,
        ct.DefaultSettings.for_float32(
            direct_solve_method="multifrontal", verbose=False
        ),
    )
    print(f"fleet={B} horizon={T} nz={nz} "
          f"nnzL={solver.plan.nnzL} levels={len(solver.plan.levels)}")

    sol = None
    for step in range(12):
        sol = solver.solve(warm_start=sol)
        assert all(s in OK_STATES for s in sol.statuses())
        # apply first input, simulate plants forward
        u0 = sol.x[:, T * NX]
        x = x @ Ad.T + np.outer(u0, Bd[:, 0])
        qs, bs = zip(*[
            rhs_for(x[i], np.array([x_ref[i], 0.0]), Ad, m_in, nz)
            for i in range(B)
        ])
        solver.update_values(q=np.stack(qs), b=np.stack(bs))
        err = np.abs(x[:, 0] - x_ref).mean()
        print(f"step {step}: mean |pos - ref| = {err:.4f}, "
              f"iters = {sol.iterations.tolist()[:6]}...")


if __name__ == "__main__":
    main()
