"""Mixed symmetric/asymmetric cone oracle (reference: tests/mixed_conic.rs)."""

import numpy as np

import clarabel_tpu as ct


def test_mixed_conic_feasible():
    n = 3
    P = np.eye(n)
    q = np.ones(n)
    A = np.vstack([np.eye(n)] * 5)
    b = np.zeros(5 * n)
    cones = [
        ct.ZeroConeT(3),
        ct.NonnegativeConeT(3),
        ct.SecondOrderConeT(3),
        ct.PowerConeT(0.5),
        ct.ExponentialConeT(),
    ]

    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(solver.info.cost_primal) <= 1e-8

    # re-solve forcing dual-only scaling via a huge switch threshold
    # (exercises the barrier backtracking path)
    solver2 = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings(verbose=False, min_switch_step_length=0.999),
    )
    sol2 = solver2.solve()
    assert sol2.status == ct.SolverStatus.Solved
    assert abs(solver2.info.cost_primal) <= 1e-8


import itertools
import pytest


def _cone_block(kind, nvars=3):
    """(A_rows, b, conespec) for one feasible cone block over 3 shared
    variables (rows map x into the cone via s = b - Ax)."""
    I = np.eye(3)
    if kind == "nn":
        return I, np.zeros(3), ct.NonnegativeConeT(3)
    if kind == "soc":
        return I, np.zeros(3), ct.SecondOrderConeT(3)
    if kind == "exp":
        return I, np.zeros(3), ct.ExponentialConeT()
    if kind == "pow":
        return I, np.zeros(3), ct.PowerConeT(0.5)
    if kind == "genpow":
        return I, np.zeros(3), ct.GenPowerConeT([0.4, 0.6], 1)
    if kind == "psd":
        # svec(3-vector) -> 2x2 matrix; -x maps into the PSD cone
        return I, np.zeros(3), ct.PSDTriangleConeT(2)
    if kind == "zero":
        return I, np.zeros(3), ct.ZeroConeT(3)
    raise ValueError(kind)


_KINDS = ("zero", "nn", "soc", "exp", "pow", "genpow", "psd")


@pytest.mark.parametrize(
    "pair", list(itertools.combinations(_KINDS, 2)),
    ids=lambda p: f"{p[0]}+{p[1]}",
)
def test_mixed_conic_pairwise(pair):
    """Every cone-kind pair coexists in one composite problem and solves
    (the reference asserts combinations in per-file tests + mixed_conic.rs;
    this is the full pairwise matrix)."""
    P = np.eye(3)
    q = np.ones(3)
    blocks = [_cone_block(k) for k in pair]
    A = np.vstack([blk[0] for blk in blocks])
    b = np.concatenate([blk[1] for blk in blocks])
    cones = [blk[2] for blk in blocks]
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert sol.r_prim < 1e-7 and sol.r_dual < 1e-7
