"""Second-order cone program (mirrors examples/rust/example_socp.rs)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import clarabel_tpu as ct


def main():
    # minimize ||x - c||  via  t >= ||x - c||
    n = 3
    c = np.array([1.0, -2.0, 0.5])

    # variables: (t, x); objective: t
    P = np.zeros((n + 1, n + 1))
    q = np.concatenate([[1.0], np.zeros(n)])

    # SOC: (t, x - c) in K_soc  ->  s = [t; x - c]
    A = np.zeros((n + 1, n + 1))
    A[0, 0] = -1.0
    A[1:, 1:] = -np.eye(n)
    b = np.concatenate([[0.0], -c])

    # box constraints |x_i| <= 2
    A2 = np.zeros((2 * n, n + 1))
    A2[:n, 1:] = np.eye(n)
    A2[n:, 1:] = -np.eye(n)
    b2 = 2.0 * np.ones(2 * n)

    A_full = np.vstack([A, A2])
    b_full = np.concatenate([b, b2])
    cones = [ct.SecondOrderConeT(n + 1), ct.NonnegativeConeT(2 * n)]

    solver = ct.DefaultSolver(P, q, A_full, b_full, cones, ct.DefaultSettings.for_float32(verbose=True))
    sol = solver.solve()
    print("status:", sol.status)
    print("t =", sol.x[0], " x =", sol.x[1:])


if __name__ == "__main__":
    main()
