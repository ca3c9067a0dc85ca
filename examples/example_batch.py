"""Batched scenario solves — the TPU throughput path.

Solves a batch of random strictly convex QPs in one vmapped, mesh-sharded
computation.  This is the workload class (MPC / scenario optimization /
portfolio sweeps) where the TPU design shines: thousands of IPM solves per
second on one chip.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import clarabel_tpu as ct


def main():
    B, n = 256, 16
    rng = np.random.default_rng(0)
    M = rng.normal(size=(B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(n)
    q = rng.normal(size=(B, n))
    A = np.tile(np.vstack([np.eye(n), -np.eye(n)]), (B, 1, 1))
    b = np.ones((B, 2 * n))
    cones = [ct.NonnegativeConeT(2 * n)]

    settings = ct.DefaultSettings.for_float32(verbose=False)
    batch = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32")
    sol = batch.solve()

    solved = sum(1 for s in sol.statuses() if s == ct.SolverStatus.Solved)
    print(f"solved {solved}/{B} in {sol.solve_time*1e3:.1f} ms "
          f"({B/sol.solve_time:.0f} problems/s)")


if __name__ == "__main__":
    main()
