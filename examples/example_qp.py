"""Basic QP (mirrors the reference's examples/rust/example_qp.rs)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import clarabel_tpu as ct


def main():
    P = np.array([[6.0, 0.0], [0.0, 4.0]])
    q = np.array([-1.0, -4.0])

    A = np.array(
        [
            [1.0, -2.0],   # x1 - 2 x2 == 2   (zero cone)
            [1.0, 0.0],    # x1 <= 2
            [0.0, 1.0],    # x2 <= 2
            [-1.0, 0.0],   # -x1 <= -1  ->  x1 >= 1 ... example bounds
            [0.0, -1.0],
        ]
    )
    b = np.array([2.0, 2.0, 2.0, 2.0, 2.0])
    cones = [ct.ZeroConeT(1), ct.NonnegativeConeT(4)]

    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings.for_float32(verbose=True))
    sol = solver.solve()
    print("status:", sol.status)
    print("x =", sol.x)
    print("objective:", sol.obj_val)


if __name__ == "__main__":
    main()
