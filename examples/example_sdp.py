"""Semidefinite program with chordal decomposition.

Projects a banded matrix onto the PSD cone: the band sparsity makes the
single large PSD cone chordally decomposable into a chain of small clique
cones (solved with batched on-chip linalg).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import clarabel_tpu as ct


def tri_index(i, j):
    return j * (j + 1) // 2 + i


def main():
    n_mat = 10
    tri = n_mat * (n_mat + 1) // 2

    # variables = entries of the band (diagonal + first off-diagonal)
    pattern = [(i, i) for i in range(n_mat)]
    pattern += [(i, i + 1) for i in range(n_mat - 1)]
    nvar = len(pattern)

    A = np.zeros((tri, nvar))
    for k, (i, j) in enumerate(pattern):
        A[tri_index(i, j), k] = -1.0
    b = np.zeros(tri)

    P = np.eye(nvar)
    q = np.array([-1.0 if i == j else 0.3 for (i, j) in pattern])
    cones = [ct.PSDTriangleConeT(n_mat)]

    solver = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings.for_float32(chordal_decomposition_enable=True),
    )
    if solver._chordal is not None:
        ncliques = sum(sp.sntree.n_cliques for sp in solver._chordal.spatterns)
        print(f"decomposed into {ncliques} clique cones")
    sol = solver.solve()
    print("status:", sol.status, " objective:", sol.obj_val)


if __name__ == "__main__":
    main()
