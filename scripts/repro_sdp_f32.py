"""Reproduce the bench SDP batch at the f32 preset on CPU; report per-lane
statuses and the convergence scalars of any non-Solved lane."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import clarabel_tpu as ct
from bench import make_batch  # noqa: F401 (import also for parity)
from bench import _svec  # type: ignore

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
S = np.einsum("bik,bk,bjk->bij", Qo[:, :, :k], ls, Qo[:, :, :k])
Z = np.einsum("bik,bk,bjk->bij", Qo[:, :, k:], lz, Qo[:, :, k:])
s_star = np.concatenate([s_nn, _svec(S)], axis=1)
z_star = np.concatenate([z_nn, _svec(Z)], axis=1)

b = np.einsum("bmn,bn->bm", A, x_star) + s_star
q = -(np.einsum("bij,bj->bi", P, x_star) + np.einsum("bmn,bm->bn", A, z_star))

import jax
cpu = jax.devices("cpu")[0]

cones = [ct.NonnegativeConeT(2 * n), ct.PSDTriangleConeT(dmat)]
settings = ct.DefaultSettings.for_float32(verbose=False)
batch = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                       device=cpu)
sol = batch.solve()
sts = list(sol.statuses())
n_ok = sum(1 for s in sts if s == ct.SolverStatus.Solved)
print(f"solved {n_ok}/{B}")
bad = [i for i, s in enumerate(sts) if s != ct.SolverStatus.Solved]
print("bad lanes:", bad, [str(sts[i]) for i in bad])
it = np.asarray(sol.iterations)
print("iters: min/median/max", it.min(), int(np.median(it)), it.max())
for i in bad:
    # solve the lane alone at f32 for its final info
    s1 = ct.DefaultSolver(P[i], q[i], A[i], b[i], cones, settings,
                          dtype="float32", device=cpu)
    r = s1.solve()
    info = s1.info
    print(f"lane {i}: alone status={r.status} iters={info.iterations} "
          f"gap_rel={getattr(info, 'rel_gap', None)} pres={info.res_primal} "
          f"dres={info.res_dual} ktratio={getattr(info, 'ktratio', None)}")

# --- batch-vs-single trajectory diff for the first failing lane
hist = batch.iteration_history()
l0 = bad[0] if bad else 0
h = hist[l0]
cols = "pcost dcost gap_abs gap_rel pres dres k/t mu step".split()
print(f"batch lane {l0} history:")
print("it  " + "  ".join(f"{c:>9}" for c in cols))
for i, row in enumerate(h):
    if not np.isfinite(row[7]) or (i and row[7] == 0):
        break
    print(f"{i:3d} " + "  ".join(f"{v:9.2e}" for v in row))

# same lane, B=1 batch (vmapped single lane)
b1 = ct.BatchSolver(P[l0:l0+1], q[l0:l0+1], A[l0:l0+1], b[l0:l0+1],
                    cones, settings, dtype="float32", device=cpu)
s1b = b1.solve()
print("B=1 status:", s1b.statuses()[0])
# B=4 including the lane
idx4 = [l0, (l0+1) % B, (l0+2) % B, (l0+3) % B]
b4 = ct.BatchSolver(P[idx4], q[idx4], A[idx4], b[idx4],
                    cones, settings, dtype="float32", device=cpu)
s4 = b4.solve()
print("B=4 statuses:", [str(s) for s in s4.statuses()])
