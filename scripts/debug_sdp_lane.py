"""Per-iteration trace of a straggler lane of the bench SDP batch at the
f32 preset (CPU backend)."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import clarabel_tpu as ct
from bench import _svec  # type: ignore

LANE = int(sys.argv[1]) if len(sys.argv) > 1 else 58

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

cpu = jax.devices("cpu")[0]
cones = [ct.NonnegativeConeT(2 * n), ct.PSDTriangleConeT(dmat)]

for label, dt in (("f32", "float32"), ("f64", "float64")):
    settings = (ct.DefaultSettings.for_float32(verbose=False)
                if dt == "float32" else ct.DefaultSettings(verbose=False))
    s1 = ct.DefaultSolver(P[LANE], q[LANE], A[LANE], b[LANE], cones,
                          settings, dtype=dt, device=cpu)
    r = s1.solve()
    hist = getattr(s1, "iteration_history", None)
    print(f"--- lane {LANE} {label}: status={r.status} iters={s1.info.iterations}")
    if hist is not None:
        hist = np.asarray(hist)
        cols = "pcost dcost gap_abs gap_rel pres dres k/t mu step".split()
        print("it  " + "  ".join(f"{c:>9}" for c in cols))
        for i, row in enumerate(hist):
            if not np.isfinite(row[7]) or (i and row[7] == 0):
                break
            print(f"{i:3d} " + "  ".join(f"{v:9.2e}" for v in row))
