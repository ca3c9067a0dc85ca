"""TPU f32 validation of the sparse multifrontal path (banded QP)."""
import time
import numpy as np, scipy.sparse as sp
import jax
import clarabel_tpu as ct

dev = jax.devices()[0]
print("device:", dev)

rng = np.random.default_rng(0)
n = 20000
diags = [2.0*np.ones(n), -0.5*np.ones(n-1), -0.5*np.ones(n-1), 0.1*np.ones(n-7)]
P = sp.diags(diags, [0, 1, -1, 7], format="csc")
P_full = ((P + P.T) * 0.5).tocsc()
q = rng.standard_normal(n)
A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
b = np.concatenate([np.ones(n), np.ones(n)])
cones = [ct.NonnegativeConeT(2*n)]

s = ct.DefaultSettings.for_float32(direct_solve_method="multifrontal", verbose=False)
t0 = time.perf_counter()
solver = ct.DefaultSolver(P_full, q, A, b, cones, s, dtype="float32", device=dev)
t1 = time.perf_counter()
print(f"setup: {t1-t0:.1f}s N={solver._skkt.N} nnzL={solver._skkt.plan.nnzL} "
      f"levels={len(solver._skkt.plan.levels)}", flush=True)
sol = solver.solve()
t2 = time.perf_counter()
print(f"first solve (incl compile): {t2-t1:.1f}s status={sol.status.name} "
      f"obj={sol.obj_val:.4f} iters={sol.iterations} "
      f"rprim={sol.r_prim:.2e} rdual={sol.r_dual:.2e}", flush=True)
sol = solver.solve()
t3 = time.perf_counter()
per_iter = (t3-t2)/max(sol.iterations+1,1)
print(f"steady solve: {t3-t2:.2f}s  ({1e3*per_iter:.1f} ms/iter incl 3 solves+factor)", flush=True)
