"""Run the bench SDP batch on the real TPU; report failing lanes and
their iteration histories (f32 preset)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import clarabel_tpu as ct
from tests.test_df_lu import _strict_comp_sdp_batch

B = 64
P, q, A, b, n, dmat = _strict_comp_sdp_batch(B)
dev = jax.devices()[0]
print("device:", dev.device_kind, flush=True)
cones = [ct.NonnegativeConeT(2 * n), ct.PSDTriangleConeT(dmat)]
settings = ct.DefaultSettings.for_float32(verbose=False)
batch = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                       device=dev)
import time
sol = batch.solve()
t0 = time.perf_counter()
out = batch._solve_fn(batch._P, batch._q, batch._A, batch._b)
out["status"].block_until_ready()
t = time.perf_counter() - t0
sts = list(sol.statuses())
n_ok = sum(1 for s in sts if s == ct.SolverStatus.Solved)
it = np.asarray(sol.iterations)
print(f"solved {n_ok}/{B}  t_batch={t*1e3:.1f}ms "
      f"iters min/med/max {it.min()}/{int(np.median(it))}/{it.max()}")
bad = [i for i, s in enumerate(sts) if s != ct.SolverStatus.Solved]
print("bad lanes:", bad, [str(sts[i]) for i in bad])
hist = batch.iteration_history()
for i in bad[:3]:
    h = hist[i]
    print(f"--- lane {i} ({sts[i]}):")
    for k in range(min(len(h), 24)):
        r = h[k]
        if not np.isfinite(r[7]) or (k and r[7] == 0):
            break
        print(f"  it {k}: gap={r[3]:.2e} pres={r[4]:.2e} dres={r[5]:.2e} "
              f"kt={r[6]:.2e} mu={r[7]:.2e} step={r[8]:.3f}")
