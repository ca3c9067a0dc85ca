"""DefaultSolver: the user-facing solver object.

Host-side orchestration mirroring the reference setup pipeline
(reference: src/solver/implementations/default/solver.rs:57-126):
dimension checks -> cone collapsing -> presolve -> cone layout (our
row-permutation replaces the reference's per-cone range bookkeeping) ->
a single jitted device computation covering equilibration, the IPM loop
and solution unscaling.

Problems solve as

    minimize    (1/2) xᵀPx + qᵀx
    subject to  Ax + s = b,   s ∈ K.
"""

from __future__ import annotations

import dataclasses
import functools
import io as _io
import sys
import time
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from . import equilibration, presolve
from .algebra.ell import ELLRowMat
from .cones import api
from .cones.layout import ConeLayout
from .infbound import get_infinity
from .loop import run_ipm
from .settings import DefaultSettings
from .statuses import SolverStatus
from .timers import Timers


@dataclasses.dataclass
class DefaultSolution:
    """Solver output.  reference: solution.rs:11-32"""

    x: np.ndarray
    z: np.ndarray
    s: np.ndarray
    status: SolverStatus
    obj_val: float
    obj_val_dual: float
    solve_time: float
    iterations: int
    r_prim: float
    r_dual: float


@dataclasses.dataclass
class EquilibrationData:
    """Ruiz equilibration scalings (reference: equilibration.rs:9-47).

    ``e`` is reported in the user's row order (the internal solver permutes
    rows by cone group).
    """

    d: np.ndarray
    e: np.ndarray
    c: float


@dataclasses.dataclass
class LinearSolverInfo:
    """Which KKT backend actually runs, and its dimensions.

    reference: kktsolvers/mod.rs:27-38 (LinearSolverInfo {name, threads,
    direct, nnzA, nnzL}); ``threads`` has no analog here — XLA owns the
    parallelism."""

    name: str = "none"
    direct: bool = True
    nnzA: int = 0
    nnzL: int = 0
    dim: int = 0  # KKT dimension, including sparse-cone expansion rows
    #: auto-backend cost-model inputs/decision with provenance
    #: (``_KKT_COST_MODELS``); None when no sparse-vs-dense choice was made
    cost_model: Optional[dict] = None


@dataclasses.dataclass
class DefaultInfo:
    """Progress information from the final iteration.  reference: info.rs:13-64"""

    mu: float = float("nan")
    sigma: float = float("nan")
    step_length: float = 0.0
    iterations: int = 0
    cost_primal: float = float("nan")
    cost_dual: float = float("nan")
    res_primal: float = float("nan")
    res_dual: float = float("nan")
    res_primal_inf: float = float("nan")
    res_dual_inf: float = float("nan")
    gap_abs: float = float("nan")
    gap_rel: float = float("nan")
    ktratio: float = float("nan")
    solve_time: float = 0.0
    status: SolverStatus = SolverStatus.Unsolved
    linear_solver: LinearSolverInfo = dataclasses.field(
        default_factory=LinearSolverInfo
    )


def _to_dense(M, name: str):
    """Accept scipy.sparse / array-likes; return (dense f64 ndarray, csc).

    The CSC structure (scipy csc_matrix) is retained so that the
    nzval-indexed partial-update API of the reference
    (data_updating.rs:68-160) keeps its exact semantics.
    """
    if M is None:
        raise ValueError(f"{name} may not be None")
    csc = None
    if hasattr(M, "tocsc"):  # scipy.sparse
        csc = M.tocsc().copy()
        csc.sort_indices()
        M = csc.toarray()
    M = np.asarray(M, np.float64)
    if M.ndim != 2:
        raise ValueError(f"{name} must be 2-dimensional")
    if csc is None:
        import scipy.sparse as sp

        csc = sp.csc_matrix(M)
        csc.sort_indices()
    return M, csc


def _to_csc(M, name: str):
    """Accept scipy.sparse / array-likes; return a sorted csc_matrix
    without ever densifying (the sparse-path counterpart of
    :func:`_to_dense`)."""
    import scipy.sparse as sp

    if M is None:
        raise ValueError(f"{name} may not be None")
    if hasattr(M, "tocsc"):
        csc = M.tocsc().copy()
    else:
        M = np.asarray(M, np.float64)
        if M.ndim != 2:
            raise ValueError(f"{name} must be 2-dimensional")
        csc = sp.csc_matrix(M)
    csc.sort_indices()
    return csc.astype(np.float64)


def _symmetrize_triu(P: np.ndarray) -> np.ndarray:
    """Use only the upper triangle of P, treated as symmetric.

    reference: problemdata.rs:79-81 (to_triu) + sym_up views.
    """
    U = np.triu(P)
    return U + np.triu(P, 1).T


def build_solve_core(layout: ConeLayout, settings: DefaultSettings,
                     n: int, p_is_zero: bool, dtype_name: str,
                     callback=None, use_pallas: bool = False,
                     warm: bool = False, sparse_ctx=None, row_shard=None):
    """The un-jitted single-problem solve function (P, q, A, b) -> outputs.

    Pure and fixed-shape: suitable for jit, vmap (problem batches) and
    shard_map (device meshes).  ``callback`` (host fn dict->bool) enables
    per-iteration termination callbacks on the single-problem path.
    With ``warm=True`` the function takes an additional (x0, s0, z0)
    initial iterate in the user frame.

    With ``sparse_ctx`` (a :class:`~clarabel_tpu.kkt.sparse.SparseKKT`) the
    function takes ``P``/``A`` as COOMat plus an extra leading
    ``skkt_data`` dict argument (index arrays on device), and the KKT path
    runs the sparse multifrontal engine — nothing is ever densified.
    """
    dtype = jnp.dtype(dtype_name)
    # NumPy constant: embedded at trace time without touching any device
    triu_mask = None if sparse_ctx is not None else np.triu(np.ones((n, n), dtype))

    def _solve_core_inner(P, q, A, b, ws=None, skkt_data=None):
        # unscaled inf-norms of the linear terms, cached before
        # equilibration (problemdata.rs:147-148)
        normq = jnp.max(jnp.abs(q), initial=0.0)
        normb = jnp.max(jnp.abs(b), initial=0.0)

        if sparse_ctx is not None:
            P, q, A, b, d, e, c_scale = equilibration.equilibrate_sparse(
                layout, settings, P, q, A, b
            )
            # values are final for the whole IPM: materialize the DIA
            # matvec layout once (no-op for non-compact patterns)
            P, A = P.predia(), A.predia()
        elif isinstance(A, ELLRowMat):
            # row-sharded sparse A (ShardedRowSolver sparse path): A's
            # norm/scale/matvec ops run per-shard + collectives
            P, q, A, b, d, e, c_scale = equilibration.equilibrate_ell(
                layout, settings, P, q, A, b, triu_mask
            )
        else:
            P, q, A, b, d, e, c_scale = equilibration.equilibrate(
                layout, settings, P, q, A, b, triu_mask
            )
        dinv, einv, cinv = 1.0 / d, 1.0 / e, 1.0 / c_scale
        equil = (d, e, dinv, einv, cinv)

        if ws is not None:
            # scale the user-frame iterate into the equilibrated frame
            # (inverse of the unscale step below, at τ = 1)
            x0, s0, z0 = ws
            ws = (x0 * dinv, s0 * e, z0 * c_scale * einv)

        st = run_ipm(
            layout, settings, P, q, A, b, equil, normq, normb, p_is_zero, dtype,
            callback=callback, use_pallas=use_pallas, warm_start=ws,
            sparse_kkt=(
                (sparse_ctx, skkt_data) if sparse_ctx is not None else None
            ),
            row_shard=row_shard,
        )

        # ---- solution post-processing (solution.rs:68-111,
        #      variables.rs:262-285)
        status = st.status
        is_infeasible = (
            (status == int(SolverStatus.PrimalInfeasible))
            | (status == int(SolverStatus.DualInfeasible))
            | (status == int(SolverStatus.AlmostPrimalInfeasible))
            | (status == int(SolverStatus.AlmostDualInfeasible))
        )
        scaleinv = jnp.where(is_infeasible, 1.0 / st.kappa, 1.0 / st.tau)

        x = st.x * d * scaleinv
        z = st.z * e * (scaleinv * cinv)
        s = st.s * einv * scaleinv

        nan = jnp.asarray(jnp.nan, dtype)
        obj_val = jnp.where(is_infeasible, nan, st.cost_primal)
        obj_val_dual = jnp.where(is_infeasible, nan, st.cost_dual)

        return {
            "x": x,
            "z": z,
            "s": s,
            "status": status,
            "obj_val": obj_val,
            "obj_val_dual": obj_val_dual,
            "iterations": st.iterations,
            "r_prim": st.res_primal,
            "r_dual": st.res_dual,
            "tau": st.tau,
            "kappa": st.kappa,
            "mu": st.mu,
            "sigma": st.sigma,
            "step_length": st.step_length,
            "cost_primal": st.cost_primal,
            "cost_dual": st.cost_dual,
            "res_primal_inf": st.res_primal_inf,
            "res_dual_inf": st.res_dual_inf,
            "gap_abs": st.gap_abs,
            "gap_rel": st.gap_rel,
            "ktratio": st.ktratio,
            "equil_d": d,
            "equil_e": e,
            "equil_c": c_scale,
            "history": st.history,
        }

    # IPM residuals and refinement need true f32 accumulation; the
    # TPU's default bf16 matmul passes destroy the achievable
    # tolerances, so pin full precision for everything traced here.
    if sparse_ctx is not None:
        if warm:
            def solve_core(P, q, A, b, skkt_data, x0, s0, z0):
                with jax.default_matmul_precision("highest"):
                    return _solve_core_inner(
                        P, q, A, b, ws=(x0, s0, z0), skkt_data=skkt_data
                    )
        else:
            def solve_core(P, q, A, b, skkt_data):
                with jax.default_matmul_precision("highest"):
                    return _solve_core_inner(P, q, A, b, skkt_data=skkt_data)
    elif warm:
        def solve_core(P, q, A, b, x0, s0, z0):
            with jax.default_matmul_precision("highest"):
                return _solve_core_inner(P, q, A, b, ws=(x0, s0, z0))
    else:
        def solve_core(P, q, A, b):
            with jax.default_matmul_precision("highest"):
                return _solve_core_inner(P, q, A, b)

    return solve_core


@functools.lru_cache(maxsize=64)
def _build_solve_fn(layout: ConeLayout, settings: DefaultSettings,
                    n: int, p_is_zero: bool, dtype_name: str,
                    use_pallas: bool = False):
    """Compile-cached jitted solve function."""
    return jax.jit(
        build_solve_core(
            layout, settings, n, p_is_zero, dtype_name, use_pallas=use_pallas
        )
    )


def _is_tpu_platform(device) -> bool:
    return getattr(device, "platform", "") in ("tpu", "axon")


def _default_dtype() -> str:
    return "float64" if jax.config.jax_enable_x64 else "float32"


# auto-selection gate for the sparse multifrontal KKT path: beyond this
# size a dense (n+m)^2 KKT stops being the right default
_SPARSE_AUTO_MIN_DIM = 3000
_SPARSE_AUTO_MAX_DENSITY = 0.02


def _estimate_hs_nnz(cones) -> int:
    """Lower-triangle nonzero estimate of the -Hs block per cone kind
    (the sparse assembly's hs_lower_coords / expansion_coords footprint;
    reference: kkt_assembly.rs:53-103).  Diagonal entries are counted by
    the caller's +N term; this adds the super-diagonal block weight."""
    nnz = 0
    for c in cones:
        if c.kind == api.PSD:
            tri = c.nvars  # already the svec dimension d(d+1)/2
            nnz += tri * (tri - 1) // 2
        elif c.kind == api.SOC:
            d = c.nvars
            # expanded (diag + 2 extension rows) or dense tri block,
            # whichever the engine would pick (kkt/sparse.py thresholds)
            nnz += min(d * (d - 1) // 2, 2 * (d + 1))
        elif c.kind in (api.EXP, api.POW):
            nnz += 3  # dense 3x3 lower block, off-diagonal part
        elif c.kind == api.GENPOW:
            nnz += 3 * (c.nvars + 1)
    return nnz


def _wants_sparse(settings, P_csc, A_csc, n, m, cones) -> bool:
    """Decide whether to route this problem to the sparse multifrontal
    KKT engine (the reference's auto backend picks between simplicial and
    supernodal sparse solvers, ldlsolvers/auto.rs:47-88; here the choice
    is dense-batched vs sparse-multifrontal, which the problem size and
    density determine).

    PSD cones count their dense tri-block Hs footprint; a problem whose
    density fails only because of large decomposable PSD blocks still
    routes here tentatively when chordal decomposition is enabled — the
    sparse setup re-checks the density after the decomposition and falls
    back to the dense path if it did not help (the reference assembles
    PSD Hs blocks sparsely the same way, kkt_assembly.rs:53-103)."""
    method = settings.direct_solve_method
    if method == "multifrontal":
        return True
    if method != "auto":
        return False
    N = n + m
    if N < _SPARSE_AUTO_MIN_DIM:
        return False
    nnz = 2 * P_csc.nnz + A_csc.nnz + N + _estimate_hs_nnz(cones)
    if nnz < _SPARSE_AUTO_MAX_DENSITY * float(N) * float(N):
        return True
    # too dense only because of PSD Hs blocks? chordal decomposition may
    # shrink them to clique size — try the sparse setup, which re-checks
    if (
        settings.chordal_decomposition_enable
        and any(c.kind == api.PSD and c.dim > 3 for c in cones)
    ):
        nnz_nopsd = nnz - _estimate_hs_nnz(
            [c for c in cones if c.kind == api.PSD]
        )
        return nnz_nopsd < _SPARSE_AUTO_MAX_DENSITY * float(N) * float(N)
    return False


# dense fallback is representable up to this KKT dimension (N^2 f32 = 256 MB)
_DENSE_FALLBACK_MAX_DIM = 8192

# Per-device-kind constants for the auto-backend cost model.  Each entry
# gives per-iteration proxies: ``bucket_s`` (dispatch-chain latency per
# multifrontal level bucket), ``mf_gflops`` (front-work FLOP rate),
# ``dense_floor_s`` + ``dense_n4096_s`` (pivoted-LU latency floor and the
# cubic term anchored at N=4096).  Keys match ``device.device_kind``;
# unknown devices fall back to the TPU v5e measurements — the veto is a
# heuristic either way, and the provenance is recorded in
# ``solver.info.linear_solver.cost_model`` so a wrong table is visible.
_KKT_COST_MODELS = {
    "TPU v5 lite": dict(
        bucket_s=1.0e-3, mf_gflops=20.0,
        dense_floor_s=2.2e-2, dense_n4096_s=3.0e-2,
        provenance="measured on TPU v5e (BENCH_EXT rounds 2-3)",
    ),
    # host CPU (the f64 oracle backend): dispatch is cheap, LAPACK LU is
    # single-stream — both sides shrink roughly together, same shape
    "cpu": dict(
        bucket_s=1.0e-4, mf_gflops=5.0,
        dense_floor_s=1.0e-3, dense_n4096_s=3.0e-1,
        provenance="order-of-magnitude host-CPU estimate (unmeasured)",
    ),
}
_KKT_COST_DEFAULT = dict(
    _KKT_COST_MODELS["TPU v5 lite"],
    provenance="default: TPU v5e measurements applied to an unmeasured "
    "device kind",
)


def _measure_cost_model(device, kind: str) -> dict:
    """One-time micro-measurement of the auto-backend cost-model constants
    on an unknown device kind (the reference's auto backend measures
    nothing but is tuned per release for real CPUs, ldlsolvers/auto.rs;
    here unfamiliar hardware measures itself once instead of inheriting
    TPU v5e numbers).  Two probes, a few hundred ms total after compile:

    - a 64-op chain of dependent small batched matmuls -> per-op dispatch
      latency (``bucket_s``) and the small-front FLOP rate (``mf_gflops``)
    - one f32 LU factor+solve at N=1024 -> rescales the v5e dense-LU
      latency floor and cubic anchor by the measured/predicted ratio
    """
    import time as _time

    import jax.numpy as jnp
    import jax.scipy.linalg as _jsl

    CHAIN, BKT, NB = 64, 64, 8  # 8 fronts of 64x64 per "bucket"

    def chain(x):
        for _ in range(CHAIN):
            x = jnp.einsum("kij,kjl->kil", x, x) / jnp.maximum(
                jnp.max(jnp.abs(x)), 1.0
            )
        return x

    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        rng.standard_normal((NB, BKT, BKT)).astype(np.float32), device
    )
    chain_j = jax.jit(chain)  # follows the device_put placement of x0
    chain_j(x0).block_until_ready()  # compile
    t0 = _time.perf_counter()
    chain_j(x0).block_until_ready()
    t_chain = _time.perf_counter() - t0
    # each op is one batched matmul (2*NB*BKT^3 flops) + cheap scaling;
    # small ops on accelerators are launch-bound, so per-op time is the
    # dispatch latency and the flop count gives a lower-bound flop rate
    bucket_s = max(t_chain / CHAIN, 1e-7)
    mf_gflops = max(2.0 * NB * BKT**3 * CHAIN / t_chain / 1e9, 0.1)

    NLU = 1024
    K = rng.standard_normal((NLU, NLU)).astype(np.float32)
    K = K + K.T + 2 * NLU * np.eye(NLU, dtype=np.float32)
    rhs = rng.standard_normal(NLU).astype(np.float32)
    Kd = jax.device_put(K, device)
    rd = jax.device_put(rhs, device)

    def lu_solve(Km, r):
        f = _jsl.lu_factor(Km)
        return _jsl.lu_solve(f, r)

    lu_j = jax.jit(lu_solve)
    lu_j(Kd, rd).block_until_ready()
    t0 = _time.perf_counter()
    lu_j(Kd, rd).block_until_ready()
    t_lu = _time.perf_counter() - t0

    ref = _KKT_COST_MODELS["TPU v5 lite"]
    pred_v5e = ref["dense_floor_s"] + (NLU / 4096.0) ** 3 * ref[
        "dense_n4096_s"
    ]
    ratio = max(t_lu / pred_v5e, 1e-3)
    return dict(
        bucket_s=bucket_s,
        mf_gflops=mf_gflops,
        dense_floor_s=ref["dense_floor_s"] * ratio,
        dense_n4096_s=ref["dense_n4096_s"] * ratio,
        provenance=(
            f"measured at first use on '{kind}': {CHAIN}-op chain "
            f"{t_chain*1e3:.2f} ms, LU(N={NLU}) {t_lu*1e3:.2f} ms"
        ),
    )


def _cost_model_for(device) -> dict:
    kind = getattr(device, "device_kind", "") or getattr(
        device, "platform", ""
    )
    for key, model in _KKT_COST_MODELS.items():
        if key in kind or kind == key:
            return dict(model, device_kind=kind)
    if kind not in _KKT_COST_MODELS:
        try:
            _KKT_COST_MODELS[kind] = _measure_cost_model(device, kind)
        except Exception as e:  # measurement is best-effort
            _KKT_COST_MODELS[kind] = dict(
                _KKT_COST_DEFAULT,
                provenance=_KKT_COST_DEFAULT["provenance"]
                + f" (first-use measurement failed: {type(e).__name__})",
            )
    return dict(_KKT_COST_MODELS[kind], device_kind=kind)


def _prefer_dense(plan, N, cost_model) -> bool:
    """Cost-model veto of the multifrontal choice after symbolic analysis —
    the analog of the reference's auto backend, which computes the AMD
    ordering + symbolic counts and switches on flops/nnz(L)
    (ldlsolvers/auto.rs:47-88).  Here the two candidates are the levelized
    multifrontal schedule vs one dense LU of the full KKT, so the model
    compares their predicted per-iteration times with per-device constants
    (``_KKT_COST_MODELS``): the multifrontal is dispatch-bound at
    ~bucket_s per bucket chain + front flops, dense LU has a latency floor
    plus a cubic term.  High fill or a deep/fragmented schedule sends a
    medium-sized problem back to the dense path."""
    if N > _DENSE_FALLBACK_MAX_DIM:
        cost_model["decision"] = "multifrontal (N beyond dense fallback)"
        return False
    n_buckets = sum(len(lvl) for lvl in plan.levels)
    t_mf = cost_model["bucket_s"] * n_buckets + plan.flops / (
        cost_model["mf_gflops"] * 1e9
    )
    t_dense = cost_model["dense_floor_s"] + (float(N) / 4096.0) ** 3 * (
        cost_model["dense_n4096_s"]
    )
    cost_model["t_mf_s"] = round(t_mf, 6)
    cost_model["t_dense_s"] = round(t_dense, 6)
    prefer = t_dense < t_mf
    cost_model["decision"] = "dense" if prefer else "multifrontal"
    return prefer


class DefaultSolver:
    """Interior-point solver for convex conic programs with quadratic
    objectives (reference: DefaultSolver, default/solver.rs:19-126)."""

    def __init__(
        self,
        P,
        q,
        A,
        b,
        cones: Sequence[api.ConeSpec],
        settings: Optional[DefaultSettings] = None,
        dtype: Optional[str] = None,
        device=None,
    ):
        self.settings = settings if settings is not None else DefaultSettings()
        self.settings.validate()
        self.timers = Timers()

        with self.timers.scope("setup"):
            q = np.asarray(q, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            import scipy.sparse as sp

            P_csc = _to_csc(P, "P")
            A_csc = _to_csc(A, "A")

            # dimension checks (default/solver.rs:129-159)
            n = q.shape[0]
            m = b.shape[0]
            if P_csc.shape != (n, n):
                raise ValueError(f"P must be {n}x{n}, got {P_csc.shape}")
            if A_csc.shape != (m, n):
                raise ValueError(f"A must be {m}x{n}, got {A_csc.shape}")
            cones = tuple(cones)
            m_cones = sum(c.nvars for c in cones)
            if m_cones != m:
                raise ValueError(
                    f"cone dimensions sum to {m_cones}, but A/b have {m} rows"
                )

            # retain triu CSC structure of P for nzval-indexed updates
            # (the internal P is the triu part treated as symmetric)
            self._P_csc = sp.triu(P_csc, format="csc")
            self._P_csc.sort_indices()
            self._A_csc = A_csc

            # large sparse problems (or an explicit request) route to the
            # sparse multifrontal KKT engine and are never densified;
            # everything else uses the batched/MXU dense backends.  On the
            # auto path the symbolic analysis may veto the choice (cost
            # model; _prefer_dense) and fall back to the dense backends.
            self._sparse = _wants_sparse(self.settings, P_csc, A_csc, n, m, cones)
            if self._sparse:
                self._sparse = self._setup_sparse(q, b, cones, dtype, device)
            if not self._sparse:
                self._setup_dense(
                    _symmetrize_triu(P_csc.toarray()), A_csc.toarray(),
                    q, b, cones, dtype, device,
                )

        self.info = DefaultInfo(linear_solver=self._linear_solver)
        self.solution: Optional[DefaultSolution] = None
        self.equilibration: Optional[EquilibrationData] = None
        self._callback = None
        self._print_stream = sys.stdout
        self._print_buffer = None

    # ------------------------------------------------------------------
    def _setup_dense(self, P, A, q, b, cones, dtype, device):
        n, m = q.shape[0], b.shape[0]
        with self.timers.scope("presolve"):
            # cone collapsing (supportedcone.rs:105-161)
            cones_int = api.collapse_cones(cones)

            # presolve reduction (problemdata.rs:85-90)
            self._presolver = presolve.try_presolve(A, b, cones_int, self.settings)
            if self._presolver is not None:
                A, b, cones_int = presolve.apply_presolve(
                    self._presolver, A, b, cones_int
                )

            # cap b at the infinity bound (problemdata.rs:126-131)
            b = np.minimum(b, get_infinity())

            # user-frame copies (post-presolve, pre-chordal) for data
            # updating and JSON round-trips
            self._cones_user = cones
            self._cones_int = cones_int
            self._np_P = P
            self._np_q = q.copy()
            self._np_A = A.copy()
            self._np_b = b.copy()

            # chordal decomposition of large sparse PSD cones
            # (problemdata.rs:94-112)
            from .chordal import try_chordal_info

            self._chordal = try_chordal_info(A, b, cones_int, self.settings)
            if self._chordal is not None:
                P, q, A, b, cones_int = self._chordal.decomp_augment(
                    P, q, A, b, self.settings
                )

            self._layout = ConeLayout(cones_int)

            # permute rows so cone groups are contiguous
            perm = self._layout.perm
            A = A[perm, :]
            b = b[perm]

        self.n = n  # original variable count
        self.m_full = m  # original constraint count
        self.m = self._layout.m  # internal (reduced / augmented) count
        self._n_int = P.shape[0]  # internal variable count (chordal adds)
        self._dtype = dtype or _default_dtype()
        self._p_is_zero = not np.any(P)

        # f64 factorizations are not supported by the TPU backend; route
        # full-precision solves to the host CPU and f32 solves to the
        # accelerator.  jit follows the committed device of the inputs.
        if device is None:
            if self._dtype == "float64":
                device = jax.devices("cpu")[0]
            else:
                device = jax.devices()[0]
        self._device = device

        # NB: stage through NumPy (not jnp) so nothing round-trips via
        # the default accelerator device
        put = lambda v: jax.device_put(np.asarray(v, self._dtype), device)
        self._P = put(P)
        self._q = put(q)
        self._A = put(A)
        self._b = put(b)

        self._use_pallas = _is_tpu_platform(device)

        with self.timers.scope("kktinit"):
            self._solve_fn = _build_solve_fn(
                self._layout, self.settings, self._n_int,
                self._p_is_zero, self._dtype, self._use_pallas,
            )

        from .loop import _resolved_kkt_method

        N = self._n_int + self.m
        self._linear_solver = LinearSolverInfo(
            name=_resolved_kkt_method(
                self._layout, self.settings, jnp.dtype(self._dtype),
                self._n_int, self._use_pallas,
            ),
            nnzA=int(self._A_csc.nnz),
            nnzL=N * (N + 1) // 2,  # dense factor
            dim=N,
            cost_model=getattr(self, "_cost_model", None),
        )

    # ------------------------------------------------------------------
    def _setup_sparse(self, q, b, cones, dtype, device):
        """Sparse-path setup: scipy-sparse host pipeline + multifrontal
        symbolic analysis; problem data stays in COO triplet form on
        device (reference: same pipeline as DefaultSolver::new but with
        the sparse KKT engine of kkt_assembly.rs/qdldl.rs behind it)."""
        import scipy.sparse as sp

        from .algebra.coo import COOMat
        from .kkt import sparse as kkt_sparse

        n, m = q.shape[0], b.shape[0]
        with self.timers.scope("presolve"):
            # cone collapsing (supportedcone.rs:105-161)
            cones_int = api.collapse_cones(cones)

            # presolve reduction (problemdata.rs:85-90); row selection
            # stays sparse via CSR slicing
            A_work = self._A_csc.tocsr()
            self._presolver = presolve.try_presolve(
                A_work, b, cones_int, self.settings
            )
            if self._presolver is not None:
                A_work, b, cones_int = presolve.apply_presolve(
                    self._presolver, A_work, b, cones_int
                )

            # cap b at the infinity bound (problemdata.rs:126-131)
            b = np.minimum(b, get_infinity())

            self._cones_user = cones
            self._cones_int = cones_int
            self._np_P = None  # matrices live in self._P_csc / self._A_csc
            self._np_q = q.copy()
            self._np_A = None
            self._np_b = b.copy()

            # chordal decomposition of large PSD cones composes with the
            # sparse KKT path: the combinatorial transform runs host-side
            # on dense views (exactly as the dense path does), and the
            # decomposed problem — many small clique cones with sparse
            # coupling rows — is what the multifrontal engine is built for
            # (reference: problemdata.rs:94-112 + SURVEY §5.7)
            from .chordal import try_chordal_info

            P_full_csc = (
                self._P_csc + sp.triu(self._P_csc, 1).T
            ).tocsc()
            self._chordal = None
            if any(c.kind == api.PSD for c in cones_int):
                self._chordal = try_chordal_info(
                    A_work, b, cones_int, self.settings
                )
                if self._chordal is not None:
                    P_s, q, A_s, b, cones_int = (
                        self._chordal.decomp_augment(
                            P_full_csc, q, A_work, b, self.settings,
                        )
                    )
                    P_full_csc = P_s.tocsc()
                    A_work = A_s.tocsr()

            n_int = P_full_csc.shape[0]

            self._layout = ConeLayout(cones_int)
            perm = self._layout.perm
            A_perm = A_work[perm].tocoo()
            b = b[perm]

        self.n = n
        self.m_full = m
        self.m = self._layout.m
        self._n_int = n_int
        self._dtype = dtype or _default_dtype()

        P_sym = P_full_csc.tocoo()
        self._p_is_zero = not (P_sym.nnz and np.any(P_sym.data))

        if device is None:
            if self._dtype == "float64":
                device = jax.devices("cpu")[0]
            else:
                device = jax.devices()[0]
        self._device = device
        # The experimental Pallas multifrontal kernels (fused front
        # factorization, pivot-chain LDL) were retired in round 5 after
        # two rounds of measurements showed neither earns a default slot:
        # the fused front kernel was numerically weaker than the XLA
        # blocked path and no faster in context, the pivot-chain kernel
        # bit-exact but speed-neutral (findings recorded in STATUS.md).
        # The XLA blocked factorization is the shipped multifrontal path;
        # the Pallas quasidefinite LDL for dense KKTs (kkt/pallas_ldl.py,
        # direct_solve_method="pallas") remains with its bench rows.
        self._use_pallas = "none"

        # post-chordal density re-check: a PSD problem was routed here
        # tentatively on the hope that the decomposition shrinks its dense
        # tri-block Hs footprint; if it did not (no decomposition, or still
        # too dense), the dense backends are the better program
        if self.settings.direct_solve_method != "multifrontal" and any(
            c.kind == api.PSD for c in self._cones_int
        ):
            N_est = n_int + self._layout.m
            nnz_est = (
                2 * P_full_csc.nnz + A_perm.nnz + N_est
                + _estimate_hs_nnz(cones_int)
            )
            if nnz_est >= _SPARSE_AUTO_MAX_DENSITY * float(N_est) * float(
                N_est
            ):
                return False

        self._cost_model = _cost_model_for(device)
        with self.timers.scope("kktinit"):
            self._skkt = kkt_sparse.build(
                self._layout, n_int,
                P_sym.row.astype(np.int64), P_sym.col.astype(np.int64),
                A_perm.row.astype(np.int64), A_perm.col.astype(np.int64),
                ordering=self.settings.multifrontal_ordering,
                dtype=self._dtype,
            )
            # auto-mode cost-model veto (ldlsolvers/auto.rs analog): a bad
            # fill/schedule on a medium problem falls back to dense LU
            if (
                self.settings.direct_solve_method != "multifrontal"
                and _prefer_dense(self._skkt.plan, self._skkt.N,
                                  self._cost_model)
            ):
                return False
            self._skkt_data = self._skkt.device_data(self._dtype, device)

            put = lambda v: jax.device_put(np.asarray(v, self._dtype), device)
            iput = lambda v: jax.device_put(np.asarray(v, np.int32), device)
            from .algebra.coo import dia_metadata

            def coo_mat(M, shape):
                # DIA metadata when the pattern is banded-compact: the IPM
                # runs ~9 P/A products per iteration and the segment path
                # costs ~13 ns/element in TPU index ops
                offs, pos = dia_metadata(M.row, M.col, shape)
                return COOMat(
                    put(M.data), iput(M.row), iput(M.col), shape,
                    dia_pos=None if pos is None else jax.device_put(pos, device),
                    dia_offsets=offs,
                )

            self._P = coo_mat(P_sym, (n_int, n_int))
            self._A = coo_mat(A_perm, (self.m, n_int))
            self._q = put(q)
            self._b = put(b)

            self._solve_fn = jax.jit(
                build_solve_core(
                    self._layout, self.settings, self._n_int,
                    self._p_is_zero, self._dtype, sparse_ctx=self._skkt,
                    use_pallas=self._use_pallas,
                )
            )

        self._linear_solver = LinearSolverInfo(
            name="multifrontal",
            nnzA=int(self._A_csc.nnz),
            nnzL=int(self._skkt.plan.nnzL),
            dim=self._skkt.N,
            cost_model=getattr(self, "_cost_model", None),
        )
        return True

    # ------------------------------------------------------------------
    def solve(self, warm_start=None) -> DefaultSolution:
        """Solve the problem.

        ``warm_start`` (optional) is a previous :class:`DefaultSolution` or
        an (x, s, z) triple in the user frame, used as the initial iterate
        (the reference always cold starts; SURVEY §5.4)."""
        t0 = time.perf_counter()
        with self.timers.scope("solve"):
            if warm_start is not None:
                out = self._solve_warm(warm_start)
            elif self._sparse:
                out = self._solve_fn(
                    self._P, self._q, self._A, self._b, self._skkt_data
                )
            else:
                out = self._solve_fn(self._P, self._q, self._A, self._b)
            out = jax.tree.map(np.asarray, jax.device_get(out))
        solve_time = time.perf_counter() - t0
        self._raw_out = out  # full core outputs (permuted frame), for
        # introspection/debugging: includes tau/kappa/equilibration

        status = SolverStatus(int(out["status"]))

        e_user = np.empty(self.m, np.float64)
        e_user[self._layout.perm] = out["equil_e"]
        self.equilibration = EquilibrationData(
            d=np.asarray(out["equil_d"], np.float64),
            e=e_user,
            c=float(out["equil_c"]),
        )

        # undo the cone-group permutation
        z_int = np.empty(self.m, out["z"].dtype)
        s_int = np.empty(self.m, out["s"].dtype)
        z_int[self._layout.perm] = out["z"]
        s_int[self._layout.perm] = out["s"]
        x_int = np.asarray(out["x"], np.float64)

        # undo the chordal decomposition (+ PSD dual completion)
        # before the presolve reversal (solution.rs:92-105)
        if self._chordal is not None:
            x_int, z_int, s_int = self._chordal.decomp_reverse(
                x_int, z_int, s_int, self.settings
            )

        # undo presolve (solution.rs:96-105)
        if self._presolver is not None:
            z, s = presolve.reverse_presolve(self._presolver, z_int, s_int)
        else:
            z, s = z_int, s_int

        self.solution = DefaultSolution(
            x=x_int,
            z=np.asarray(z, np.float64),
            s=np.asarray(s, np.float64),
            status=status,
            obj_val=float(out["obj_val"]),
            obj_val_dual=float(out["obj_val_dual"]),
            solve_time=solve_time,
            iterations=int(out["iterations"]),
            r_prim=float(out["r_prim"]),
            r_dual=float(out["r_dual"]),
        )
        self.info = DefaultInfo(
            mu=float(out["mu"]),
            sigma=float(out["sigma"]),
            step_length=float(out["step_length"]),
            iterations=int(out["iterations"]),
            cost_primal=float(out["cost_primal"]),
            cost_dual=float(out["cost_dual"]),
            res_primal=float(out["r_prim"]),
            res_dual=float(out["r_dual"]),
            res_primal_inf=float(out["res_primal_inf"]),
            res_dual_inf=float(out["res_dual_inf"]),
            gap_abs=float(out["gap_abs"]),
            gap_rel=float(out["gap_rel"]),
            ktratio=float(out["ktratio"]),
            solve_time=solve_time,
            status=status,
            linear_solver=self._linear_solver,
        )

        if self.settings.verbose:
            self._print_report(out["history"])
        self.iteration_history = np.asarray(out["history"])

        return self.solution

    # ------------------------------------------------------------------
    def _solve_warm(self, warm_start):
        if isinstance(warm_start, DefaultSolution):
            x0, s0, z0 = warm_start.x, warm_start.s, warm_start.z
        else:
            x0, s0, z0 = warm_start
        x0 = np.asarray(x0, np.float64).ravel()
        s0 = np.asarray(s0, np.float64).ravel()
        z0 = np.asarray(z0, np.float64).ravel()
        if (
            x0.shape[0] != self.n
            or s0.shape[0] != self.m_full
            or z0.shape[0] != self.m_full
        ):
            raise ValueError("warm start has wrong dimensions")
        if self._presolver is not None:
            # map the user-frame iterate through the presolve reduction:
            # eliminated rows carry s = inf, z = 0 and simply drop
            # (presolver.rs:134-154 reversed)
            keep = self._presolver.keep_logical
            s0 = s0[keep]
            z0 = z0[keep]
        if self._chordal is not None:
            # forward-map through the clique transform (per-clique
            # gather + exact/zero overlap split; decomp.decomp_warm_start)
            x0, s0, z0 = self._chordal.decomp_warm_start(x0, s0, z0)
        perm = self._layout.perm
        put = lambda v: jax.device_put(np.asarray(v, self._dtype), self._device)

        if not hasattr(self, "_warm_fn") or self._warm_fn is None:
            self._warm_fn = jax.jit(
                build_solve_core(
                    self._layout, self.settings, self._n_int,
                    self._p_is_zero, self._dtype,
                    callback=self._callback, use_pallas=self._use_pallas,
                    warm=True,
                    sparse_ctx=self._skkt if self._sparse else None,
                )
            )
        if self._sparse:
            return self._warm_fn(
                self._P, self._q, self._A, self._b, self._skkt_data,
                put(x0), put(s0[perm]), put(z0[perm]),
            )
        return self._warm_fn(
            self._P, self._q, self._A, self._b,
            put(x0), put(s0[perm]), put(z0[perm]),
        )

    # ------------------------------------------------------------------
    # data updating (reference: data_updating.rs:68-160)
    # ------------------------------------------------------------------

    def is_data_update_allowed(self) -> bool:
        """Updates are disallowed after presolve reduction or chordal
        decomposition (data_updating.rs:10-24, 153+)."""
        return self._presolver is None and self._chordal is None

    def _check_update_allowed(self):
        if not self.is_data_update_allowed():
            raise ValueError(
                "problem data cannot be updated after presolve reduction; "
                "construct the solver with presolve_enable=False to use "
                "parametric updates"
            )

    @staticmethod
    def _apply_matrix_update(dense, csc, data, symmetric):
        """Apply a full-matrix / nzval-vector / (index, value) update."""
        if hasattr(data, "tocsc") or (
            isinstance(data, np.ndarray) and data.ndim == 2
        ):
            new, new_csc = _to_dense(data, "update")
            if symmetric:
                new = _symmetrize_triu(new)
            if new.shape != dense.shape:
                raise ValueError("updated matrix has wrong shape")
            dense[...] = new
            return
        if isinstance(data, tuple) and len(data) == 2:
            idx, vals = data
            idx = np.asarray(idx, np.int64).ravel()
            vals = np.asarray(vals, np.float64).ravel()
        else:
            vals = np.asarray(data, np.float64).ravel()
            if vals.shape[0] != csc.nnz:
                raise ValueError(
                    f"expected {csc.nnz} values for full nzval update"
                )
            idx = np.arange(csc.nnz)
        # map nzval indices -> (row, col) through the stored CSC structure
        rows = csc.indices[idx]
        cols = np.searchsorted(csc.indptr, idx, side="right") - 1
        dense[rows, cols] = vals
        if symmetric:
            dense[cols, rows] = vals

    @staticmethod
    def _apply_csc_update(csc, data, name):
        """Sparse-path update: write through the retained CSC structure
        (the analog of the reference's AtoPAPt write-through,
        qdldl.rs:142-149).  Structure must be identical."""
        import scipy.sparse as sp

        if hasattr(data, "tocsc") or (
            isinstance(data, np.ndarray) and data.ndim == 2
        ):
            new = _to_csc(data, name)
            if name == "P":
                new = sp.triu(new, format="csc")
                new.sort_indices()
            if (
                new.shape != csc.shape
                or new.nnz != csc.nnz
                or not np.array_equal(new.indices, csc.indices)
                or not np.array_equal(new.indptr, csc.indptr)
            ):
                raise ValueError(
                    f"updated {name} must have identical sparsity structure"
                )
            csc.data[:] = new.data
        elif isinstance(data, tuple) and len(data) == 2:
            idx, vals = data
            csc.data[np.asarray(idx, np.int64).ravel()] = np.asarray(
                vals, np.float64
            ).ravel()
        else:
            vals = np.asarray(data, np.float64).ravel()
            if vals.shape[0] != csc.nnz:
                raise ValueError(
                    f"expected {csc.nnz} values for full nzval update"
                )
            csc.data[:] = vals

    def _push_data(self):
        put = lambda v: jax.device_put(np.asarray(v, self._dtype), self._device)
        perm = self._layout.perm
        if self._sparse:
            import scipy.sparse as sp

            P_sym = (self._P_csc + sp.triu(self._P_csc, 1).T).tocoo()
            A_perm = self._A_csc.tocsr()[perm].tocoo()
            # structure is immutable, so the deterministic COO order
            # matches the one captured at setup
            self._P = self._P.with_data(put(P_sym.data))
            self._A = self._A.with_data(put(A_perm.data))
            self._q = put(self._np_q)
            self._b = put(np.minimum(self._np_b, get_infinity())[perm])
            p_is_zero = not (P_sym.nnz and np.any(P_sym.data))
        else:
            self._P = put(self._np_P)
            self._q = put(self._np_q)
            self._A = put(self._np_A[perm, :])
            self._b = put(np.minimum(self._np_b, get_infinity())[perm])
            p_is_zero = not np.any(self._np_P)
        if p_is_zero != self._p_is_zero:
            self._p_is_zero = p_is_zero
            self._rebuild_solve_fn()

    def update_P(self, data):
        """Update the P matrix: full matrix, full nzval vector, or
        (nzval-indices, values).  reference: data_updating.rs:98-116"""
        self._check_update_allowed()
        if self._sparse:
            self._apply_csc_update(self._P_csc, data, "P")
        else:
            self._apply_matrix_update(self._np_P, self._P_csc, data, symmetric=True)
        self._push_data()

    def update_A(self, data):
        """reference: data_updating.rs:118-132"""
        self._check_update_allowed()
        if self._sparse:
            self._apply_csc_update(self._A_csc, data, "A")
        else:
            self._apply_matrix_update(self._np_A, self._A_csc, data, symmetric=False)
        self._push_data()

    @staticmethod
    def _apply_vector_update(vec, data):
        if isinstance(data, tuple) and len(data) == 2:
            idx, vals = data
            vec[np.asarray(idx, np.int64).ravel()] = np.asarray(
                vals, np.float64
            ).ravel()
        else:
            vals = np.asarray(data, np.float64).ravel()
            if vals.shape[0] != vec.shape[0]:
                raise ValueError("updated vector has wrong length")
            vec[...] = vals

    def update_q(self, data):
        """reference: data_updating.rs:135-146"""
        self._check_update_allowed()
        self._apply_vector_update(self._np_q, data)
        self._push_data()

    def update_b(self, data):
        """reference: data_updating.rs:148-160"""
        self._check_update_allowed()
        self._apply_vector_update(self._np_b, data)
        self._push_data()

    def update_data(self, P=None, q=None, A=None, b=None):
        """Combined update (reference: data_updating.rs:68-86)."""
        self._check_update_allowed()
        if P is not None:
            if self._sparse:
                self._apply_csc_update(self._P_csc, P, "P")
            else:
                self._apply_matrix_update(self._np_P, self._P_csc, P, symmetric=True)
        if A is not None:
            if self._sparse:
                self._apply_csc_update(self._A_csc, A, "A")
            else:
                self._apply_matrix_update(self._np_A, self._A_csc, A, symmetric=False)
        if q is not None:
            self._apply_vector_update(self._np_q, q)
        if b is not None:
            self._apply_vector_update(self._np_b, b)
        self._push_data()

    # ------------------------------------------------------------------
    # settings and callbacks
    # ------------------------------------------------------------------

    def _rebuild_solve_fn(self):
        self._warm_fn = None
        if self._sparse:
            self._solve_fn = jax.jit(
                build_solve_core(
                    self._layout, self.settings, self._n_int,
                    self._p_is_zero, self._dtype, callback=self._callback,
                    sparse_ctx=self._skkt,
                )
            )
        elif self._callback is None:
            self._solve_fn = _build_solve_fn(
                self._layout, self.settings, self._n_int, self._p_is_zero,
                self._dtype, self._use_pallas,
            )
        else:
            self._solve_fn = jax.jit(
                build_solve_core(
                    self._layout,
                    self.settings,
                    self._n_int,
                    self._p_is_zero,
                    self._dtype,
                    callback=self._callback,
                    use_pallas=self._use_pallas,
                )
            )

    def update_settings(self, settings: DefaultSettings):
        """Replace settings between solves; structure-determining settings
        are immutable (settings.rs:259-335)."""
        settings.validate_as_update(self.settings)
        self.settings = settings
        self._rebuild_solve_fn()

    def set_termination_callback(self, callback):
        """Install a per-iteration termination callback.  The callback
        receives a ``DefaultInfo`` and returns True to stop the solver
        (reference: callbacks.rs, solver.rs:310-314)."""

        def host_cb(snapshot):
            info = DefaultInfo(
                mu=float(snapshot["mu"]),
                step_length=float(snapshot["step_length"]),
                iterations=int(snapshot["iterations"]),
                cost_primal=float(snapshot["cost_primal"]),
                cost_dual=float(snapshot["cost_dual"]),
                res_primal=float(snapshot["res_primal"]),
                res_dual=float(snapshot["res_dual"]),
                gap_abs=float(snapshot["gap_abs"]),
                gap_rel=float(snapshot["gap_rel"]),
                ktratio=float(snapshot["ktratio"]),
            )
            return np.bool_(bool(callback(info)))

        self._callback = host_cb
        self._rebuild_solve_fn()

    def unset_termination_callback(self):
        self._callback = None
        self._rebuild_solve_fn()

    # ------------------------------------------------------------------
    # JSON problem io (reference: json.rs)
    # ------------------------------------------------------------------

    def save_to_file(self, path):
        """Write (P, q, A, b, cones, settings) as reference-format JSON."""
        from . import json_io

        if self._sparse:
            # stay O(nnz): triu P serializes directly; presolve row
            # selection happens on the CSC structure (json.rs:22-96)
            import scipy.sparse as sp

            P = self._P_csc
            A = self._A_csc
            if self._presolver is not None:  # match post-presolve b/cones
                keep = np.where(self._presolver.keep_logical)[0]
                A = A.tocsr()[keep, :].tocsc()
        else:
            P, A = self._np_P, self._np_A
        json_io.save_problem(
            path,
            P,
            self._np_q,
            A,
            self._np_b,
            self._cones_int,
            self.settings,
        )

    @classmethod
    def load_from_file(cls, path, settings: Optional[DefaultSettings] = None,
                       **kwargs):
        """Construct a solver from a reference-format JSON problem file."""
        from . import json_io

        P, q, A, b, cones, s = json_io.load_problem(path, settings)
        return cls(P, q, A, b, cones, s, **kwargs)

    # ------------------------------------------------------------------
    # printing (reference: io/mod.rs print targets, info_print.rs)
    # ------------------------------------------------------------------

    def print_to_stdout(self):
        self._print_stream = sys.stdout
        self._print_buffer = None

    def print_to_file(self, path):
        self._print_stream = open(path, "w")
        self._print_buffer = None

    def print_to_buffer(self):
        self._print_buffer = _io.StringIO()
        self._print_stream = self._print_buffer

    def print_to_stream(self, stream):
        """Route solver output to a caller-supplied writable object
        (reference: io/mod.rs:19-51, the ``Stream`` print-target variant)."""
        if not hasattr(stream, "write"):
            raise TypeError("stream must be a writable object (no .write)")
        self._print_stream = stream
        self._print_buffer = None

    def get_print_buffer(self) -> str:
        if self._print_buffer is None:
            raise ValueError("print_to_buffer() was not enabled")
        return self._print_buffer.getvalue()

    def print_to_sink(self):
        self._print_stream = None
        self._print_buffer = None

    def _print(self, *args, **kwargs):
        if self._print_stream is not None:
            print(*args, file=self._print_stream, **kwargs)

    def _print_report(self, history):  # pragma: no cover - cosmetic
        p = self._print
        p("-------------------------------------------------------------")
        from . import __version__

        p(f"           clarabel_tpu v{__version__}  -  TPU-native conic IPM")
        p("-------------------------------------------------------------")
        L = self._layout
        p(f"problem:  variables n = {self.n}, constraints m = {self.m}")
        p(f"cones:    {list(L.cones)}")
        p(f"settings: dtype = {self._dtype}, device = {self._device}")
        p("iter    pcost        dcost       gap       pres      dres      "
          "k/t       μ        step")
        rows = np.asarray(history)
        for it in range(rows.shape[0]):
            r = rows[it]
            if np.all(np.isnan(r)):
                break
            p(
                f"{it:3d}  {r[0]:+.4e}  {r[1]:+.4e}  {r[3]:.2e}  {r[4]:.2e}"
                f"  {r[5]:.2e}  {r[6]:.2e}  {r[7]:.2e}  {r[8]:.2e}"
            )
        i = self.info
        p("-------------------------------------------------------------")
        p(
            f"status = {i.status.name}, iterations = {i.iterations}, "
            f"obj = {i.cost_primal:.6e}, solve time = {i.solve_time*1e3:.2f} ms"
        )

    def print_timers(self):  # pragma: no cover - cosmetic
        self.timers.print_tree()

    # accessor aliases mirroring the reference Python binding surface
    # (impl_default_py.rs:626-791)
    def get_info(self) -> DefaultInfo:
        return self.info

    def get_solution(self) -> Optional[DefaultSolution]:
        return self.solution

    def get_settings(self) -> DefaultSettings:
        return self.settings

    def profile(self, log_dir: str):
        """Context manager tracing the next solve(s) with ``jax.profiler``
        (device-level timeline; the TPU counterpart of the reference's
        hierarchical timers, SURVEY §5.1)."""
        return jax.profiler.trace(log_dir)
