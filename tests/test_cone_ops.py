"""Cone-operation unit tests: NT-scaling identities and composite-op
consistency (the counterpart of the reference's inline unit-test tier,
e.g. src/algebra/tests, cones/mod.rs:156-183)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import clarabel_tpu as ct
from clarabel_tpu.cones import api, ops
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.statuses import SCALING_PRIMAL_DUAL


def rand_interior(layout, rng):
    """Random strictly interior (s, z) for a zero/NN/SOC layout."""
    z, s = ops.unit_initialization(layout, jnp.float64)
    z = np.array(z)  # writable copies
    s = np.array(s)
    nn = layout.slice_of(api.NONNEGATIVE)
    s[nn] = rng.uniform(0.5, 2.0, nn.stop - nn.start)
    z[nn] = rng.uniform(0.5, 2.0, nn.stop - nn.start)
    soc = layout.slice_of(api.SOC)
    if layout.m_soc:
        t = rng.normal(size=layout.m_soc) * 0.2
        heads = layout.soc_head_idx
        s[soc] = t
        z[soc] = rng.normal(size=layout.m_soc) * 0.2
        # force strict interiority: head > ||tail||
        for arr in (s, z):
            v = arr[soc]
            for k, h in enumerate(heads):
                end = heads[k + 1] if k + 1 < len(heads) else layout.m_soc
                v[h] = np.linalg.norm(v[h + 1 : end]) + rng.uniform(0.5, 1.5)
            arr[soc] = v
    return jnp.asarray(s), jnp.asarray(z)


@pytest.fixture
def soc_layout():
    return ConeLayout(
        api.collapse_cones(
            (
                api.NonnegativeConeT(4),
                api.SecondOrderConeT(3),
                api.SecondOrderConeT(5),
            )
        )
    )


def test_nt_scaling_identities(soc_layout):
    """λ = W z = W⁻ᵀ s and Hs x = WᵀW x (symmetric cone scaling laws)."""
    layout = soc_layout
    rng = np.random.default_rng(0)
    s, z = rand_interior(layout, rng)

    state, ok = ops.update_scaling(
        layout, ops.set_identity_scaling(layout, jnp.float64), s, z, 0.1,
        SCALING_PRIMAL_DUAL,
    )
    assert bool(ok)

    # Hs consistency: dense block vs matrix-free product
    H = np.asarray(ops.hs_dense(layout, state, jnp.float64)[0])
    for _ in range(3):
        x = rng.normal(size=layout.m)
        y1 = np.asarray(ops.mul_hs(layout, state, jnp.asarray(x)))
        y2 = H @ x
        assert np.allclose(y1, y2, atol=1e-10)

    # Hs must be symmetric PSD on the SOC block
    assert np.allclose(H, H.T, atol=1e-12)
    evals = np.linalg.eigvalsh(H[4:, 4:])
    assert evals.min() > 0

    # affine_ds = λ∘λ has head = |λ|² per SOC cone
    ds = np.asarray(ops.affine_ds(layout, state, s))
    lam = np.asarray(state["soc_lam"])
    heads = layout.soc_head_idx
    for k, h in enumerate(heads):
        end = heads[k + 1] if k + 1 < len(heads) else layout.m_soc
        seg = lam[h:end]
        assert abs(ds[4 + h] - seg @ seg) < 1e-10


def test_soc_step_length_boundary(soc_layout):
    """Step length must stop exactly at the cone boundary."""
    layout = soc_layout
    rng = np.random.default_rng(1)
    s, z = rand_interior(layout, rng)
    state, _ = ops.update_scaling(
        layout, ops.set_identity_scaling(layout, jnp.float64), s, z, 0.1,
        SCALING_PRIMAL_DUAL,
    )

    ds = jnp.asarray(rng.normal(size=layout.m))
    dz = jnp.asarray(rng.normal(size=layout.m))
    settings = ct.DefaultSettings()
    alpha = float(
        ops.step_length(layout, state, dz, ds, z, s, settings, jnp.asarray(2.0))
    )
    assert alpha > 0

    # z + αdz and s + αds must still lie (weakly) inside their cones
    for v, dv in ((z, dz), (s, ds)):
        pt = np.asarray(v + alpha * dv)
        assert pt[:4].min() >= -1e-9  # NN part
        for k, h in enumerate(layout.soc_head_idx):
            end = (
                layout.soc_head_idx[k + 1]
                if k + 1 < len(layout.soc_head_idx)
                else layout.m_soc
            )
            blk = pt[4 + h : 4 + end]
            assert blk[0] - np.linalg.norm(blk[1:]) >= -1e-9


def test_margins_and_unit_shift():
    layout = ConeLayout(
        api.collapse_cones((api.ZeroConeT(2), api.NonnegativeConeT(3),
                            api.SecondOrderConeT(3)))
    )
    v = jnp.asarray(np.array([5.0, -1.0, 0.5, -2.0, 1.0, 1.0, 2.0, 0.0]))
    mn, total = ops.margins(layout, v, ops.DUAL)
    # NN slice = [0.5, -2.0, 1.0]: min -2; SOC [1,2,0]: margin 1-2=-1
    assert abs(float(mn) - (-2.0)) < 1e-12
    assert abs(float(total) - (0.5 + 1.0 + 0.0)) < 1e-12

    shifted = ops.scaled_unit_shift(layout, v, 3.0, ops.PRIMAL)
    out = np.asarray(shifted)
    assert np.allclose(out[:2], 0.0)  # zero cone clamps primal
    assert np.allclose(out[2:5], np.asarray(v)[2:5] + 3.0)
    assert abs(out[5] - (1.0 + 3.0)) < 1e-12  # SOC head
    assert abs(out[6] - 2.0) < 1e-12  # SOC tail unchanged


def test_degree_and_collapse():
    cones = (
        api.ZeroConeT(2),
        api.NonnegativeConeT(3),
        api.SecondOrderConeT(1),
        api.NonnegativeConeT(0),
        api.SecondOrderConeT(4),
        api.PSDTriangleConeT(1),
        api.ExponentialConeT(),
    )
    collapsed = api.collapse_cones(cones)
    # NN(3) + SOC(1) merge; PSD(1) becomes NN(1); empties drop
    kinds = [c.kind for c in collapsed]
    assert kinds == [api.ZERO, api.NONNEGATIVE, api.SOC, api.NONNEGATIVE, api.EXP]
    assert collapsed[1].dim == 4
    layout = ConeLayout(collapsed)
    # degree: zero 0 + nn 4 + soc 1 + nn 1 + exp 3
    assert layout.degree == 0 + 4 + 1 + 1 + 3


def test_wright_omega():
    """ω(z) + log(ω(z)) == z (reference: expcone.rs:461-472)."""
    from clarabel_tpu.cones.nonsymmetric import wright_omega

    pts = np.array([1e-7, 1e-5, 1e-3, 1e-1, 1e1, 1e3, 1e5, 1e7, 1e9])
    w = np.asarray(wright_omega(jnp.asarray(pts)))
    err = np.abs(w + np.log(w) - pts) / pts
    assert err.max() < 1e-9


def test_gp_seg_sum_lowers_without_scatter():
    """genpow per-cone sums must lower as matmul contractions, NOT
    segment_sum scatters: the scatter's index-clamp pattern SIGABRTs the
    XLA TPU compiler inside the solver loop's cond (algebraic-simplifier
    'A cycle is detected ... scatter-add'); see nonsymmetric._gp_seg_sum."""
    import jax
    import jax.numpy as jnp

    import clarabel_tpu as ct
    from clarabel_tpu.cones import api
    from clarabel_tpu.cones import nonsymmetric as ns
    from clarabel_tpu.cones.layout import ConeLayout

    layout = ConeLayout(
        api.collapse_cones(
            (ct.GenPowerConeT([0.5, 0.5], 2), ct.GenPowerConeT([0.3, 0.7], 1))
        )
    )
    x = jnp.ones(layout.m_genpow, jnp.float32)
    jaxpr = str(jax.make_jaxpr(lambda v: ns._gp_seg_sum(layout, v))(x))
    assert "scatter" not in jaxpr
    assert "dot_general" in jaxpr
