"""Callbacks, JSON IO, print streams, settings updates, dimension checks
(reference: tests/callbacks.rs, json_io.rs, print_streams.rs,
api_dimension_checks.rs)."""

import os

import numpy as np
import pytest

import clarabel_tpu as ct


def tiny_qp():
    return (
        np.eye(1),
        np.zeros(1),
        np.eye(1),
        np.ones(1),
        [ct.NonnegativeConeT(1)],
    )


def test_termination_callback():
    P, q, A, b, cones = tiny_qp()
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))

    # stop after 3 iterations (reference: callbacks.rs callback_r)
    solver.set_termination_callback(lambda info: info.iterations >= 3)
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.CallbackTerminated
    assert sol.iterations <= 4

    # remove the callback; solves to completion
    solver.unset_termination_callback()
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved


def test_callback_with_state():
    P, q, A, b, cones = tiny_qp()
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))

    calls = []
    solver.set_termination_callback(lambda info: (calls.append(1), len(calls) >= 2)[1])
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.CallbackTerminated
    assert len(calls) == 2


def test_json_roundtrip(tmp_path):
    # reference: tests/json_io.rs
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A1, A1])
    b = np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7])
    cones = [ct.NonnegativeConeT(3), ct.NonnegativeConeT(3)]
    settings = ct.DefaultSettings(verbose=False, presolve_enable=False)

    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    s1 = solver.solve()

    path = tmp_path / "problem.json"
    solver.save_to_file(path)

    solver2 = ct.DefaultSolver.load_from_file(path)
    s2 = solver2.solve()
    assert s1.status == s2.status
    assert np.allclose(s1.x, s2.x, atol=1e-9)

    # settings override on load
    solver3 = ct.DefaultSolver.load_from_file(
        path, ct.DefaultSettings(verbose=False, max_iter=1)
    )
    s3 = solver3.solve()
    assert s3.status == ct.SolverStatus.MaxIterations


def test_load_reference_problem_file():
    # wire-format compatibility: load a JSON problem written by the
    # reference solver (hs35 QP)
    ref = "/root/reference/examples/data/hs35.json"
    if not os.path.exists(ref):
        pytest.skip("reference data file not available")
    solver = ct.DefaultSolver.load_from_file(
        ref, ct.DefaultSettings(verbose=False)
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    # known optimum of HS35: obj = 1/9 + offset; check consistency instead
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8


def test_print_streams(capsys):
    # reference: tests/print_streams.rs
    P, q, A, b, cones = tiny_qp()
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=True))

    solver.print_to_buffer()
    solver.solve()
    out = solver.get_print_buffer()
    assert "clarabel_tpu" in out and "Solved" in out

    # sink: no output
    solver.print_to_sink()
    solver.solve()

    # stdout
    solver.print_to_stdout()
    solver.solve()
    captured = capsys.readouterr()
    assert "Solved" in captured.out


def test_print_to_stream():
    # reference: io/mod.rs Stream variant — any user-supplied writable
    import io

    P, q, A, b, cones = tiny_qp()
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=True))

    class Tee(io.StringIO):
        pass

    stream = Tee()
    solver.print_to_stream(stream)
    solver.solve()
    assert "Solved" in stream.getvalue()

    with pytest.raises(TypeError):
        solver.print_to_stream(42)


def test_print_to_file(tmp_path):
    P, q, A, b, cones = tiny_qp()
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=True))
    path = tmp_path / "log.txt"
    solver.print_to_file(str(path))
    solver.solve()
    solver._print_stream.flush()
    assert "Solved" in path.read_text()


def test_update_settings():
    P, q, A, b, cones = tiny_qp()
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    solver.update_settings(ct.DefaultSettings(verbose=False, max_iter=1))
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.MaxIterations

    with pytest.raises(ct.SettingsError):
        solver.update_settings(
            ct.DefaultSettings(verbose=False, presolve_enable=False)
        )


def test_dimension_checks():
    # reference: tests/api_dimension_checks.rs
    P, q, A, b, cones = tiny_qp()
    with pytest.raises(ValueError):
        ct.DefaultSolver(np.eye(2), q, A, b, cones)
    with pytest.raises(ValueError):
        ct.DefaultSolver(P, np.zeros(2), A, b, cones)
    with pytest.raises(ValueError):
        ct.DefaultSolver(P, q, np.eye(2), b, cones)
    with pytest.raises(ValueError):
        ct.DefaultSolver(P, q, A, np.ones(2), cones)
    with pytest.raises(ValueError):
        ct.DefaultSolver(P, q, A, b, [ct.NonnegativeConeT(2)])


def test_time_limit():
    # a poorly scaled problem with an instant limit stops with MaxTime
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A1, A1])
    A[0, 0] = 1e15
    q = np.array([1.0, 1.0])
    b = np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7])
    cones = [ct.NonnegativeConeT(6)]
    solver = ct.DefaultSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False, time_limit=1e-6)
    )
    assert solver.solve().status == ct.SolverStatus.MaxTime

    # generous limit does not interfere
    solver2 = ct.DefaultSolver(
        np.eye(1), [0.0], np.eye(1), [1.0], [ct.NonnegativeConeT(1)],
        ct.DefaultSettings(verbose=False, time_limit=60.0),
    )
    assert solver2.solve().status == ct.SolverStatus.Solved


def test_warm_start():
    # parametric re-solve: warm starting from the previous solution should
    # converge in fewer iterations than a cold start
    rng = np.random.default_rng(0)
    n = 8
    M = rng.normal(size=(n, n)) / np.sqrt(n)
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.ones(2 * n)
    cones = [ct.NonnegativeConeT(2 * n)]
    settings = ct.DefaultSettings(verbose=False, presolve_enable=False)

    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    sol_cold = solver.solve()
    assert sol_cold.status == ct.SolverStatus.Solved

    # perturb q slightly and warm start from the previous solution
    solver.update_q(q + 0.01 * rng.normal(size=n))
    warm = solver.solve(warm_start=sol_cold)
    cold = solver.solve()
    assert warm.status == ct.SolverStatus.Solved
    assert np.allclose(warm.x, cold.x, atol=1e-6)
    assert warm.iterations <= cold.iterations


def test_warm_start_cuts_iterations():
    """The warm-start interiority shift uses a small floor (loop.
    _shift_to_cone_interior): restarting a QP from its own solution must
    converge in strictly fewer iterations than the cold solve."""
    rng = np.random.default_rng(7)
    n = 60
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.normal(size=n)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.ones(2 * n)
    cones = [ct.NonnegativeConeT(2 * n)]
    solver = ct.DefaultSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False)
    )
    cold = solver.solve()
    assert cold.status == ct.SolverStatus.Solved
    warm = solver.solve(warm_start=cold)
    assert warm.status == ct.SolverStatus.Solved
    assert warm.iterations < cold.iterations
    assert warm.obj_val == pytest.approx(cold.obj_val, abs=1e-7)

    # MPC-style: perturbed objective re-solve still benefits
    solver2 = ct.DefaultSolver(
        P, q * 1.02, A, b, cones, ct.DefaultSettings(verbose=False)
    )
    warm2 = solver2.solve(warm_start=cold)
    cold2 = solver2.solve()
    assert warm2.status == ct.SolverStatus.Solved
    assert warm2.iterations < cold2.iterations
