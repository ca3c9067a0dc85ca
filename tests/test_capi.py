"""C ABI tests (include/clarabel_tpu.h + native/capi.cpp).

Loads libclarabel_tpu_c.so with ctypes inside this process (the shim
detects the live interpreter and skips embedding) and drives the
reference's basic QP through the C surface — the analog of the
reference's Julia-side round trip (reference: src/julia/interface.rs:55-130,
tests/basic_qp.rs:110-116).
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest
import scipy.sparse as sp

_NATIVE = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB = os.path.join(_NATIVE, "libclarabel_tpu_c.so")


class _Cone(ctypes.Structure):
    _fields_ = [
        ("tag", ctypes.c_uint8),
        ("dim", ctypes.c_int64),
        ("power", ctypes.c_double),
        ("alpha", ctypes.POINTER(ctypes.c_double)),
        ("nalpha", ctypes.c_int64),
    ]


class _Info(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int32),
        ("iterations", ctypes.c_int32),
        ("obj_val", ctypes.c_double),
        ("obj_val_dual", ctypes.c_double),
        ("solve_time", ctypes.c_double),
        ("r_prim", ctypes.c_double),
        ("r_dual", ctypes.c_double),
    ]


# int32_t (*)(const clarabel_info *info, void *user_data)
_CB = ctypes.CFUNCTYPE(ctypes.c_int32, ctypes.POINTER(_Info),
                       ctypes.c_void_p)


@pytest.fixture(scope="module")
def lib():
    try:
        subprocess.run(["make", "-C", _NATIVE, "capi"], check=True,
                       capture_output=True, timeout=180)
    except Exception:
        if not os.path.exists(_LIB):
            pytest.skip("no C toolchain for the C ABI")
    L = ctypes.CDLL(_LIB)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    L.clarabel_new.restype = ctypes.c_void_p
    L.clarabel_new.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p, f64p,
        i64p, i64p, f64p, f64p, ctypes.POINTER(_Cone), ctypes.c_int64,
        ctypes.c_char_p,
    ]
    L.clarabel_solve.restype = ctypes.c_int32
    L.clarabel_solve.argtypes = [
        ctypes.c_void_p, f64p, f64p, f64p, ctypes.POINTER(_Info)
    ]
    L.clarabel_update.restype = ctypes.c_int32
    L.clarabel_update.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, f64p, ctypes.c_int64
    ]
    L.clarabel_free.argtypes = [ctypes.c_void_p]
    L.clarabel_last_error.restype = ctypes.c_char_p
    L.clarabel_set_termination_callback.restype = ctypes.c_int32
    L.clarabel_set_termination_callback.argtypes = [
        ctypes.c_void_p, _CB, ctypes.c_void_p
    ]
    L.clarabel_iteration_history_len.restype = ctypes.c_int64
    L.clarabel_iteration_history_len.argtypes = [ctypes.c_void_p]
    L.clarabel_iteration_history.restype = ctypes.c_int64
    L.clarabel_iteration_history.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_int64
    ]
    return L


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _csc(M):
    C = sp.csc_matrix(M)
    C.sort_indices()
    return (np.asarray(C.indptr, np.int64), np.asarray(C.indices, np.int64),
            np.asarray(C.data, np.float64))


def _basic_qp(lib, settings=b'{"verbose": false}'):
    # reference tests/basic_qp.rs feasible problem (same data as
    # tests/test_basic_qp.py:qp_data)
    P = np.array([[4.0, 1.0], [0.0, 2.0]])  # upper triangle
    q = np.array([1.0, 1.0])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A1, A1])
    b = np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7])
    Pp, Pi, Px = _csc(P)
    Ap, Ai, Ax = _csc(A)
    cones = (_Cone * 2)(_Cone(1, 3, 0.0, None, 0), _Cone(1, 3, 0.0, None, 0))
    h = lib.clarabel_new(2, 6, _i64p(Pp), _i64p(Pi), _f64p(Px), _f64p(q),
                         _i64p(Ap), _i64p(Ai), _f64p(Ax), _f64p(b),
                         cones, 2, settings)
    assert h, lib.clarabel_last_error().decode()
    return h


def test_capi_basic_qp(lib):
    h = _basic_qp(lib)
    x = np.zeros(2)
    z = np.zeros(6)
    s = np.zeros(6)
    info = _Info()
    status = lib.clarabel_solve(h, _f64p(x), _f64p(z), _f64p(s),
                                ctypes.byref(info))
    assert status == 1, lib.clarabel_last_error().decode()  # Solved
    # reference oracle: obj = 1.88, x = (0.3, 0.7)  (basic_qp.rs:110-116)
    assert abs(info.obj_val - 1.88) < 1e-6
    np.testing.assert_allclose(x, [0.3, 0.7], atol=1e-6)
    assert info.iterations > 0
    lib.clarabel_free(h)


def test_capi_update_and_resolve(lib):
    h = _basic_qp(lib)
    info = _Info()
    assert lib.clarabel_solve(h, None, None, None, ctypes.byref(info)) == 1
    # update b (data_updating.rs form): loosen the box
    b2 = np.array([-1.0, 0.0, 0.0, 1.0, 0.9, 0.9])
    assert lib.clarabel_update(h, b"b", _f64p(b2), 6) == 0
    x = np.zeros(2)
    assert lib.clarabel_solve(h, _f64p(x), None, None,
                              ctypes.byref(info)) == 1
    assert info.obj_val < 1.88 + 1e-9
    lib.clarabel_free(h)


def test_capi_settings_json(lib):
    h = _basic_qp(lib, settings=b'{"max_iter": 1, "verbose": false}')
    info = _Info()
    status = lib.clarabel_solve(h, None, None, None, ctypes.byref(info))
    assert status == 7  # MaxIterations
    lib.clarabel_free(h)


def test_capi_error_reporting(lib):
    # mismatched cone dims must fail cleanly with a message, not crash
    P = np.eye(2)
    q = np.zeros(2)
    A = np.eye(2)
    b = np.zeros(2)
    Pp, Pi, Px = _csc(np.triu(P))
    Ap, Ai, Ax = _csc(A)
    cones = (_Cone * 1)(_Cone(1, 7, 0.0, None, 0))  # wrong total dim
    h = lib.clarabel_new(2, 2, _i64p(Pp), _i64p(Pi), _f64p(Px), _f64p(q),
                         _i64p(Ap), _i64p(Ai), _f64p(Ax), _f64p(b),
                         cones, 1, b"{}")
    assert not h
    assert lib.clarabel_last_error()


def test_capi_standalone_embedding():
    """Compile and run a real C program against the library — the
    reference's 'thin C shim over the native core' usage (no Python
    process anywhere in the caller)."""
    exe = os.path.join(_NATIVE, "example_capi_test")
    src = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "examples", "example_capi.c")
    try:
        subprocess.run(
            ["gcc", "-O2", "-I" + os.path.join(os.path.dirname(_NATIVE),
                                               "include"),
             src, "-o", exe, "-L" + _NATIVE, "-lclarabel_tpu_c",
             "-Wl,-rpath," + _NATIVE],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build standalone C example: {e}")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)  # standalone: only the compiled-in root
    out = subprocess.run([exe], capture_output=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    assert b"status=1 obj=1.88" in out.stdout


def test_capi_termination_callback(lib):
    """Cancel a solve mid-run through the C fn-ptr callback and observe
    CALLBACK_TERMINATED (reference: callbacks.rs:7-97 — the C callback
    with user data, checked each iteration)."""
    h = _basic_qp(lib)
    seen = []

    @_CB
    def stop_after_two(info_p, user_data):
        info = info_p.contents
        seen.append((info.iterations, info.status, info.solve_time))
        return 1 if info.iterations >= 2 else 0

    assert lib.clarabel_set_termination_callback(h, stop_after_two, None) == 0
    info = _Info()
    status = lib.clarabel_solve(h, None, None, None, ctypes.byref(info))
    assert status == 11, lib.clarabel_last_error().decode()  # CallbackTerminated
    assert info.status == 11
    # the callback saw in-progress snapshots: UNSOLVED status, iteration
    # counter advancing, elapsed time monotone
    assert seen and seen[-1][0] >= 2
    assert all(st == 0 for _, st, _ in seen)
    assert all(b[2] >= a[2] for a, b in zip(seen, seen[1:]))

    # clearing the callback restores the normal path
    assert lib.clarabel_set_termination_callback(
        h, ctypes.cast(None, _CB), None) == 0
    status = lib.clarabel_solve(h, None, None, None, ctypes.byref(info))
    assert status == 1

    # iteration history surface: full solve recorded > 2 rows, each row
    # 9 doubles matching the info scalars
    nrows = lib.clarabel_iteration_history_len(h)
    assert nrows > 2
    buf = np.zeros((nrows, 9))
    got = lib.clarabel_iteration_history(h, _f64p(buf), nrows)
    assert got == nrows
    assert np.all(np.isfinite(buf[:got]))
    lib.clarabel_free(h)


def test_capi_genpow_alpha_marshalling(lib):
    """GenPow cones cross the C ABI with an alpha vector (the tagged-union
    vec field, reference src/julia/types.rs ConeDataJLRS) — the same
    program as the sparse-path genpow case, solved through C."""
    P = np.zeros((4, 4))
    q = np.array([0.0, 0.0, -1.0, 0.0])
    A = np.vstack([-np.eye(4),
                   [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 0, 1.0]]])
    b = np.array([0, 0, 0, 0, 1.0, 1.0, 0.5])
    Pp, Pi, Px = _csc(np.triu(P))
    Ap, Ai, Ax = _csc(A)
    alpha = np.array([0.5, 0.5])
    cones = (_Cone * 2)(
        _Cone(5, 2, 0.0, _f64p(alpha), 2),   # GenPow(alpha=[.5,.5], dim2=2)
        _Cone(0, 3, 0.0, None, 0),           # Zero(3)
    )
    h = lib.clarabel_new(4, 7, _i64p(Pp), _i64p(Pi), _f64p(Px), _f64p(q),
                         _i64p(Ap), _i64p(Ai), _f64p(Ax), _f64p(b),
                         cones, 2, b'{"verbose": false}')
    assert h, lib.clarabel_last_error().decode()
    x = np.zeros(4)
    info = _Info()
    status = lib.clarabel_solve(h, _f64p(x), None, None, ctypes.byref(info))
    assert status == 1
    # max x3 s.t. (1,1,(x3,0.5)) in GenPow(.5,.5): x3 = sqrt(1-0.25)
    assert abs(info.obj_val + np.sqrt(0.75)) < 1e-6
    lib.clarabel_free(h)
