"""ctypes bindings for the native C++ core (``csrc/lbfgs_native.cpp``).

Two uses:
  * ``backend="native"`` host fast path for small problems (fixed
    accelerator dispatch latency dominates under ~10k parameters), and
  * the sequential-f64 golden oracle for iteration-for-iteration parity
    tests against the reference's recorded trajectories
    (tests/test_native_parity.py).

The shared library is built on demand with g++ if missing (no pybind11 in
this environment; plain ctypes over an extern "C" ABI).
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from typing import Callable, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "lbfgs_native.cpp")
_SO = os.path.join(_HERE, "liblbfgs_native.so")


class NativeConfig(ct.Structure):
    _fields_ = [
        ("m", ct.c_int32),
        ("epsilon", ct.c_double),
        ("max_iterations", ct.c_int64),
        ("max_evaluations", ct.c_int64),
        ("ls_algo", ct.c_int32),
        ("ftol", ct.c_double),
        ("gtol", ct.c_double),
        ("xtol", ct.c_double),
        ("min_step", ct.c_double),
        ("max_step", ct.c_double),
        ("max_linesearch", ct.c_int32),
        ("gradient_only", ct.c_int32),
        ("owlqn_enabled", ct.c_int32),
        ("owlqn_c", ct.c_double),
        ("owlqn_start", ct.c_int64),
        ("owlqn_end", ct.c_int64),
        ("initial_inverse_hessian", ct.c_double),
        ("max_step_size", ct.c_double),
        ("damping", ct.c_int32),
        ("constrain_step_size", ct.c_int32),
    ]


class NativeReport(ct.Structure):
    _fields_ = [
        ("fx", ct.c_double),
        ("xnorm", ct.c_double),
        ("gnorm", ct.c_double),
        ("neval", ct.c_int64),
        ("niter", ct.c_int64),
        ("status", ct.c_int32),
    ]


_EVAL_FN = ct.CFUNCTYPE(
    ct.c_double,
    ct.POINTER(ct.c_double),
    ct.POINTER(ct.c_double),
    ct.c_int64,
    ct.c_void_p,
    ct.POINTER(ct.c_int32),
)
_PROGRESS_FN = ct.CFUNCTYPE(
    ct.c_int32,
    ct.c_int64,
    ct.c_double,
    ct.c_double,
    ct.c_double,
    ct.c_double,
    ct.c_int64,
    ct.c_int64,
    ct.c_void_p,
)

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC], check=True
    )


def load():
    """Load (building if necessary) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build()
    lib = ct.CDLL(_SO)
    lib.lbfgs_native_minimize.restype = ct.c_int32
    lib.lbfgs_native_minimize.argtypes = [
        ct.c_int64,
        ct.POINTER(ct.c_double),
        _EVAL_FN,
        ct.c_void_p,
        _PROGRESS_FN,
        ct.c_void_p,
        ct.POINTER(NativeConfig),
        ct.POINTER(NativeReport),
    ]
    lib.lbfgs_native_default_config.argtypes = [ct.POINTER(NativeConfig)]
    lib.lbfgs_native_abi_version.restype = ct.c_int32
    assert lib.lbfgs_native_abi_version() == 1
    lib.lbfgs_native_rosenbrock_eval.restype = ct.c_double
    _lib = lib
    return lib


_LS_ALGO_CODES = {
    "MoreThuente": 0,
    "BacktrackingArmijo": 1,
    "BacktrackingWolfe": 2,
    "BacktrackingStrongWolfe": 3,
}


def config_from_params(params) -> NativeConfig:
    """Translate an ``LbfgsParams`` into the native config struct."""
    lib = load()
    cfg = NativeConfig()
    lib.lbfgs_native_default_config(ct.byref(cfg))
    cfg.m = params.m
    cfg.epsilon = params.epsilon
    cfg.max_iterations = params.max_iterations
    cfg.max_evaluations = params.max_evaluations
    ls = params.linesearch
    cfg.ls_algo = _LS_ALGO_CODES[ls.algorithm]
    cfg.ftol = ls.ftol
    cfg.gtol = ls.gtol
    cfg.xtol = ls.xtol
    cfg.min_step = ls.min_step
    cfg.max_step = ls.max_step
    cfg.max_linesearch = ls.max_linesearch
    cfg.gradient_only = int(ls.gradient_only)
    ow = params.orthantwise
    if ow is not None:
        cfg.owlqn_enabled = 1
        cfg.owlqn_c = ow.c
        cfg.owlqn_start = ow.start
        cfg.owlqn_end = -1 if ow.end is None else ow.end
    cfg.initial_inverse_hessian = params.initial_inverse_hessian
    cfg.max_step_size = params.max_step_size
    cfg.damping = int(params.damping)
    cfg.constrain_step_size = int(params.constrain_step_size)
    return cfg


def minimize_native_rosenbrock(params, x0: np.ndarray):
    """Run the native solver with the built-in C++ Rosenbrock evaluator
    (no Python-callback overhead); the reference-equivalent CPU baseline
    for benchmarks."""
    from ..core import Report
    from ..status import LbfgsError, Status, is_fatal

    lib = load()
    # np.array copies: the core iterates x in place and must never alias
    # the caller's buffer (jax CPU arrays view zero-copy through asarray)
    x = np.array(x0, dtype=np.float64)
    n = x.shape[0]
    eval_cb = ct.cast(lib.lbfgs_native_rosenbrock_eval, _EVAL_FN)
    cfg = config_from_params(params)
    rep = NativeReport()
    lib.lbfgs_native_minimize(
        n,
        x.ctypes.data_as(ct.POINTER(ct.c_double)),
        eval_cb,
        None,
        ct.cast(None, _PROGRESS_FN),
        None,
        ct.byref(cfg),
        ct.byref(rep),
    )
    if is_fatal(rep.status):
        raise LbfgsError(Status(rep.status))
    return Report(
        fx=rep.fx, xnorm=rep.xnorm, gnorm=rep.gnorm, neval=rep.neval,
        x=x, niter=rep.niter, status=rep.status,
    )


def minimize_native(
    params,
    x0: np.ndarray,
    evaluate: Callable[[np.ndarray, np.ndarray], float],
    progress: Optional[Callable] = None,
):
    """Run the native sequential solver.

    ``evaluate(x, gx) -> fx`` is the reference-style mutating closure.
    ``progress(Progress) -> bool`` cancels on True.  Returns a ``Report``.
    """
    from ..core import Progress, Report
    from ..status import LbfgsError, Status, is_fatal

    ls = params.linesearch
    if ls.algorithm == "MoreThuente" and ls.gradient_only and params.orthantwise is None:
        raise ValueError(
            "Gradient only optimization is incompatible with MoreThuente line search."
        )
    lib = load()
    # np.array copies: the core iterates x in place and must never alias
    # the caller's buffer (jax CPU arrays view zero-copy through asarray)
    x = np.array(x0, dtype=np.float64)
    n = x.shape[0]

    @_EVAL_FN
    def eval_cb(xp, gp, nn, user, fail):
        xv = np.ctypeslib.as_array(xp, shape=(nn,))
        gv = np.ctypeslib.as_array(gp, shape=(nn,))
        try:
            return float(evaluate(xv, gv))
        except Exception:
            fail[0] = 1
            return float("nan")

    if progress is not None:

        @_PROGRESS_FN
        def progress_cb(niter, fx, xnorm, gnorm, step, neval, ncall, user):
            p = Progress(
                x=x, gx=None, fx=fx, xnorm=xnorm, gnorm=gnorm,
                step=step, niter=niter, neval=neval, ncall=ncall,
            )
            return 1 if progress(p) else 0

    else:
        progress_cb = ct.cast(None, _PROGRESS_FN)

    cfg = config_from_params(params)
    rep = NativeReport()
    lib.lbfgs_native_minimize(
        n,
        x.ctypes.data_as(ct.POINTER(ct.c_double)),
        eval_cb,
        None,
        progress_cb,
        None,
        ct.byref(cfg),
        ct.byref(rep),
    )
    if is_fatal(rep.status):
        raise LbfgsError(Status(rep.status))
    return Report(
        fx=rep.fx,
        xnorm=rep.xnorm,
        gnorm=rep.gnorm,
        neval=rep.neval,
        x=x,
        niter=rep.niter,
        status=rep.status,
    )
