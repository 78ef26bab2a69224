"""BLAS-1 style vector primitives for the TPU L-BFGS framework.

TPU-native equivalent of the reference math backend (``src/math.rs:4-82`` in
ybyygu/rust-lbfgs): the reference implements 8 sequential scalar ops over
``[f64]`` slices; here every op is a ``jnp`` expression that XLA fuses and —
under ``jax.sharding`` — lowers to shard-local compute plus a single
``psum``-style collective for the reductions (``dot``, ``norm2``).

These wrappers exist for three reasons:
  * a single place to pin reduction precision/semantics,
  * parity documentation against the reference op set,
  * a seam where Pallas kernels can be swapped in (see ``ops/fused.py``).

Functional style: every op returns a new array (XLA buffer donation makes
this in-place at runtime); the reference's in-place mutation has no other
TPU-native analog.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import Array

#: matmul/dot precision for the solver's reductions.  "highest" gives
#: f64-grade accuracy semantics on all backends; on TPU f32 inputs it
#: forces multi-pass emulation.  Since every reduction here contracts a
#: HUGE axis into a tiny one (n -> m scalars), plain f32 accumulation is
#: accurate to ~sqrt(n)*eps relative and "default" is the right TPU
#: setting; override with LBFGS_TPU_PRECISION=highest for bitwise-stable
#: parity work.
PRECISION = os.environ.get("LBFGS_TPU_PRECISION", "default")


def axpy(y: Array, x: Array, c) -> Array:
    """y + c*x  (reference ``vecadd``, src/math.rs:33-37)."""
    return y + c * x


def dot(x: Array, y: Array) -> Array:
    """x . y  (reference ``vecdot``, src/math.rs:40-42).

    Under a sharded layout this lowers to a shard-local partial reduce and
    one all-reduce over the vector axis.
    """
    return jnp.dot(x, y, precision=PRECISION)


def scale(y: Array, c) -> Array:
    """c*y  (reference ``vecscale``, src/math.rs:45-49)."""
    return y * c


def copy(x: Array) -> Array:
    """identity; functional stand-in for ``veccpy`` (src/math.rs:52-56)."""
    return x


def ncopy(x: Array) -> Array:
    """-x  (reference ``vecncpy``, src/math.rs:59-63)."""
    return -x


def diff(x: Array, y: Array) -> Array:
    """x - y  (reference ``vecdiff``, src/math.rs:66-70)."""
    return x - y


def norm2(x: Array) -> Array:
    """||x||_2  (reference ``vec2norm``, src/math.rs:73-76)."""
    return jnp.sqrt(dot(x, x))


def norm2inv(x: Array) -> Array:
    """1/||x||_2  (reference ``vec2norminv``, src/math.rs:79-81)."""
    return 1.0 / norm2(x)
