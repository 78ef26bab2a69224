"""Benchmark harness: L-BFGS iteration throughput on a large Rosenbrock.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: solver iterations/second on extended Rosenbrock (full propagate
steps including the More-Thuente line search, f32, single chip), at the
largest size that comfortably fits.  The reference publishes no timing
numbers (BASELINE.md), so the baseline is this repo's native C++
sequential core — a faithful performance stand-in for the single-threaded
Rust reference — running the same problem on the host CPU.
`vs_baseline` = TPU iters/s over native-CPU iters/s (higher is better).

Extra diagnostic fields are included in the same JSON object; the driver
contract only requires the four keys above.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_jax(n: int, iters: int, dtype=jnp.float32) -> dict:
    from lbfgs_tpu.core import ProblemDef
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.params import LbfgsParams
    from lbfgs_tpu.solver import init_state, propagate

    params = LbfgsParams()
    pdef = ProblemDef(value_and_grad=rosenbrock.value_and_grad)
    x0 = rosenbrock.initial_point(n, dtype=dtype)

    st = jax.jit(lambda x: init_state(pdef, params, x))(x0)
    st = st._replace(k=st.k + 1)  # skip the k==1 bookkeeping step

    step = jax.jit(lambda s: propagate(pdef, params, s), donate_argnums=0)

    # warmup / compile
    st = step(st)
    jax.block_until_ready(st.prob.fx)

    t0 = time.perf_counter()
    for _ in range(iters):
        st = step(st)
    jax.block_until_ready(st.prob.fx)
    dt = time.perf_counter() - t0
    assert np.isfinite(float(st.prob.fx)), "bench diverged"
    return {"iters_per_s": iters / dt, "seconds": dt, "final_fx": float(st.prob.fx)}


def bench_native(n: int, iters: int) -> dict:
    from lbfgs_tpu.native import minimize_native_rosenbrock
    from lbfgs_tpu.params import LbfgsParams

    x0 = np.zeros(n)
    x0[0::2] = -1.2
    x0[1::2] = 1.0
    params = LbfgsParams(max_iterations=iters + 1)  # +1: initial-report iter
    t0 = time.perf_counter()
    rep = minimize_native_rosenbrock(params, x0)
    dt = time.perf_counter() - t0
    real_iters = max(1, rep.niter - 1)
    return {"iters_per_s": real_iters / dt, "seconds": dt, "niter": rep.niter}


def main() -> None:
    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)

    # size: large on an accelerator, moderate on CPU so the bench stays fast
    n = 1 << 25 if on_accel else 1 << 20
    iters = 50 if on_accel else 10
    base_iters = 10

    jx = bench_jax(n, iters)

    # native baseline on a smaller-or-equal size, scaled linearly (the
    # sequential core is strictly O(n) streaming per iteration)
    nb = min(n, 1 << 22)
    nat = bench_native(nb, base_iters)
    native_scaled = nat["iters_per_s"] * (nb / n)

    out = {
        "metric": f"rosenbrock_n{n}_lbfgs_iters_per_s",
        "value": round(jx["iters_per_s"], 3),
        "unit": "iters/s",
        "vs_baseline": round(jx["iters_per_s"] / native_scaled, 3),
        "backend": backend,
        "n": n,
        "timed_iters": iters,
        "native_baseline_iters_per_s_scaled": round(native_scaled, 3),
        "dtype": "float32",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
