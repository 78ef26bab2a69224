"""Profiler-trace attribution for the bench configs (VERDICT round-3 #2).

Runs the bench.py workload under ``jax.profiler`` (the axon PJRT plugin
captures a REAL device lane — verified: per-kernel TPU events with the
solver's ``jax.named_scope`` labels) and prints a per-phase device-time
table: ms/iter for each labeled span plus the whole-iteration device
time, which needs no bytes model.

Usage (TPU):
  python bench_trace.py                  # n=2^24
  BENCH_N=100000000 python bench_trace.py
Output: one JSON line per phase + a summary line; the raw trace stays
under --logdir (default /tmp/lbfgs_trace) for xprof/tensorboard.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os

os.environ.setdefault("LBFGS_TPU_NO_RUNTIME_WARN", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def run_and_trace(n: int, iters: int, logdir: str, owlqn: bool = False) -> int:
    from lbfgs_tpu.core import ProblemDef
    from lbfgs_tpu.minimize import _run_while
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams, LineSearchAlgorithm
    from lbfgs_tpu.solver import init_state
    from lbfgs_tpu.utils.profiling import trace

    ow = Orthantwise(c=1.0, start=0, end=n - 1) if owlqn else None
    params = LbfgsParams(
        max_iterations=iters + 1, epsilon=0.0, orthantwise=ow,
        history_dtype="bfloat16" if jax.default_backend() != "cpu" else None,
        constrain_step_size=bool(os.environ.get("BENCH_CONSTRAIN")),
    )
    if owlqn:
        params = params.replace_ls(
            algorithm=LineSearchAlgorithm.BacktrackingArmijo
        )
    pdef = ProblemDef(value_and_grad=rosenbrock.value_and_grad, owlqn=ow)
    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)
    run = jax.jit(
        lambda x: _run_while(pdef, params, init_state(pdef, params, x, lean=True))
    )
    st = run(x0)
    float(st.prob.fx)  # warm + sync through the transport
    with trace(logdir):
        st = run(x0)
        float(st.prob.fx)
    return int(st.k) - 1


def summarize(logdir: str, iters: int) -> None:
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace written under {logdir}"
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    # device lane = the pid whose process_name is a TPU/device
    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") in dev_pids]
    assert ev, "no device events captured (host-only trace?)"
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        tot[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    tmin = min(e["ts"] for e in ev)
    tmax = max(e["ts"] + e.get("dur", 0) for e in ev)
    span_ms = (tmax - tmin) / 1e3
    for name, d in tot.most_common(14):
        print(json.dumps({
            "phase": name,
            "ms_total": round(d / 1e3, 2),
            "calls": cnt[name],
            "ms_per_iter": round(d / 1e3 / iters, 4),
        }))
    print(json.dumps({
        "metric": "device_span_ms_per_iter",
        "value": round(span_ms / iters, 4),
        "iters": iters,
        "device_span_ms": round(span_ms, 1),
        "trace": paths[-1],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/lbfgs_trace")
    ap.add_argument("--iters", type=int,
                    default=int(os.environ.get("BENCH_ITERS", "100")))
    ap.add_argument("--owlqn", action="store_true",
                    help="trace the OWL-QN config (Armijo + OW kernels)")
    args = ap.parse_args()
    n = int(os.environ.get("BENCH_N", 1 << 24))
    iters = run_and_trace(n, args.iters, args.logdir, owlqn=args.owlqn)
    print(json.dumps({"n": n, "timed_iters": iters}))
    summarize(args.logdir, iters)


if __name__ == "__main__":
    main()
