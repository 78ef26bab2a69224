"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the standard JAX analog of
"multi-node without a real cluster", SURVEY.md §4) and 64-bit floats for
deterministic-f64 parity with the reference golden values.

Note: this environment may pre-import jax with a TPU plugin via
sitecustomize, so we switch platforms through jax.config (effective until
the first backend initialization) rather than relying on env vars alone.
"""

import os

if os.environ.get("LBFGS_TPU_SMOKE"):
    # accelerator-backend smoke run: keep the real backend and its native
    # dtypes (run as: LBFGS_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py).
    # The axon PJRT plugin rejects host callbacks (UNIMPLEMENTED), so the
    # in-jit ascent-warning debug.callback must stay untraced — the same
    # suppression every bench harness applies.
    os.environ.setdefault("LBFGS_TPU_NO_RUNTIME_WARN", "1")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
