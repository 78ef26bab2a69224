"""Status lattice for the jitted solver.

The reference mixes three failure styles — recoverable line-search errors
(reverted and swallowed, ``src/line.rs:213-220``), fatal ``ensure!`` errors
(``src/lbfgs.rs:646,655``), and asserts (``src/orthantwise.rs:160``).  Under
``jit`` nothing can raise, so every outcome is an integer status threaded
through the ``lax.while_loop`` carries.  The host drivers translate fatal
statuses back into Python exceptions with reference-equivalent messages.
"""

from __future__ import annotations

import enum


class Status(enum.IntEnum):
    # -- non-error solver states ------------------------------------------
    RUNNING = 0
    CONVERGED = 1          # scaled gnorm test (src/lbfgs.rs:714-722)
    MAX_ITERATIONS = 2     # src/lbfgs.rs:726-735
    MAX_EVALUATIONS = 3    # src/lbfgs.rs:739-748
    CANCELLED = 4          # progress callback returned True (src/lbfgs.rs:412-416)

    # -- line-search internal errors (recoverable: revert + ncall=0,
    #    per src/line.rs:213-220) -----------------------------------------
    LS_ROUNDING = 10          # src/line.rs:292-298
    LS_XTOL = 11              # src/line.rs:300-302
    LS_MAX_STEP = 12          # src/line.rs:305-307 & validate_step
    LS_MIN_STEP = 13          # src/line.rs:310-313 & validate_step
    LS_OUT_OF_INTERVAL = 14   # mcstep, src/line.rs:470-473
    LS_INCREASE_GRADIENT = 15 # mcstep, src/line.rs:474-476
    LS_INVALID_INTERVAL = 16  # mcstep, src/line.rs:477-480

    # -- fatal solver errors ----------------------------------------------
    ERR_X_NOT_CHANGED = 20    # src/lbfgs.rs:646
    ERR_G_NOT_CHANGED = 21    # src/lbfgs.rs:655
    ERR_INVALID_DNORM = 22    # src/lbfgs.rs:544
    ERR_OWLQN_ZERO_DIRECTION = 23  # src/orthantwise.rs:160
    ERR_NEGATIVE_STEP = 24    # src/line.rs:198-201
    ERR_EVAL_FAILED = 30      # objective raised (host/native backends)


FATAL_MESSAGES = {
    Status.ERR_X_NOT_CHANGED: "x not changed",
    Status.ERR_G_NOT_CHANGED: "gx not changed",
    Status.ERR_INVALID_DNORM: "invalid norm value for search direction",
    Status.ERR_OWLQN_ZERO_DIRECTION: "invalid direction vector after constraints",
    Status.ERR_NEGATIVE_STEP: "A logic error (negative line-search step) occurred.",
    Status.ERR_EVAL_FAILED: "objective evaluation failed",
}

LS_ERROR_MESSAGES = {
    Status.LS_ROUNDING: (
        "A rounding error occurred; alternatively, no line-search step "
        "satisfies the sufficient decrease and curvature conditions."
    ),
    Status.LS_XTOL: "Relative width of the interval of uncertainty is at most xtol.",
    Status.LS_MAX_STEP: "The line-search step became larger than LineSearch::max_step.",
    Status.LS_MIN_STEP: "The line-search step became smaller than LineSearch::min_step.",
    Status.LS_OUT_OF_INTERVAL: "The line-search step went out of the interval of uncertainty.",
    Status.LS_INCREASE_GRADIENT: "The current search direction increases the objective function value.",
    Status.LS_INVALID_INTERVAL: (
        "A logic error occurred; alternatively, the interval of uncertainty became too small."
    ),
}


def is_ls_error(code: int) -> bool:
    return 10 <= code < 20


def is_fatal(code: int) -> bool:
    return code >= 20


class LbfgsError(RuntimeError):
    """Fatal optimization failure (reference: ``anyhow::Error`` bubbling out)."""

    def __init__(self, status: Status, detail: str = ""):
        self.status = Status(status)
        msg = FATAL_MESSAGES.get(self.status, self.status.name)
        super().__init__(f"{msg}{(' ' + detail) if detail else ''}")
