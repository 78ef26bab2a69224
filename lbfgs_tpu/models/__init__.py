"""Built-in model objectives (the reference's L5 example/test problems)."""

from . import booth, lennard_jones, logistic, rosenbrock

__all__ = ["booth", "lennard_jones", "logistic", "rosenbrock"]
