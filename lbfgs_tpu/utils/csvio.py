"""R-style CSV loading for the OWL-QN regression fixtures.

Equivalent of the reference test loader (``tests/owlqn.rs:66-83``): skip the
header row and the first (row-name) column, parse the rest as f64.
"""

from __future__ import annotations

import numpy as np


def read_r_csv(path: str) -> np.ndarray:
    """Read an R ``write.csv`` file: drop header row and first column."""
    rows = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            cols = line.strip().split(",")[1:]
            rows.append([float(c.strip('"')) for c in cols])
    return np.asarray(rows, dtype=np.float64)
