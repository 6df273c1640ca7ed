"""Keypoint visualization palette.

The reference draws random pastel colors and greedily keeps the candidate
furthest (L1) from all chosen ones (reference utils/model.py:13-39, itself
adapted from the IMM codebase). Same greedy max-min-distance idea here, but
seeded and vectorized, so palettes are reproducible across runs.
"""

from __future__ import annotations

import numpy as np


def get_n_colors(n: int, pastel_factor: float = 0.0, seed: int = 0) -> np.ndarray:
    """Return [n, 3] float colors in [0, 1]."""
    rng = np.random.default_rng(seed)
    colors = np.empty((n, 3), np.float64)
    for i in range(n):
        cand = (rng.uniform(0, 1, (100, 3)) + pastel_factor) / (1.0 + pastel_factor)
        if i == 0:
            colors[0] = cand[0]
            continue
        dists = np.abs(cand[:, None, :] - colors[None, :i, :]).sum(-1).min(axis=1)
        colors[i] = cand[np.argmax(dists)]
    return colors.astype(np.float32)
