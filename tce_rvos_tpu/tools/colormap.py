"""Visualization colormap (capability parity with reference
tools/colormap.py — a fixed 79-color table). Generated procedurally (golden
-ratio HSV walk) instead of hard-coding the detectron table."""

from __future__ import annotations

import colorsys

import numpy as np


def colormap(rgb: bool = False, maximum: int = 255, n: int = 79) -> np.ndarray:
    """[n, 3] visually-distinct colors."""
    colors = []
    h = 0.0
    for i in range(n):
        h = (h + 0.618033988749895) % 1.0
        s = 0.65 if i % 2 == 0 else 0.9
        v = 0.95 if i % 3 else 0.7
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        colors.append([r, g, b] if rgb else [b, g, r])
    return (np.asarray(colors) * maximum).astype(np.float64)
