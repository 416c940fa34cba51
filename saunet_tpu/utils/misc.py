"""Small conversion/visualization helpers.

Covers the roles of /root/reference/lib/utils/th.py:8-41 (as_numpy) and
/root/reference/utils.py:94-108 (colorEncode) without any torch dependency.
"""
from __future__ import annotations

import numpy as np


def as_numpy(obj):
    """Recursively convert JAX arrays / nested containers to numpy."""
    if isinstance(obj, dict):
        return {k: as_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(as_numpy(v) for v in obj)
    return np.asarray(obj)


# Default 4-class palette: background, RV, myocardium, LV.
DEFAULT_COLORS = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


def color_encode(label_map: np.ndarray, colors: np.ndarray = DEFAULT_COLORS):
    """Map an int label image (H, W) to an RGB uint8 image."""
    label_map = np.asarray(label_map).astype(np.int64)
    out = np.zeros(label_map.shape + (3,), dtype=np.uint8)
    for idx in np.unique(label_map):
        if 0 <= idx < len(colors):
            out[label_map == idx] = colors[idx]
    return out
