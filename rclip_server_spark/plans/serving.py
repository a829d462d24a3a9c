"""Serving-layer equivalents of the reference's presentation endpoints
(SURVEY.md §2.E) that sit ON TOP of engine results — kept thin and
driver-side on purpose: the compute (normalization, scoring) is the engine's
job, the HTML/color mapping is O(dim) string building.
"""

from __future__ import annotations

import numpy as np

# a compact diverging colormap (blue → white → red), stand-in for the
# reference's seaborn 'icefire' (rclip_server.py:257): pure linear blend, no
# plotting dependency
_COLD = np.array([59, 76, 192], dtype=np.float64)
_MID = np.array([221, 221, 221], dtype=np.float64)
_HOT = np.array([180, 4, 38], dtype=np.float64)


def colormap_hex(x: float) -> str:
    """x in [0,1] → #rrggbb via two-segment linear blend."""
    x = min(max(float(x), 0.0), 1.0)
    if x < 0.5:
        rgb = _COLD + (x * 2.0) * (_MID - _COLD)
    else:
        rgb = _MID + ((x - 0.5) * 2.0) * (_HOT - _MID)
    return "#%02x%02x%02x" % tuple(int(round(c)) for c in rgb)


def visualize_embedding(normalized: "list[float] | np.ndarray") -> str:
    """A15 (rclip_server.py:253-273): min-max-normalized embedding → an HTML
    color grid. The normalization itself is the engine op
    (operators.stats.minmax_normalize / functions.vector.minmax_scale); this
    renders its output."""
    cells = "".join(
        f'<td style="background-color:{colormap_hex(v)}" title="{i}:{v:.3f}">'
        "&nbsp;</td>"
        for i, v in enumerate(normalized)
    )
    return f'<table class="clip_embedding"><tr>{cells}</tr></table>'


def copyright_message(db_name: str) -> str:
    """Reference /copyright_message branch (rclip_server.py:275-287, 489-492):
    wiki-sourced databases get the Wikimedia attribution note."""
    import re

    if re.search("wiki", db_name):
        return (
            "Images linked on this page are hosted on wikimedia.org; "
            "follow the detail links for license and attribution."
        )
    return "Image copyrights belong to their respective owners."
