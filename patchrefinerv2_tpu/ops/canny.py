"""Shared canny non-maximum-suppression core.

skimage.feature.canny's bilinear-interpolated NMS over the four gradient
orientation sectors, written once over a generic array namespace so the
host-side evaluation edges (evaluation/metrics._canny_numpy, numpy) and
the in-graph training-loss edges (models/losses_extra.canny_edges_graph,
jax.numpy) can never silently diverge in the sector/weight conventions.
Reference semantics: estimator/utils/metric.py:169-207 (skimage canny).
"""

from __future__ import annotations


def canny_nms(xp, isobel, jsobel, magnitude):
    """Bilinear-interpolated non-maximum suppression.

    ``xp`` is the array namespace (``numpy`` or ``jax.numpy``);
    ``isobel``/``jsobel``/``magnitude`` are (..., H, W) arrays (any number
    of leading batch axes). Returns a bool (..., H, W) local-maxima mask —
    NOT yet restricted to the mask interior or nonzero magnitude (callers
    apply their own eroded-mask / interior conventions).
    """
    h, w = magnitude.shape[-2], magnitude.shape[-1]
    pad = [(0, 0)] * (magnitude.ndim - 2) + [(1, 1), (1, 1)]
    pm = xp.pad(magnitude, pad)

    def nb(di, dj):
        return pm[..., 1 + di : 1 + di + h, 1 + dj : 1 + dj + w]

    eps = 1e-12
    abs_i, abs_j = xp.abs(isobel), xp.abs(jsobel)
    same_sign = (isobel * jsobel) >= 0
    local_maxima = xp.zeros(magnitude.shape, bool)

    # gradient mostly horizontal (|jsobel| >= |isobel|): interpolate
    # between the left/right neighbours and their diagonal partners
    horiz = abs_j >= abs_i
    wgt = abs_i / (abs_j + eps)
    for sgn, diag in ((same_sign, 1), (~same_sign, -1)):
        sel = horiz & sgn
        c_plus = nb(diag, 1) * wgt + nb(0, 1) * (1 - wgt)
        c_minus = nb(-diag, -1) * wgt + nb(0, -1) * (1 - wgt)
        local_maxima = local_maxima | (
            sel & (magnitude >= c_plus) & (magnitude >= c_minus)
        )

    # gradient mostly vertical
    vert = ~horiz
    wgt = abs_j / (abs_i + eps)
    for sgn, diag in ((same_sign, 1), (~same_sign, -1)):
        sel = vert & sgn
        c_plus = nb(1, diag) * wgt + nb(1, 0) * (1 - wgt)
        c_minus = nb(-1, -diag) * wgt + nb(-1, 0) * (1 - wgt)
        local_maxima = local_maxima | (
            sel & (magnitude >= c_plus) & (magnitude >= c_minus)
        )

    return local_maxima
