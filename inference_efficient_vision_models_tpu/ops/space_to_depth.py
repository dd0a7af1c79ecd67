"""Space-to-depth input layout for the stem conv.

A (B,224,224,3) image tensor is the worst case for TPU tiling: the 3-channel
minor dim occupies 3 of 128 lanes, so every elementwise/copy/conv read pays
~42× memory amplification — measured at ~45% of the whole int8 ResNet
forward. Packing 2×2 pixel blocks into channels gives (B,112,112,12) and
turns the 7×7/s2 stem conv into an equivalent 4×4/s1 conv (asymmetric pad
(2,1)) whose kernel is a zero-filled remap:

    W4[k, l, (sy,sx,c), o] = W[2k+sy−1, 2l+sx−1, c, o]   (index in [0,6], else 0)

The relayout itself runs on the HOST (numpy byte shuffle, amortized into the
data pipeline / native loader), so the device never touches a 3-lane tensor.
Equivalence is exact (see tests/test_ops.py::test_s2d_stem_equivalence).
"""

from __future__ import annotations

import numpy as np


def space_to_depth_u8(imgs: np.ndarray, factor: int = 2) -> np.ndarray:
    """(B, H, W, C) uint8 → (B, H/f, W/f, f·f·C), host-side."""
    b, h, w, c = imgs.shape
    assert h % factor == 0 and w % factor == 0
    out = (
        imgs.reshape(b, h // factor, factor, w // factor, factor, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // factor, w // factor, factor * factor * c)
    )
    return np.ascontiguousarray(out)


def remap_stem_weights_s2d(w: np.ndarray) -> np.ndarray:
    """(7,7,C,O) stem kernel → (4,4,4C,O) for the s2d(2) input layout."""
    kh, kw, c, o = w.shape
    assert (kh, kw) == (7, 7), "stem remap is specialized to the 7x7/s2 stem"
    w4 = np.zeros((4, 4, 4 * c, o), w.dtype)
    for k in range(4):
        for sy in range(2):
            dy = 2 * k + sy - 1
            if not 0 <= dy <= 6:
                continue
            for l in range(4):
                for sx in range(2):
                    dx = 2 * l + sx - 1
                    if not 0 <= dx <= 6:
                        continue
                    sub = (sy * 2 + sx) * c
                    w4[k, l, sub : sub + c, :] = w[dy, dx, :, :]
    return w4
