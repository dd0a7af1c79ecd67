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
    """(B, H, W, C) uint8 → (B, H/f, W/f, f·f·C), host-side.

    The serving hot path (f=2, C=3, uint8) routes through the native C++
    row-interleave when available (native/dataloader.cpp ievm_s2d_batch):
    numpy's strided transpose runs ~0.6 GB/s single-thread, ~10× slower
    than one chip forward per batch, and would bottleneck the Predictor's
    sustained stream. The numpy path remains the reference semantics
    (tests assert byte equality)."""
    b, h, w, c = imgs.shape
    assert h % factor == 0 and w % factor == 0
    if factor == 2 and c == 3 and imgs.dtype == np.uint8:
        from ..data.native_loader import s2d_batch_native

        out = s2d_batch_native(imgs)
        if out is not None:
            return out
    out = (
        imgs.reshape(b, h // factor, factor, w // factor, factor, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // factor, w // factor, factor * factor * c)
    )
    return np.ascontiguousarray(out)


def space_to_depth_device(x, factor: int = 2):
    """Jittable space-to-depth: same layout contract as space_to_depth_u8
    but traced into the device program (one XLA relayout fused with the
    consuming stem conv). Lets the serving path take RAW uint8 batches —
    zero host preprocess — when host cores are the scarce resource."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    return (
        jnp.reshape(x, (b, h // factor, factor, w // factor, factor, c))
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // factor, w // factor, factor * factor * c)
    )


def remap_conv_weights_s2d(
    w: np.ndarray, stride: int, pad: int
) -> tuple:
    """Remap ANY even-stride conv kernel to the s2d(2) input layout.

    (kh, kw, C, O) with stride s (even) and symmetric zero pad p on the
    full-resolution input ≡ a (kh', kw') kernel with stride s/2 and
    asymmetric pad on the (H/2, W/2, 4C) s2d input, where each original tap
    dy lands at new tap t = floor((dy−p)/2) in sub-channel block
    sy = (dy−p) mod 2 (same for dx/sx; block order (sy, sx, c) matching
    space_to_depth_u8). Returns (w', (padL, padH_r_unresolved)) — the right
    pad depends on the input extent, so this returns padL only along with
    the new kernel; compute padR as (out−1)·s' + kh' − H' − padL.

    → (w4, pad_lo, new_stride) with w4 (kh', kw', 4C, O), pad_lo the
    left/top pad, new_stride = s // 2.
    """
    assert stride % 2 == 0, "s2d(2) remap needs an even stride"
    kh, kw, c, o = w.shape
    tmin = -((pad + 1) // 2)  # floor((0 − p)/2)
    tmax = (kh - 1 - pad) // 2
    kk = tmax - tmin + 1
    umin = -((pad + 1) // 2)
    umax = (kw - 1 - pad) // 2
    kk_w = umax - umin + 1
    w4 = np.zeros((kk, kk_w, 4 * c, o), w.dtype)
    for dy in range(kh):
        t, sy = (dy - pad) // 2, (dy - pad) % 2
        for dx in range(kw):
            u, sx = (dx - pad) // 2, (dx - pad) % 2
            sub = (sy * 2 + sx) * c
            w4[t - tmin, u - umin, sub : sub + c, :] += w[dy, dx, :, :]
    return w4, -tmin, stride // 2


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
