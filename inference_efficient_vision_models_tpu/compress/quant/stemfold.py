"""Fold ImageNet normalization into a quantized stem conv (generic).

The normalize step x_f = u·k_c + d_c (u raw uint8, k_c = 1/(255σ_c),
d_c = −μ_c/σ_c) is affine, so for any stem conv W:

    conv_pad0(x_f, W) = conv_upad0(u, W·k) + conv_pad0(d_img, W)
    conv_upad0(u, W·k) = s_w ⊙ conv_pad −128(u−128, Wq) + 128·s_w·Σ Wq

i.e. the device consumes RAW uint8 pixels through an int8 conv whose input
quantization is EXACT (pixels are integers), plus a precomputed offset map E
that is spatially constant in the interior and position-dependent only at
padded borders. Removes the fp32 normalize+quantize over the (B,H,W,3) image
— measured at ~40% of a whole int8 ResNet forward on TPU, because 3-lane-minor
elementwise work is ~3/128 efficient (see qresnet.convert_static_int8).

Used by qmobilenet (3×3/s2 stem); qresnet keeps its own specialized version
with the extra space-to-depth kernel variant.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .observers import minmax_qparams_affine, quantize_weight_per_channel

DERIVED_KEYS = ("e",)


def make_u8_stem(w, b, obs_out, *, stride: int, padding: int, image_size) -> Dict:
    """Folded fp32 stem (w HWIO, b) + output observer → u8-consuming int8 stem.

    With ``padding=0`` (VALID — e.g. a ViT patch embed) every output position
    sees the full d constant, so E collapses to a per-channel VECTOR that is
    serialized directly. With padding, borders see partial d sums: ``w_fp``
    (the exact folded fp kernel, a few KB) is stored so the derived offset
    MAP regenerates exactly across save/load; the map itself is never
    serialized (see ``serializable`` in the family module).
    """
    from ...data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    cin = w.shape[2]
    k = 1.0 / (255.0 * np.asarray(IMAGENET_STD[:cin], np.float32))
    w_q, w_scale = quantize_weight_per_channel(w * k.reshape(1, 1, cin, 1), channel_axis=3)
    scale, zp = minmax_qparams_affine(obs_out.min, obs_out.max)
    stem = {
        "w_q": w_q,
        "w_scale": w_scale,
        "bias": b,
        "input_hw": np.asarray(image_size, np.int32),
        "stride": np.int32(stride),
        "pad": np.int32(padding),
        "out_scale": np.float32(scale),
        "out_zp": np.int32(zp),
    }
    if padding == 0:
        d = -(np.asarray(IMAGENET_MEAN[:cin], np.float32)
              / np.asarray(IMAGENET_STD[:cin], np.float32))
        e = d @ w.sum(axis=(0, 1)) + 128.0 * w_scale * w_q.sum(axis=(0, 1, 2))
        return {**stem, "e": e.astype(np.float32)}
    return restore_offsets({**stem, "w_fp": w})


def restore_offsets(stem: Dict) -> Dict:
    """(Re)compute the derived offset map E (CPU, a few ms; never serialized)."""
    from ...data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    w_fp = np.asarray(stem["w_fp"], np.float32)
    cin = w_fp.shape[2]
    d = -(np.asarray(IMAGENET_MEAN[:cin], np.float32)
          / np.asarray(IMAGENET_STD[:cin], np.float32))
    h, wid = (int(v) for v in np.asarray(stem["input_hw"]))
    stride = int(stem["stride"])
    pad = int(stem["pad"])
    w_q = np.asarray(stem["w_q"], np.float32)
    w_scale = np.asarray(stem["w_scale"], np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        d_img = jnp.broadcast_to(jnp.asarray(d), (1, h, wid, cin))
        conv_d = lax.conv_general_dilated(
            d_img, jnp.asarray(w_fp), (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    e = np.asarray(conv_d, np.float32) + 128.0 * w_scale * w_q.sum(axis=(0, 1, 2))
    return {**stem, "e": e.astype(np.float32)}


def apply_u8_stem(
    stem: Dict, x_u8, *, stride: int, pad: int = 0, act: str = "relu",
    relu6: bool = False,
):
    """Raw uint8 NHWC → fp32 pre-requant stem output (jittable).

    ``stride``/``pad`` are passed as Python ints (architectural constants —
    the copies inside ``stem`` exist for serialization/restore only and are
    tracers under jit). ``act`` ∈ {"relu", "relu6", "silu", "none"}."""
    if relu6:
        act = "relu6"
    x_s = (x_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    if pad:
        x_s = jnp.pad(
            x_s, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
            constant_values=jnp.int8(-128),
        )
    acc = lax.conv_general_dilated(
        x_s, stem["w_q"], (stride, stride), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * stem["w_scale"] + stem["bias"] + stem["e"]
    if act == "relu":
        return jax.nn.relu(y)
    if act == "relu6":
        return jnp.minimum(jax.nn.relu(y), 6.0)
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    return y


# ---------------------------------------------------------------------------
# Float (bf16 / weight-only) stem: normalization fold + space-to-depth remap.
#
# The SAME affine algebra as the int8 stem above, without weight
# quantization: the float serving paths (bf16/fp16 casts, W8A16, W4A16)
# otherwise spend device time normalizing a (B, H, W, 3) tensor and reading
# it through a 3-lane-minor stem conv (~3/128 VPU lane efficiency). Folding
# x_f = u·k + d into the kernel (W' = W·k, offset map E = conv(d·1, W))
# and remapping W' to the s2d(2) layout removes every 3-lane op from the
# program; the consuming conv reads (H/2, W/2, 12) uint8 directly.
# ---------------------------------------------------------------------------


def make_float_stem_s2d(
    w, b, *, stride: int, padding: int, image_size=None, act: str = "relu",
    dtype=jnp.bfloat16,
):
    """Folded fp32 stem (w HWIO, b) → jittable ``stem_fn(x_u8) -> stem_out``.

    ``x_u8`` may be raw (B, H, W, 3) uint8 (relayout traced on device) or
    the pre-packed (B, H/2, W/2, 4C) s2d layout. ``stem_out`` matches the
    family ``apply_folded`` stem activation up to dtype rounding — feed it
    via the ``stem_out=`` kwarg. The border-offset map E is computed
    host-side at trace time for each input extent (cached; exact fp32) and
    baked into the program as a constant — ``image_size`` is accepted for
    interface symmetry but not required.
    """
    from ...data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from ...ops.space_to_depth import remap_conv_weights_s2d, space_to_depth_device

    del image_size  # derived from the traced input extent
    w = np.asarray(jax.device_get(w), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    kh, kw, cin, cout = w.shape
    k = 1.0 / (255.0 * np.asarray(IMAGENET_STD[:cin], np.float32))
    d = -(np.asarray(IMAGENET_MEAN[:cin], np.float32)
          / np.asarray(IMAGENET_STD[:cin], np.float32))
    w4, pad_lo, s2 = remap_conv_weights_s2d(
        w * k.reshape(1, 1, cin, 1), stride, padding
    )
    w4 = w4.astype(np.float32)
    bias_maps = {}

    def _bias_map(h, wid):
        # E once per input extent: conv of the constant d image with the
        # ORIGINAL kernel — exact, position-dependent only at padded
        # borders. Pure numpy (conv(d·1_interior, W) separates into
        # inside-mask row/col factors) so it stays concrete even when
        # stem_fn is being traced under jit.
        if (h, wid) not in bias_maps:
            out_h = (h + 2 * padding - kh) // stride + 1
            out_w = (wid + 2 * padding - kw) // stride + 1
            iy = stride * np.arange(out_h)[:, None] + np.arange(kh)[None, :] - padding
            ix = stride * np.arange(out_w)[:, None] + np.arange(kw)[None, :] - padding
            row_in = ((iy >= 0) & (iy < h)).astype(np.float32)  # (out_h, kh)
            col_in = ((ix >= 0) & (ix < wid)).astype(np.float32)  # (out_w, kw)
            e = np.einsum("ik,jl,klco,c->ijo", row_in, col_in, w, d)
            bias_maps[(h, wid)] = (e[None] + b).astype(np.float32)
        return bias_maps[(h, wid)]

    def stem_fn(x_u8):
        if x_u8.shape[-1] == cin:
            x_u8 = space_to_depth_device(x_u8)
        h, wid = 2 * x_u8.shape[1], 2 * x_u8.shape[2]
        out_h = (h + 2 * padding - kh) // stride + 1
        out_w = (wid + 2 * padding - kw) // stride + 1
        pad_hi_y = (out_h - 1) * s2 + w4.shape[0] - h // 2 - pad_lo
        pad_hi_x = (out_w - 1) * s2 + w4.shape[1] - wid // 2 - pad_lo
        xs = x_u8.astype(dtype)
        y = lax.conv_general_dilated(
            xs, jnp.asarray(w4, dtype), (s2, s2),
            [(pad_lo, pad_hi_y), (pad_lo, pad_hi_x)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y = y + _bias_map(h, wid)
        if act == "relu":
            y = jax.nn.relu(y)
        elif act == "relu6":
            y = jnp.minimum(jax.nn.relu(y), 6.0)
        elif act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y.astype(dtype)

    return stem_fn
