"""Functional ResNet (BasicBlock / Bottleneck) in NHWC for TPU.

Pure ``init(key, spec) -> (params, state)`` / ``apply(spec, params, state, x)``
with explicit pytrees — no module system — so the compression engines
(pruning re-packing, quantization conversion) can transform parameters as
plain arrays keyed by the width descriptor.

Semantics match torchvision's ResNet (the reference's model zoo,
`teacher_training/utils.py:21-66` + stock torchvision `resnet.py`):
7×7/2 stem conv (pad 3) → BN → ReLU → 3×3/2 maxpool (pad 1) → four stages of
BasicBlock/Bottleneck → global average pool → linear head. Padding is
explicit symmetric (torch-style), NOT XLA 'SAME', so imported torch weights
reproduce torch outputs bit-for-bit-ish (see tests/test_models.py parity).

Layout: activations NHWC, conv kernels HWIO — the TPU-native layout (channel
dim on the 128-lane minor axis).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .widths import ResNetSpec

Params = Dict[str, Any]
State = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# --------------------------------------------------------------------------
# primitive layers
# --------------------------------------------------------------------------


def conv2d(x, w, stride: int = 1, padding: int = 0, dtype=None, groups: int = 1):
    """NHWC conv with torch-style symmetric padding.

    bf16 inputs emit bf16 (the MXU accumulates fp32 internally; BN
    re-normalizes in fp32 right after). fp32 inputs request fp32 output
    explicitly. A fp32 ``preferred_element_type`` on bf16 inputs is avoided:
    its conv VJP rejects the mixed-dtype cotangent.

    ``groups`` maps to ``feature_group_count`` (ResNeXt cardinality; kernel
    HWIO with I = C_in/groups).
    """
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )


def batch_norm(x, p, s, *, train: bool, momentum: float = BN_MOMENTUM):
    """Functional batch norm; returns (y, new_running_stats).

    Matches torch: normalizes with biased batch variance, tracks running
    stats with unbiased variance.
    """
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        var_unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * var_unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var + BN_EPS)
    y = (x32 - mean) * (inv * p["scale"]) + p["bias"]
    return y.astype(x.dtype), new_s


def max_pool(x, window: int = 3, stride: int = 2, padding: int = 1):
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    """Kaiming-normal fan_out (torch ResNet init) in HWIO."""
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def _linear_init(key, cin, cout):
    bound = 1.0 / (cin**0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def init(key, spec: ResNetSpec) -> Tuple[Params, State]:
    keys = iter(jax.random.split(key, 256))
    params: Params = {}
    state: State = {}

    params["conv1"] = {"w": _conv_init(next(keys), 7, 7, spec.in_chans, spec.stem_width)}
    params["bn1"], state["bn1"] = _bn_init(spec.stem_width)

    for s, depth in enumerate(spec.depths):
        lp, ls = {}, {}
        for b in range(depth):
            bp, bs = _init_block(next(keys), spec, s, b)
            lp[str(b)], ls[str(b)] = bp, bs
        params[f"layer{s + 1}"], state[f"layer{s + 1}"] = lp, ls

    params["fc"] = _linear_init(next(keys), spec.feature_width(), spec.num_classes)
    return params, state


def _init_block(key, spec: ResNetSpec, s: int, b: int):
    cin = spec.block_in_width(s, b)
    cout = spec.stage_widths[s]
    inner = spec.inner_widths[s][b]
    keys = iter(jax.random.split(key, 8))
    p: Params = {}
    st: State = {}
    if spec.block == "basic":
        (w1,) = inner
        p["conv1"] = {"w": _conv_init(next(keys), 3, 3, cin, w1)}
        p["bn1"], st["bn1"] = _bn_init(w1)
        p["conv2"] = {"w": _conv_init(next(keys), 3, 3, w1, cout)}
        p["bn2"], st["bn2"] = _bn_init(cout)
    else:
        w1, w2 = inner
        p["conv1"] = {"w": _conv_init(next(keys), 1, 1, cin, w1)}
        p["bn1"], st["bn1"] = _bn_init(w1)
        # grouped 3×3 (ResNeXt): kernel input depth is w1/groups
        assert w1 % spec.groups == 0, (w1, spec.groups)
        p["conv2"] = {"w": _conv_init(next(keys), 3, 3, w1 // spec.groups, w2)}
        p["bn2"], st["bn2"] = _bn_init(w2)
        p["conv3"] = {"w": _conv_init(next(keys), 1, 1, w2, cout)}
        p["bn3"], st["bn3"] = _bn_init(cout)
    if spec.has_downsample(s, b):
        p["down_conv"] = {"w": _conv_init(next(keys), 1, 1, cin, cout)}
        p["down_bn"], st["down_bn"] = _bn_init(cout)
    return p, st


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------


def apply(
    spec: ResNetSpec,
    params: Params,
    state: State,
    x: jax.Array,
    *,
    train: bool = False,
    compute_dtype=jnp.float32,
    return_features: bool = False,
):
    """Forward pass. Returns (logits, new_state).

    ``compute_dtype=jnp.bfloat16`` runs convs/matmuls on the MXU in bf16 with
    fp32 accumulation; BN statistics stay fp32.
    """
    new_state: State = {}
    x = conv2d(x, params["conv1"]["w"], stride=2, padding=3, dtype=compute_dtype)
    x, new_state["bn1"] = batch_norm(x, params["bn1"], state["bn1"], train=train)
    x = jax.nn.relu(x)
    x = max_pool(x, 3, 2, 1)

    for s, depth in enumerate(spec.depths):
        lname = f"layer{s + 1}"
        new_state[lname] = {}
        for b in range(depth):
            x, new_state[lname][str(b)] = _apply_block(
                spec, params[lname][str(b)], state[lname][str(b)], x, s, b,
                train=train, compute_dtype=compute_dtype,
            )

    feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average pool
    if return_features:
        return feats, new_state
    logits = feats @ params["fc"]["w"] + params["fc"]["b"]
    return logits, new_state


def _apply_block(spec, p, st, x, s, b, *, train, compute_dtype):
    stride = spec.block_stride(s, b)
    new_st: State = {}
    identity = x
    if spec.block == "basic":
        out = conv2d(x, p["conv1"]["w"], stride=stride, padding=1, dtype=compute_dtype)
        out, new_st["bn1"] = batch_norm(out, p["bn1"], st["bn1"], train=train)
        out = jax.nn.relu(out)
        out = conv2d(out, p["conv2"]["w"], stride=1, padding=1, dtype=compute_dtype)
        out, new_st["bn2"] = batch_norm(out, p["bn2"], st["bn2"], train=train)
    else:
        out = conv2d(x, p["conv1"]["w"], stride=1, padding=0, dtype=compute_dtype)
        out, new_st["bn1"] = batch_norm(out, p["bn1"], st["bn1"], train=train)
        out = jax.nn.relu(out)
        out = conv2d(out, p["conv2"]["w"], stride=stride, padding=1,
                     dtype=compute_dtype, groups=spec.groups)
        out, new_st["bn2"] = batch_norm(out, p["bn2"], st["bn2"], train=train)
        out = jax.nn.relu(out)
        out = conv2d(out, p["conv3"]["w"], stride=1, padding=0, dtype=compute_dtype)
        out, new_st["bn3"] = batch_norm(out, p["bn3"], st["bn3"], train=train)
    if spec.has_downsample(s, b):
        identity = conv2d(x, p["down_conv"]["w"], stride=stride, padding=0, dtype=compute_dtype)
        identity, new_st["down_bn"] = batch_norm(
            identity, p["down_bn"], st["down_bn"], train=train
        )
    out = jax.nn.relu(out + identity)
    return out, new_st


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
