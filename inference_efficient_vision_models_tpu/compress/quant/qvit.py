"""Dynamic-INT8 ViT: every dense layer int8 on the MXU.

Goes beyond the reference (which quantizes only CNNs, while naming ViT
backbones in its configs — `kd_config.py:13-14`): a ViT's weight mass sits in
dense layers (qkv / proj / mlp / head), exactly the scope of torch's
``quantize_dynamic({nn.Linear})``. Weights are per-output-channel symmetric
int8; activations are quantized per tensor on the fly (dynamic), matmuls run
int8×int8→int32 on the MXU; LayerNorm / softmax / GELU / patch-embed stay
floating point.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models.vit import LN_EPS, ViTSpec, _layer_norm
from .observers import quantize_weight_per_channel

_DENSE = ("qkv", "proj", "mlp1", "mlp2")


def _qdense_params(d) -> Dict:
    w = np.asarray(d["w"], np.float32)
    w_q, w_scale = quantize_weight_per_channel(w, channel_axis=1)
    return {
        "w_q": w_q,
        "w_scale": w_scale,
        "w_sum": w_q.astype(np.int32).sum(axis=0),
        "b": np.asarray(d["b"], np.float32),
    }


def convert_dynamic_int8(spec: ViTSpec, params) -> Dict:
    """fp32 ViT params → pytree with int8 dense layers (rest unchanged)."""
    q: Dict = {
        "patch_embed": jax.device_get(params["patch_embed"]),
        "cls_token": jax.device_get(params["cls_token"]),
        "pos_embed": jax.device_get(params["pos_embed"]),
        "norm": jax.device_get(params["norm"]),
        "head": _qdense_params({"w": params["head"]["w"], "b": params["head"]["b"]}),
        "blocks": {},
    }
    for i, blk in params["blocks"].items():
        q["blocks"][i] = {
            "ln1": jax.device_get(blk["ln1"]),
            "ln2": jax.device_get(blk["ln2"]),
            **{name: _qdense_params(blk[name]) for name in _DENSE},
        }
    return q


def _dyn_dense(x, qd):
    """(…, K) fp32 → (…, N) fp32 through a dynamic-int8 matmul."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    lo = jnp.minimum(jnp.min(x2), 0.0)
    hi = jnp.maximum(jnp.max(x2), 0.0)
    scale = jnp.maximum((hi - lo) / 255.0, 1.2e-7)
    zp = jnp.clip(jnp.round(-lo / scale), 0, 255).astype(jnp.int32)
    x_s = (jnp.clip(jnp.round(x2 / scale) + zp, 0, 255) - 128).astype(jnp.int8)
    acc = lax.dot_general(
        x_s, qd["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (zp - 128) * qd["w_sum"]
    y = acc.astype(jnp.float32) * (scale * qd["w_scale"]) + qd["b"]
    return y.reshape(*shape[:-1], -1)


def apply_dynamic_int8(spec: ViTSpec, q, x):
    """Forward: NHWC fp32 images → logits; all dense layers int8."""
    pe = lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(q["patch_embed"]["w"]),
        (spec.patch, spec.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(q["patch_embed"]["b"])
    b = pe.shape[0]
    tokens = pe.reshape(b, -1, spec.dim)
    cls = jnp.broadcast_to(jnp.asarray(q["cls_token"]), (b, 1, spec.dim))
    h = jnp.concatenate([cls, tokens], axis=1) + jnp.asarray(q["pos_embed"])

    hd = spec.dim // spec.heads
    for i in range(spec.depth):
        blk = q["blocks"][str(i)]
        z = _layer_norm(h, blk["ln1"])
        qkv = _dyn_dense(z, blk["qkv"]).reshape(b, -1, 3, spec.heads, hd)
        qh, kh, vh = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        att = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (hd**-0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, spec.dim)
        h = h + _dyn_dense(out, blk["proj"])
        z = _layer_norm(h, blk["ln2"])
        z = jax.nn.gelu(_dyn_dense(z, blk["mlp1"]))
        h = h + _dyn_dense(z, blk["mlp2"])

    h = _layer_norm(h, q["norm"])
    return _dyn_dense(h[:, 0], q["head"])
