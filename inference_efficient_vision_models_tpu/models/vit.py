"""Functional Vision Transformer (timm-style patch16 ViT).

The reference's model zoo exposes timm ViTs behind `use_timm`
(`teacher_training/utils.py:23-26`; `kd_config.py:13-14` names
``vit_base_patch16_224`` / ``vit_tiny_patch16_224``). This is the TPU-native
equivalent: pure init/apply, NHWC patch embedding via a stride-16 conv
(maps to one MXU matmul), pre-norm blocks, learnable cls token + position
embeddings, GELU MLP.

No BatchNorm → state is an empty dict; sequence length is a fixed
1 + (224/16)² = 197 tokens, so attention is a pair of einsums XLA fuses —
no sequence parallelism applies (SURVEY.md §5, long-context: N/A).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    """``heads``/``mlp_ratio`` describe the stock architecture; structured
    pruning records per-block widths in ``head_counts``/``mlp_hidden``
    (None = uniform stock). ``dim // heads`` stays the per-head dim — head
    pruning removes whole heads, never splits one."""

    name: str
    patch: int
    dim: int
    depth: int
    heads: int
    mlp_ratio: float
    num_classes: int
    image_size: int = 224
    in_chans: int = 3
    head_counts: Tuple[int, ...] | None = None
    mlp_hidden: Tuple[int, ...] | None = None

    @property
    def tokens(self) -> int:
        return 1 + (self.image_size // self.patch) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def block_heads(self, i: int) -> int:
        return self.head_counts[i] if self.head_counts is not None else self.heads

    def block_mlp_hidden(self, i: int) -> int:
        if self.mlp_hidden is not None:
            return self.mlp_hidden[i]
        return int(self.dim * self.mlp_ratio)

    def with_widths(self, head_counts=None, mlp_hidden=None) -> "ViTSpec":
        return dataclasses.replace(
            self,
            head_counts=tuple(head_counts) if head_counts is not None else self.head_counts,
            mlp_hidden=tuple(mlp_hidden) if mlp_hidden is not None else self.mlp_hidden,
        )

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        d["__kind__"] = "vit"
        return d

    @staticmethod
    def from_dict(d: Dict) -> "ViTSpec":
        d = {k: v for k, v in d.items() if k not in ("__kind__", "__extra__")}
        for k in ("head_counts", "mlp_hidden"):
            if d.get(k) is not None:
                d[k] = tuple(int(v) for v in d[k])
        return ViTSpec(**d)


_VIT_TABLE = {
    "vit_tiny_patch16_224": (192, 12, 3),
    "vit_small_patch16_224": (384, 12, 6),
    "vit_base_patch16_224": (768, 12, 12),
}


def vit_spec(name: str, num_classes: int = 6, image_size: int = 224) -> ViTSpec:
    if name not in _VIT_TABLE:
        raise ValueError(f"unknown vit variant {name!r} (have {sorted(_VIT_TABLE)})")
    dim, depth, heads = _VIT_TABLE[name]
    return ViTSpec(
        name=name, patch=16, dim=dim, depth=depth, heads=heads,
        mlp_ratio=4.0, num_classes=num_classes, image_size=image_size,
    )


# --------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32) * std


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _linear_init(key, cin, cout, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "w": _trunc_normal(kw, (cin, cout), std),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init(key, spec: ViTSpec) -> Tuple[Dict, Dict]:
    keys = iter(jax.random.split(key, 8 + 8 * spec.depth))
    d = spec.dim
    params: Dict[str, Any] = {
        "patch_embed": {
            "w": _trunc_normal(next(keys), (spec.patch, spec.patch, spec.in_chans, d)),
            "b": jnp.zeros((d,), jnp.float32),
        },
        "cls_token": _trunc_normal(next(keys), (1, 1, d)),
        "pos_embed": _trunc_normal(next(keys), (1, spec.tokens, d)),
        "norm": _ln_init(d),
        "head": _linear_init(next(keys), d, spec.num_classes),
    }
    blocks = {}
    for i in range(spec.depth):
        attn_dim = spec.block_heads(i) * spec.head_dim
        hidden = spec.block_mlp_hidden(i)
        blocks[str(i)] = {
            "ln1": _ln_init(d),
            "qkv": _linear_init(next(keys), d, 3 * attn_dim),
            "proj": _linear_init(next(keys), attn_dim, d),
            "ln2": _ln_init(d),
            "mlp1": _linear_init(next(keys), d, hidden),
            "mlp2": _linear_init(next(keys), hidden, d),
        }
    params["blocks"] = blocks
    return params, {}  # no mutable state (no BN)


def _layer_norm(x, p):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _attention(x, p, hd: int, dtype):
    """``hd`` is the per-head dim; the head COUNT comes from the qkv kernel's
    shape so head-pruned blocks run unchanged."""
    b, t, d = x.shape
    heads = p["qkv"]["w"].shape[1] // (3 * hd)
    qkv = (x @ p["qkv"]["w"].astype(dtype)) + p["qkv"]["b"].astype(dtype)
    q, k, v = jnp.split(qkv.reshape(b, t, 3, heads, hd), 3, axis=2)
    q = q.squeeze(2).transpose(0, 2, 1, 3)  # (b, h, t, hd)
    k = k.squeeze(2).transpose(0, 2, 1, 3)
    v = v.squeeze(2).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, heads * hd)
    return (out @ p["proj"]["w"].astype(dtype)) + p["proj"]["b"].astype(dtype)


def apply(
    spec: ViTSpec,
    params,
    state,
    x: jax.Array,
    *,
    train: bool = False,
    compute_dtype=jnp.float32,
    return_features: bool = False,
    patch_out=None,
    fused_mlp: bool = False,
):
    """Forward: NHWC images → logits. Returns (logits, state) — state is
    passed through unchanged (interface-compatible with models.resnet).

    ``patch_out`` (a precomputed (B, H/p, W/p, dim) patch-embed activation)
    skips the in-graph patch conv — the serving hook for the s2d-folded
    uint8 patch embed (stemfold.make_float_stem_s2d); ``x`` is then ignored.

    ``fused_mlp=True`` routes mlp1+GELU through the Pallas fused kernel
    (`ops/fused_dense.py`) — SERVING ONLY: the kernel is forward-only (no
    VJP), so training/grad paths must keep the default. Off by default
    everywhere: measured end-to-end it LOSES ~5 ms/b256 on TPU despite
    winning in isolation (Mosaic↔XLA-dot scheduling barrier — see
    ops/fused_dense.py's docstring and REPORT.md "Pallas placement")."""
    del train  # no dropout/BN in the inference-efficiency configuration
    dtype = compute_dtype
    if patch_out is None:
        x = x.astype(dtype)
        pe = jax.lax.conv_general_dilated(
            x, params["patch_embed"]["w"].astype(dtype),
            (spec.patch, spec.patch), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["patch_embed"]["b"].astype(dtype)
    else:
        pe = patch_out.astype(dtype)
    b = pe.shape[0]
    tokens = pe.reshape(b, -1, spec.dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, spec.dim))
    h = jnp.concatenate([cls, tokens], axis=1) + params["pos_embed"].astype(dtype)

    for i in range(spec.depth):
        blk = params["blocks"][str(i)]
        h = h + _attention(_layer_norm(h, blk["ln1"]), blk, spec.head_dim, dtype)
        m = _layer_norm(h, blk["ln2"])
        # exact (erf) GELU — timm/torch nn.GELU semantics, for weight-import parity
        if fused_mlp:
            from ..ops.fused_dense import dense_gelu

            m = dense_gelu(
                m, blk["mlp1"]["w"].astype(dtype), blk["mlp1"]["b"].astype(dtype)
            )
        else:
            m = jax.nn.gelu(
                (m @ blk["mlp1"]["w"].astype(dtype)) + blk["mlp1"]["b"].astype(dtype),
                approximate=False,
            )
        m = (m @ blk["mlp2"]["w"].astype(dtype)) + blk["mlp2"]["b"].astype(dtype)
        h = h + m

    h = _layer_norm(h, params["norm"])
    feats = h[:, 0].astype(jnp.float32)  # cls token
    if return_features:
        return feats, state
    logits = feats @ params["head"]["w"] + params["head"]["b"]
    return logits, state


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
