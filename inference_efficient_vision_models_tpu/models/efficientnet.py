"""Functional EfficientNet (MBConv: inverted residuals + squeeze-excitation)
in NHWC for TPU.

The reference's model factory reaches EfficientNet through timm /
torchvision (`teacher_training/utils.py:21-66`; its ``classifier``-head
replacement at :40-57 exists precisely for mobilenet/efficientnet-style
families). This is the TPU-native equivalent of
``torchvision.models.efficientnet_b{0,1,2}``: pure
``init(key, spec) -> (params, state)`` / ``apply(spec, params, state, x)``
over explicit pytrees with a width descriptor (`EfficientNetSpec`) so pruned
architectures reconstruct from metadata — same design as models.resnet /
models.mobilenet.

Structure (B0; B1/B2 via width/depth multipliers + the divisible-by-8 rule):
  3×3/2 stem conv → BN → SiLU
  7 stages of MBConv blocks (t, c, n, s, k):
    (1,16,1,1,3) (6,24,2,2,3) (6,40,2,2,5) (6,80,3,2,3)
    (6,112,3,1,5) (6,192,4,2,5) (6,320,1,1,3)
    block = [1×1 expand → BN → SiLU]? → k×k depthwise(s) → BN → SiLU
            → SE(squeeze = block_cin // 4) → 1×1 project → BN,
            residual add when stride=1 ∧ cin=cout
  1×1 conv → 1280 → BN → SiLU → global average pool → linear head

New structured-pruning couplings vs MobileNetV2 (see compress/prune/graph):
the SE gate multiplies the hidden (depthwise) channels, so the hidden group
additionally slices se_reduce's INPUT rows and se_expand's OUTPUT columns +
bias; the SE squeeze width is its own free prunable group.

Stochastic depth (torchvision applies row-mode DropPath with a linearly
ramped rate in training) and the classifier Dropout(p=0.2) torchvision
inserts before the head are intentionally omitted: the shared train steps
are deterministic by design (no rng plumbing; same treatment as ViT
dropout), and at NEU-DET scale they are regularizers the reference pipeline
never exercises. Eval-time semantics are identical (both are the identity
in eval).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .mobilenet import depthwise_conv2d
from .resnet import batch_norm, conv2d  # shared primitives

Params = Dict[str, Any]
State = Dict[str, Any]

# stock B0 table: (expansion t, out channels c, repeats n, first stride s,
# depthwise kernel k) — torchvision efficientnet's bneck_conf rows
_EFFNET_SETTING = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# (width_mult, depth_mult) per variant — torchvision _efficientnet_conf
_VARIANTS = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel rounding: nearest multiple, never <90% of v."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclasses.dataclass(frozen=True)
class EfficientNetSpec:
    """Complete shape description of a (possibly pruned) EfficientNet.

    ``stage_widths[s]`` is the project-conv output width shared by every
    block in stage ``s``. ``hidden_widths[s][b]`` is the expanded
    (depthwise + SE-gated) width — a free prunable group when
    ``has_expand[s][b]``, else tied to the block's input group.
    ``se_widths[s][b]`` is the SE squeeze width — always a free group.
    """

    name: str
    depths: Tuple[int, ...]
    stage_widths: Tuple[int, ...]
    stage_strides: Tuple[int, ...]
    stage_kernels: Tuple[int, ...]
    hidden_widths: Tuple[Tuple[int, ...], ...]
    has_expand: Tuple[Tuple[bool, ...], ...]
    se_widths: Tuple[Tuple[int, ...], ...]
    stem_width: int
    last_width: int
    num_classes: int
    in_chans: int = 3

    # -- derived structure ----------------------------------------------------
    def block_in_width(self, s: int, b: int) -> int:
        if b > 0:
            return self.stage_widths[s]
        return self.stem_width if s == 0 else self.stage_widths[s - 1]

    def block_stride(self, s: int, b: int) -> int:
        return self.stage_strides[s] if b == 0 else 1

    def has_residual(self, s: int, b: int) -> bool:
        return (
            self.block_stride(s, b) == 1
            and self.block_in_width(s, b) == self.stage_widths[s]
        )

    def feature_width(self) -> int:
        return self.last_width

    # -- editing (used by the pruner) -----------------------------------------
    def with_widths(
        self,
        stage_widths=None,
        hidden_widths=None,
        stem_width: int | None = None,
        last_width: int | None = None,
        se_widths=None,
    ) -> "EfficientNetSpec":
        return dataclasses.replace(
            self,
            stage_widths=tuple(stage_widths) if stage_widths is not None else self.stage_widths,
            hidden_widths=_freeze(hidden_widths) if hidden_widths is not None else self.hidden_widths,
            stem_width=stem_width if stem_width is not None else self.stem_width,
            last_width=last_width if last_width is not None else self.last_width,
            se_widths=_freeze(se_widths) if se_widths is not None else self.se_widths,
        )

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        d["__kind__"] = "efficientnet"
        return d

    @staticmethod
    def from_dict(d: Dict) -> "EfficientNetSpec":
        d = {k: v for k, v in d.items() if k not in ("__kind__", "__extra__")}
        for k in ("depths", "stage_widths", "stage_strides", "stage_kernels"):
            d[k] = tuple(d[k])
        for k in ("hidden_widths", "se_widths"):
            d[k] = _freeze(d[k])
        d["has_expand"] = tuple(tuple(bool(x) for x in st) for st in d["has_expand"])
        return EfficientNetSpec(**d)


def _freeze(nested) -> Tuple[Tuple[int, ...], ...]:
    return tuple(tuple(int(w) for w in st) for st in nested)


def efficientnet_spec(
    name: str = "efficientnet_b0", num_classes: int = 6, in_chans: int = 3
) -> EfficientNetSpec:
    """Stock torchvision-compatible EfficientNet-B0…B7 descriptor."""
    if name not in _VARIANTS:
        raise ValueError(f"unknown efficientnet variant {name!r}; have {sorted(_VARIANTS)}")
    wm, dm = _VARIANTS[name]

    depths, widths, strides, kernels = [], [], [], []
    hidden: List[List[int]] = []
    expand: List[List[bool]] = []
    se: List[List[int]] = []
    stem = _make_divisible(32 * wm)
    cin = stem
    for t, c, n, s, k in _EFFNET_SETTING:
        c = _make_divisible(c * wm)
        n = int(math.ceil(n * dm))
        depths.append(n)
        widths.append(c)
        strides.append(s)
        kernels.append(k)
        h_row, e_row, se_row = [], [], []
        for b in range(n):
            block_cin = cin if b == 0 else c
            h_row.append(_make_divisible(block_cin * t) if t != 1 else block_cin)
            e_row.append(t != 1)
            # torchvision SqueezeExcitation(expanded, max(1, block_cin // 4))
            se_row.append(max(1, block_cin // 4))
        cin = c
        hidden.append(h_row)
        expand.append(e_row)
        se.append(se_row)
    return EfficientNetSpec(
        name=name,
        depths=tuple(depths),
        stage_widths=tuple(widths),
        stage_strides=tuple(strides),
        stage_kernels=tuple(kernels),
        hidden_widths=_freeze(hidden),
        has_expand=tuple(tuple(r) for r in expand),
        se_widths=_freeze(se),
        stem_width=stem,
        # torchvision: 4 × last stage width (1280 for B0)
        last_width=4 * widths[-1],
        num_classes=num_classes,
        in_chans=in_chans,
    )


# --------------------------------------------------------------------------
# init (torchvision EfficientNet initialization scheme)
# --------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin_per_group, cout):
    fan_out = kh * kw * cout  # kaiming normal fan_out (torch scheme)
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, cin_per_group, cout), jnp.float32) * std


def _dw_init(key, kh, kw, c):
    fan_out = kh * kw  # groups-adjusted fan
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, 1, c), jnp.float32) * std


def _se_init(key, cin, cout):
    # SE fc convs are 1×1 with bias; stored here as (cin, cout) matrices
    w = _conv_init(key, 1, 1, cin, cout)[0, 0]
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def init(key, spec: EfficientNetSpec) -> Tuple[Params, State]:
    keys = iter(jax.random.split(key, 4 + 5 * sum(spec.depths)))
    params: Params = {}
    state: State = {}

    params["stem"] = {"w": _conv_init(next(keys), 3, 3, spec.in_chans, spec.stem_width)}
    params["stem_bn"], state["stem_bn"] = _bn_init(spec.stem_width)

    for s, depth in enumerate(spec.depths):
        k = spec.stage_kernels[s]
        lp, ls = {}, {}
        for b in range(depth):
            cin = spec.block_in_width(s, b)
            h = spec.hidden_widths[s][b]
            cout = spec.stage_widths[s]
            bp: Params = {}
            bs: State = {}
            if spec.has_expand[s][b]:
                bp["expand"] = {"w": _conv_init(next(keys), 1, 1, cin, h)}
                bp["expand_bn"], bs["expand_bn"] = _bn_init(h)
            else:
                assert h == cin, f"t=1 block hidden width {h} != input width {cin}"
            bp["dw"] = {"w": _dw_init(next(keys), k, k, h)}
            bp["dw_bn"], bs["dw_bn"] = _bn_init(h)
            sq = spec.se_widths[s][b]
            bp["se_reduce"] = _se_init(next(keys), h, sq)
            bp["se_expand"] = _se_init(next(keys), sq, h)
            bp["project"] = {"w": _conv_init(next(keys), 1, 1, h, cout)}
            bp["project_bn"], bs["project_bn"] = _bn_init(cout)
            lp[str(b)], ls[str(b)] = bp, bs
        params[f"stage{s}"], state[f"stage{s}"] = lp, ls

    params["last"] = {"w": _conv_init(next(keys), 1, 1, spec.stage_widths[-1], spec.last_width)}
    params["last_bn"], state["last_bn"] = _bn_init(spec.last_width)
    # torchvision classifier Linear: uniform(±1/sqrt(fan_out)), zero bias
    bound = 1.0 / (spec.num_classes ** 0.5)
    params["fc"] = {
        "w": jax.random.uniform(
            next(keys), (spec.last_width, spec.num_classes), jnp.float32, -bound, bound
        ),
        "b": jnp.zeros((spec.num_classes,), jnp.float32),
    }
    return params, state


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------


def silu(x):
    return x * jax.nn.sigmoid(x)


def se_gate(h, p_reduce, p_expand, compute_dtype):
    """Squeeze-excitation: GAP → reduce → SiLU → expand → sigmoid → scale.

    The squeeze path runs in fp32 (it is a tiny (N, C) matmul pair; the
    sigmoid gate is precision-sensitive relative to its cost)."""
    pooled = jnp.mean(h.astype(jnp.float32), axis=(1, 2))  # (N, hidden)
    s = silu(pooled @ p_reduce["w"] + p_reduce["b"])
    s = jax.nn.sigmoid(s @ p_expand["w"] + p_expand["b"])
    return h * s[:, None, None, :].astype(h.dtype)


def apply(
    spec: EfficientNetSpec,
    params: Params,
    state: State,
    x: jax.Array,
    *,
    train: bool = False,
    compute_dtype=jnp.float32,
    return_features: bool = False,
):
    """Forward pass. Returns (logits, new_state) — interface-compatible with
    models.resnet.apply so the shared train/eval steps drive it unchanged."""
    new_state: State = {}
    x = conv2d(x, params["stem"]["w"], stride=2, padding=1, dtype=compute_dtype)
    x, new_state["stem_bn"] = batch_norm(x, params["stem_bn"], state["stem_bn"], train=train)
    x = silu(x)

    for s, depth in enumerate(spec.depths):
        sname = f"stage{s}"
        new_state[sname] = {}
        for b in range(depth):
            x, new_state[sname][str(b)] = _apply_block(
                spec, params[sname][str(b)], state[sname][str(b)], x, s, b,
                train=train, compute_dtype=compute_dtype,
            )

    x = conv2d(x, params["last"]["w"], stride=1, padding=0, dtype=compute_dtype)
    x, new_state["last_bn"] = batch_norm(x, params["last_bn"], state["last_bn"], train=train)
    x = silu(x)

    feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if return_features:
        return feats, new_state
    logits = feats @ params["fc"]["w"] + params["fc"]["b"]
    return logits, new_state


def _apply_block(spec, p, st, x, s, b, *, train, compute_dtype):
    stride = spec.block_stride(s, b)
    k = spec.stage_kernels[s]
    new_st: State = {}
    h = x
    if spec.has_expand[s][b]:
        h = conv2d(h, p["expand"]["w"], stride=1, padding=0, dtype=compute_dtype)
        h, new_st["expand_bn"] = batch_norm(h, p["expand_bn"], st["expand_bn"], train=train)
        h = silu(h)
    h = depthwise_conv2d(h, p["dw"]["w"], stride=stride, padding=(k - 1) // 2, dtype=compute_dtype)
    h, new_st["dw_bn"] = batch_norm(h, p["dw_bn"], st["dw_bn"], train=train)
    h = silu(h)
    h = se_gate(h, p["se_reduce"], p["se_expand"], compute_dtype)
    h = conv2d(h, p["project"]["w"], stride=1, padding=0, dtype=compute_dtype)
    h, new_st["project_bn"] = batch_norm(h, p["project_bn"], st["project_bn"], train=train)
    if spec.has_residual(s, b):
        h = h + x
    return h, new_st


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
