"""Functional MobileNetV2 (inverted residuals, depthwise convs) in NHWC.

The reference's model factory handles torchvision ``classifier``-head families
(mobilenet/efficientnet-style) via head replacement
(`teacher_training/utils.py:21-66`, head swap at :40-57). This is the
TPU-native equivalent of ``torchvision.models.mobilenet_v2``: pure
``init(key, spec) -> (params, state)`` / ``apply(spec, params, state, x)``
over explicit pytrees, with a width descriptor (`MobileNetV2Spec`) so pruned
architectures reconstruct from metadata — same design as models.resnet.

Structure (stock 1.0× multiplier):
  3×3/2 stem conv → BN → ReLU6
  7 stages of inverted-residual blocks (t, c, n, s):
    (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1) (6,160,3,2) (6,320,1,1)
    block = [1×1 expand → BN → ReLU6]? → 3×3 depthwise(s) → BN → ReLU6
            → 1×1 project → BN, residual add when stride=1 ∧ cin=cout
  1×1 conv → 1280 → BN → ReLU6 → global average pool → linear head

The depthwise conv is the new structured-pruning edge type: its kernel is
HWIO ``(3, 3, 1, C)`` with ``feature_group_count=C``, so its input and output
channels are the SAME group — pruning a hidden channel slices the expand
conv's output, the dw kernel, and the project conv's input together.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .resnet import BN_EPS, batch_norm, conv2d  # shared primitives

Params = Dict[str, Any]
State = Dict[str, Any]

# stock (expansion t, out channels c, repeats n, first stride s) table —
# torchvision mobilenet_v2's inverted_residual_setting
_MBV2_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


@dataclasses.dataclass(frozen=True)
class MobileNetV2Spec:
    """Complete shape description of a (possibly pruned) MobileNetV2.

    ``stage_widths[s]`` is the project-conv output width shared by every
    block in stage ``s`` (residual adds couple them). ``hidden_widths[s][b]``
    is the expanded (depthwise) width of block ``b`` — a free prunable group
    when ``has_expand[s][b]``; otherwise (t=1 blocks) it EQUALS the block's
    input width and belongs to the input's coupled group.
    """

    name: str
    depths: Tuple[int, ...]
    stage_widths: Tuple[int, ...]
    stage_strides: Tuple[int, ...]
    hidden_widths: Tuple[Tuple[int, ...], ...]
    has_expand: Tuple[Tuple[bool, ...], ...]
    stem_width: int
    last_width: int
    num_classes: int
    in_chans: int = 3

    # -- derived structure --------------------------------------------------
    def block_in_width(self, s: int, b: int) -> int:
        if b > 0:
            return self.stage_widths[s]
        return self.stem_width if s == 0 else self.stage_widths[s - 1]

    def block_stride(self, s: int, b: int) -> int:
        return self.stage_strides[s] if b == 0 else 1

    def has_residual(self, s: int, b: int) -> bool:
        return self.block_stride(s, b) == 1 and self.block_in_width(s, b) == self.stage_widths[s]

    def feature_width(self) -> int:
        return self.last_width

    # -- editing (used by the pruner) ----------------------------------------
    def with_widths(
        self,
        stage_widths=None,
        hidden_widths=None,
        stem_width: int | None = None,
        last_width: int | None = None,
    ) -> "MobileNetV2Spec":
        return dataclasses.replace(
            self,
            stage_widths=tuple(stage_widths) if stage_widths is not None else self.stage_widths,
            hidden_widths=_freeze(hidden_widths) if hidden_widths is not None else self.hidden_widths,
            stem_width=stem_width if stem_width is not None else self.stem_width,
            last_width=last_width if last_width is not None else self.last_width,
        )

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        d["__kind__"] = "mobilenet_v2"
        return d

    @staticmethod
    def from_dict(d: Dict) -> "MobileNetV2Spec":
        d = {k: v for k, v in d.items() if k not in ("__kind__", "__extra__")}
        for k in ("depths", "stage_widths", "stage_strides"):
            d[k] = tuple(d[k])
        d["hidden_widths"] = _freeze(d["hidden_widths"])
        d["has_expand"] = tuple(tuple(bool(x) for x in st) for st in d["has_expand"])
        return MobileNetV2Spec(**d)


def _freeze(nested) -> Tuple[Tuple[int, ...], ...]:
    return tuple(tuple(int(w) for w in st) for st in nested)


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel rounding: nearest multiple, never <90% of v."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def mobilenet_v2_spec(
    name: str = "mobilenet_v2", num_classes: int = 6, in_chans: int = 3
) -> MobileNetV2Spec:
    """torchvision-compatible MobileNetV2 descriptor.

    ``name`` may carry a timm-style width-multiplier suffix —
    ``mobilenet_v2_050`` / ``_075`` / ``_140`` (0.5×/0.75×/1.4×) — applied
    with torchvision's ``width_mult`` semantics (divisible-by-8 rounding,
    last conv scales only above 1.0×)."""
    wm = 1.0
    suffix = name.removeprefix("mobilenet_v2").lstrip("_")
    if suffix:
        wm = int(suffix) / 100.0
    stem = _make_divisible(32 * wm) if wm != 1.0 else 32
    depths, widths, strides = [], [], []
    hidden: List[List[int]] = []
    expand: List[List[bool]] = []
    cin = stem
    for t, c, n, s in _MBV2_SETTING:
        if wm != 1.0:
            c = _make_divisible(c * wm)
        depths.append(n)
        widths.append(c)
        strides.append(s)
        h_row, e_row = [], []
        for b in range(n):
            h_row.append(int(round((cin if b == 0 else c) * t)))
            e_row.append(t != 1)
            cin = c
        hidden.append(h_row)
        expand.append(e_row)
    return MobileNetV2Spec(
        name=name,
        depths=tuple(depths),
        stage_widths=tuple(widths),
        stage_strides=tuple(strides),
        hidden_widths=_freeze(hidden),
        has_expand=tuple(tuple(r) for r in expand),
        stem_width=stem,
        last_width=_make_divisible(1280 * max(1.0, wm)) if wm != 1.0 else 1280,
        num_classes=num_classes,
        in_chans=in_chans,
    )


# --------------------------------------------------------------------------
# init (torch MobileNetV2 initialization scheme)
# --------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin_per_group, cout):
    fan_out = kh * kw * cout  # torch kaiming fan_out counts output fan only
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, cin_per_group, cout), jnp.float32) * std


def _dw_init(key, kh, kw, c):
    # depthwise: torch's kaiming fan_out uses groups-adjusted fan (k*k*1)
    fan_out = kh * kw
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, 1, c), jnp.float32) * std


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def init(key, spec: MobileNetV2Spec) -> Tuple[Params, State]:
    keys = iter(jax.random.split(key, 4 + 3 * sum(spec.depths)))
    params: Params = {}
    state: State = {}

    params["stem"] = {"w": _conv_init(next(keys), 3, 3, spec.in_chans, spec.stem_width)}
    params["stem_bn"], state["stem_bn"] = _bn_init(spec.stem_width)

    for s, depth in enumerate(spec.depths):
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
            bp["dw"] = {"w": _dw_init(next(keys), 3, 3, h)}
            bp["dw_bn"], bs["dw_bn"] = _bn_init(h)
            bp["project"] = {"w": _conv_init(next(keys), 1, 1, h, cout)}
            bp["project_bn"], bs["project_bn"] = _bn_init(cout)
            lp[str(b)], ls[str(b)] = bp, bs
        params[f"stage{s}"], state[f"stage{s}"] = lp, ls

    params["last"] = {"w": _conv_init(next(keys), 1, 1, spec.stage_widths[-1], spec.last_width)}
    params["last_bn"], state["last_bn"] = _bn_init(spec.last_width)
    # torch mobilenet classifier: normal(0, 0.01) weights, zero bias
    params["fc"] = {
        "w": jax.random.normal(next(keys), (spec.last_width, spec.num_classes), jnp.float32) * 0.01,
        "b": jnp.zeros((spec.num_classes,), jnp.float32),
    }
    return params, state


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), jnp.asarray(6.0, x.dtype))


def depthwise_conv2d(x, w, stride: int = 1, padding: int = 1, dtype=None):
    """NHWC depthwise conv; kernel HWIO (kh, kw, 1, C), groups = C."""
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=w.shape[3],
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )


def apply(
    spec: MobileNetV2Spec,
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
    x = relu6(x)

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
    x = relu6(x)

    feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if return_features:
        return feats, new_state
    logits = feats @ params["fc"]["w"] + params["fc"]["b"]
    return logits, new_state


def _apply_block(spec, p, st, x, s, b, *, train, compute_dtype):
    stride = spec.block_stride(s, b)
    new_st: State = {}
    h = x
    if spec.has_expand[s][b]:
        h = conv2d(h, p["expand"]["w"], stride=1, padding=0, dtype=compute_dtype)
        h, new_st["expand_bn"] = batch_norm(h, p["expand_bn"], st["expand_bn"], train=train)
        h = relu6(h)
    h = depthwise_conv2d(h, p["dw"]["w"], stride=stride, padding=1, dtype=compute_dtype)
    h, new_st["dw_bn"] = batch_norm(h, p["dw_bn"], st["dw_bn"], train=train)
    h = relu6(h)
    h = conv2d(h, p["project"]["w"], stride=1, padding=0, dtype=compute_dtype)
    h, new_st["project_bn"] = batch_norm(h, p["project_bn"], st["project_bn"], train=train)
    if spec.has_residual(s, b):
        h = h + x
    return h, new_st


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
