"""Conv–BatchNorm folding for the inference/quantization path.

Every conv in our ResNets is conv→BN; in eval mode BN is an affine transform
per output channel, so it folds into the conv kernel and a bias:

    W'[..., c] = W[..., c] · γ_c / sqrt(σ²_c + eps)
    b'_c       = β_c − μ_c · γ_c / sqrt(σ²_c + eps)

(The FX `prepare_fx` does the same fusion before observer insertion —
`quantization/main.py:231-233`.) The folded model is also the fast FP32/bf16
serving path: one fused conv+bias+relu per layer.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ...models.resnet import BN_EPS
from ...models.widths import ResNetSpec


def _fold_one(conv_w, bn_p, bn_s) -> Tuple[np.ndarray, np.ndarray]:
    w = np.asarray(conv_w, np.float32)
    gamma = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    inv = gamma / np.sqrt(var + BN_EPS)
    return w * inv.reshape(1, 1, 1, -1), beta - mean * inv


def fold_conv_bn(spec: ResNetSpec, params, state) -> Dict:
    """→ folded pytree: each conv becomes {"w": HWIO, "b": [oc]}; no BN."""
    out: Dict = {}
    out["conv1"] = dict(zip("wb", _fold_one(params["conv1"]["w"], params["bn1"], state["bn1"])))
    n_convs = 2 if spec.block == "basic" else 3
    for s, depth in enumerate(spec.depths):
        lname = f"layer{s + 1}"
        out[lname] = {}
        for b in range(depth):
            bp = params[lname][str(b)]
            bs = state[lname][str(b)]
            blk: Dict = {}
            for c in range(1, n_convs + 1):
                blk[f"conv{c}"] = dict(
                    zip("wb", _fold_one(bp[f"conv{c}"]["w"], bp[f"bn{c}"], bs[f"bn{c}"]))
                )
            if "down_conv" in bp:
                blk["down"] = dict(
                    zip("wb", _fold_one(bp["down_conv"]["w"], bp["down_bn"], bs["down_bn"]))
                )
            out[lname][str(b)] = blk
    out["fc"] = {
        "w": np.asarray(params["fc"]["w"], np.float32),
        "b": np.asarray(params["fc"]["b"], np.float32),
    }
    return out


def fold_effnet(spec, params, state) -> Dict:
    """EfficientNet conv–BN fold: fold_mbv2's topology plus the SE gate's
    (bias-carrying, BN-free) fc pair copied through as fp32 — the gate is a
    tiny (N, C) matmul pair kept in float even on the int8 path."""
    out = fold_mbv2(spec, params, state)
    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            bp = params[f"stage{s}"][str(b)]
            for k in ("se_reduce", "se_expand"):
                out[f"stage{s}"][str(b)][k] = {
                    "w": np.asarray(bp[k]["w"], np.float32),
                    "b": np.asarray(bp[k]["b"], np.float32),
                }
    return out


def fold_mbv2(spec, params, state) -> Dict:
    """MobileNetV2 conv–BN fold (same math; depthwise kernels fold on their
    HWIO output axis exactly like regular convs). Layout mirrors the params
    pytree: stem / stage{s}/{b}/{expand?,dw,project} / last / fc."""
    out: Dict = {}
    out["stem"] = dict(zip("wb", _fold_one(params["stem"]["w"], params["stem_bn"], state["stem_bn"])))
    for s, depth in enumerate(spec.depths):
        sname = f"stage{s}"
        out[sname] = {}
        for b in range(depth):
            bp = params[sname][str(b)]
            bs = state[sname][str(b)]
            blk: Dict = {}
            if spec.has_expand[s][b]:
                blk["expand"] = dict(
                    zip("wb", _fold_one(bp["expand"]["w"], bp["expand_bn"], bs["expand_bn"]))
                )
            blk["dw"] = dict(zip("wb", _fold_one(bp["dw"]["w"], bp["dw_bn"], bs["dw_bn"])))
            blk["project"] = dict(
                zip("wb", _fold_one(bp["project"]["w"], bp["project_bn"], bs["project_bn"]))
            )
            out[sname][str(b)] = blk
    out["last"] = dict(zip("wb", _fold_one(params["last"]["w"], params["last_bn"], state["last_bn"])))
    out["fc"] = {
        "w": np.asarray(params["fc"]["w"], np.float32),
        "b": np.asarray(params["fc"]["b"], np.float32),
    }
    return out
