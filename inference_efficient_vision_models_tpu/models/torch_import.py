"""Checkpoint interop: torch/torchvision state_dicts → our pytrees.

The reference's artifacts are torch ``state_dict`` pickles, sometimes wrapped
in ``{"model_state_dict": …}`` and sometimes carrying a ``module.`` prefix
from DataParallel training (`quantization/utils.py:130-150` strips both).
This module converts those into our (params, state) pytrees so accuracy can
be compared apples-to-apples against reference-trained weights.

Tensor layout conversions: conv OIHW → HWIO, linear (O, I) → (I, O).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

from .widths import ResNetSpec


def _strip(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        # copy: .numpy() is a view into torch storage, which torch mutates
        # in place (e.g. BN running stats during a training forward)
        out[k] = np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0)).copy()


def from_torch_state_dict(
    spec: ResNetSpec, sd: Dict[str, Any]
) -> Tuple[Dict, Dict]:
    """Build (params, state) from a torchvision-style ResNet state_dict."""
    sd = _strip(sd)

    def bn(prefix):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
        return p, s

    params: Dict[str, Any] = {"conv1": {"w": _conv(sd["conv1.weight"])}}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = bn("bn1")

    n_convs = 2 if spec.block == "basic" else 3
    for s_i, depth in enumerate(spec.depths):
        lname = f"layer{s_i + 1}"
        lp, ls = {}, {}
        for b in range(depth):
            bp, bs = {}, {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = {"w": _conv(sd[f"{lname}.{b}.conv{c}.weight"])}
                bp[f"bn{c}"], bs[f"bn{c}"] = bn(f"{lname}.{b}.bn{c}")
            if f"{lname}.{b}.downsample.0.weight" in sd:
                bp["down_conv"] = {"w": _conv(sd[f"{lname}.{b}.downsample.0.weight"])}
                bp["down_bn"], bs["down_bn"] = bn(f"{lname}.{b}.downsample.1")
            lp[str(b)], ls[str(b)] = bp, bs
        params[lname], state[lname] = lp, ls

    params["fc"] = {
        "w": np.transpose(sd["fc.weight"], (1, 0)).copy(),
        "b": sd["fc.bias"],
    }
    return params, state


def from_torch_state_dict_mbv2(spec, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision-style MobileNetV2 state_dict → our (params, state).

    Naming contract (torchvision `mobilenet_v2`): ``features.0.{0,1}`` stem,
    ``features.i.conv.{0.0,0.1,1.0,1.1,2,3}`` inverted residuals (t>1) or
    ``conv.{0.0,0.1,1,2}`` (t=1), ``features.18.{0,1}`` last conv,
    ``classifier.1`` head.
    """
    sd = _strip(sd)

    def bn(prefix):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
        return p, s

    params: Dict[str, Any] = {"stem": {"w": _conv(sd["features.0.0.weight"])}}
    state: Dict[str, Any] = {}
    params["stem_bn"], state["stem_bn"] = bn("features.0.1")

    feat_i = 1
    for s_i, depth in enumerate(spec.depths):
        lp, ls = {}, {}
        for b in range(depth):
            pre = f"features.{feat_i}.conv"
            bp, bs = {}, {}
            if spec.has_expand[s_i][b]:
                bp["expand"] = {"w": _conv(sd[f"{pre}.0.0.weight"])}
                bp["expand_bn"], bs["expand_bn"] = bn(f"{pre}.0.1")
                dw_pre, proj_i, pbn_i = f"{pre}.1", 2, 3
            else:
                dw_pre, proj_i, pbn_i = f"{pre}.0", 1, 2
            bp["dw"] = {"w": _conv(sd[f"{dw_pre}.0.weight"])}
            bp["dw_bn"], bs["dw_bn"] = bn(f"{dw_pre}.1")
            bp["project"] = {"w": _conv(sd[f"{pre}.{proj_i}.weight"])}
            bp["project_bn"], bs["project_bn"] = bn(f"{pre}.{pbn_i}")
            lp[str(b)], ls[str(b)] = bp, bs
            feat_i += 1
        params[f"stage{s_i}"], state[f"stage{s_i}"] = lp, ls

    params["last"] = {"w": _conv(sd[f"features.{feat_i}.0.weight"])}
    params["last_bn"], state["last_bn"] = bn(f"features.{feat_i}.1")
    params["fc"] = {
        "w": np.transpose(sd["classifier.1.weight"], (1, 0)).copy(),
        "b": sd["classifier.1.bias"],
    }
    return params, state


def from_torch_state_dict_effnet(spec, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision-style EfficientNet state_dict → our (params, state).

    Naming contract (torchvision `efficientnet_b*`): ``features.0.{0,1}``
    stem, ``features.{s+1}.{b}.block.{j}`` MBConv where j = expand?, dw, SE
    (``fc1``/``fc2`` 1×1 convs with bias), project; ``features.8.{0,1}``
    last conv, ``classifier.1`` head. SE 1×1 conv kernels (O, I, 1, 1)
    become our (in, out) matrices.
    """
    sd = _strip(sd)

    def bn(prefix):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
        return p, s

    def se_fc(prefix):
        w = sd[f"{prefix}.weight"]  # (O, I, 1, 1)
        return {"w": np.transpose(w[:, :, 0, 0], (1, 0)).copy(), "b": sd[f"{prefix}.bias"]}

    params: Dict[str, Any] = {"stem": {"w": _conv(sd["features.0.0.weight"])}}
    state: Dict[str, Any] = {}
    params["stem_bn"], state["stem_bn"] = bn("features.0.1")

    for s_i, depth in enumerate(spec.depths):
        lp, ls = {}, {}
        for b in range(depth):
            pre = f"features.{s_i + 1}.{b}.block"
            bp, bs = {}, {}
            if spec.has_expand[s_i][b]:
                bp["expand"] = {"w": _conv(sd[f"{pre}.0.0.weight"])}
                bp["expand_bn"], bs["expand_bn"] = bn(f"{pre}.0.1")
                dw_i, se_i, proj_i = 1, 2, 3
            else:
                dw_i, se_i, proj_i = 0, 1, 2
            bp["dw"] = {"w": _conv(sd[f"{pre}.{dw_i}.0.weight"])}
            bp["dw_bn"], bs["dw_bn"] = bn(f"{pre}.{dw_i}.1")
            bp["se_reduce"] = se_fc(f"{pre}.{se_i}.fc1")
            bp["se_expand"] = se_fc(f"{pre}.{se_i}.fc2")
            bp["project"] = {"w": _conv(sd[f"{pre}.{proj_i}.0.weight"])}
            bp["project_bn"], bs["project_bn"] = bn(f"{pre}.{proj_i}.1")
            lp[str(b)], ls[str(b)] = bp, bs
        params[f"stage{s_i}"], state[f"stage{s_i}"] = lp, ls

    last_i = len(spec.depths) + 1
    params["last"] = {"w": _conv(sd[f"features.{last_i}.0.weight"])}
    params["last_bn"], state["last_bn"] = bn(f"features.{last_i}.1")
    params["fc"] = {
        "w": np.transpose(sd["classifier.1.weight"], (1, 0)).copy(),
        "b": sd["classifier.1.bias"],
    }
    return params, state


def from_torch_state_dict_vit(spec, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """timm-style ViT state_dict → our (params, state).

    Naming contract (timm `vision_transformer`): ``patch_embed.proj``,
    ``cls_token``, ``pos_embed``, ``blocks.i.{norm1,attn.qkv,attn.proj,
    norm2,mlp.fc1,mlp.fc2}``, ``norm``, ``head``.
    """
    sd = _strip(sd)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def lin(prefix):
        return {
            "w": np.transpose(sd[f"{prefix}.weight"], (1, 0)).copy(),
            "b": sd[f"{prefix}.bias"],
        }

    params: Dict[str, Any] = {
        "patch_embed": {
            "w": _conv(sd["patch_embed.proj.weight"]),
            "b": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": ln("norm"),
        "head": lin("head"),
        "blocks": {},
    }
    for i in range(spec.depth):
        pre = f"blocks.{i}"
        params["blocks"][str(i)] = {
            "ln1": ln(f"{pre}.norm1"),
            "qkv": lin(f"{pre}.attn.qkv"),
            "proj": lin(f"{pre}.attn.proj"),
            "ln2": ln(f"{pre}.norm2"),
            "mlp1": lin(f"{pre}.mlp.fc1"),
            "mlp2": lin(f"{pre}.mlp.fc2"),
        }
    return params, {}


def load_torch_checkpoint(spec: ResNetSpec, path: str) -> Tuple[Dict, Dict]:
    """Load a reference ``.pth`` checkpoint file (torch pickle) from disk."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # full pickled module (pruned artifact)
        sd = sd.state_dict()
    from .efficientnet import EfficientNetSpec
    from .mobilenet import MobileNetV2Spec
    from .vit import ViTSpec

    if isinstance(spec, EfficientNetSpec):
        return from_torch_state_dict_effnet(spec, sd)
    if isinstance(spec, MobileNetV2Spec):
        return from_torch_state_dict_mbv2(spec, sd)
    if isinstance(spec, ViTSpec):
        return from_torch_state_dict_vit(spec, sd)
    return from_torch_state_dict(spec, sd)


def load_torchvision_pretrained(spec: ResNetSpec, params, state):
    """ImageNet init from torchvision's local weight cache (keeps our head)."""
    import torchvision

    weights_enum = getattr(
        torchvision.models, f"ResNet{spec.name.replace('resnet', '')}_Weights"
    )
    model_fn = getattr(torchvision.models, spec.name)
    tm = model_fn(weights=weights_enum.DEFAULT)
    p2, s2 = from_torch_state_dict(spec_with_imagenet_head(spec), tm.state_dict())
    # keep our randomly-initialized head (reference replaces fc the same way,
    # `teacher_training/utils.py:41-43`)
    p2["fc"] = params["fc"]
    return p2, s2


def spec_with_imagenet_head(spec: ResNetSpec) -> ResNetSpec:
    import dataclasses

    return dataclasses.replace(spec, num_classes=1000)


# ----------------------------------------------------------------------------
# Generic pretrained init from a local weight cache (all four families)
# ----------------------------------------------------------------------------
# The reference constructs every backbone with ImageNet weights by default
# (`teacher_training/utils.py:29-43`, downloading through timm/torchvision).
# This environment has no network and no torchvision, so pretrained weights
# come from an on-disk cache of ``.pth`` state_dicts: `$IEVM_WEIGHTS_DIR`
# first, then the standard torch-hub checkpoint dir
# (`$TORCH_HOME/hub/checkpoints`, default `~/.cache/torch/hub/checkpoints`).
# Files match ``<model_name>[-_]*.pth`` — torchvision's own cache naming
# (e.g. ``resnet18-f37072fd.pth``, ``mobilenet_v2-b0353104.pth``).


def cached_weight_dirs():
    env = os.environ.get("IEVM_WEIGHTS_DIR")
    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch")
    )
    dirs = [env] if env else []
    dirs.append(os.path.join(torch_home, "hub", "checkpoints"))
    return [d for d in dirs if d and os.path.isdir(d)]


def find_cached_weights(name: str):
    """→ path of a cached ``.pth`` for a model name, or None."""
    import glob

    for d in cached_weight_dirs():
        exact = os.path.join(d, f"{name}.pth")
        if os.path.exists(exact):
            return exact
        hits = sorted(
            glob.glob(os.path.join(d, f"{name}-*.pth"))
            + glob.glob(os.path.join(d, f"{name}_*.pth"))
        )
        if hits:
            return hits[0]
    return None


def load_pretrained(spec, params, state, *, path: str | None = None):
    """ImageNet-init any family from a cached torch state_dict, keeping our
    randomly-initialized classifier head (the reference swaps the head the
    same way, `teacher_training/utils.py:40-57`).

    Raises FileNotFoundError when no cache entry exists for ``spec.name``."""
    import dataclasses

    import torch

    from .efficientnet import EfficientNetSpec
    from .mobilenet import MobileNetV2Spec
    from .vit import ViTSpec

    if path is None:
        path = find_cached_weights(spec.name)
    if path is None:
        raise FileNotFoundError(
            f"no cached weights for {spec.name!r} in "
            f"{cached_weight_dirs() or '$IEVM_WEIGHTS_DIR (unset)'}"
        )
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    # converters expect the checkpoint's own (ImageNet, 1000-class) head
    # shape; we discard it for ours below
    head_key = "head" if isinstance(spec, ViTSpec) else "fc"
    sd_head_rows = None
    strip = _strip(sd)
    for k in ("fc.weight", "classifier.1.weight", "head.weight"):
        if k in strip:
            sd_head_rows = int(strip[k].shape[0])
            break
    spec_full = (
        dataclasses.replace(spec, num_classes=sd_head_rows)
        if sd_head_rows is not None and sd_head_rows != spec.num_classes
        else spec
    )
    if isinstance(spec, EfficientNetSpec):
        p2, s2 = from_torch_state_dict_effnet(spec_full, sd)
    elif isinstance(spec, MobileNetV2Spec):
        p2, s2 = from_torch_state_dict_mbv2(spec_full, sd)
    elif isinstance(spec, ViTSpec):
        p2, s2 = from_torch_state_dict_vit(spec_full, sd)
    else:
        p2, s2 = from_torch_state_dict(spec_full, sd)
    p2[head_key] = params[head_key]
    return p2, s2
