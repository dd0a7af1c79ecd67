"""Model zoo factory — the rebuild of the reference's ``create_model``
(`teacher_training/utils.py:21-66`): name → (spec, init, apply), head sized to
``num_classes``. Pruned architectures are created by passing a width
descriptor dict (from a checkpoint's ``.spec.json``) instead of a name.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax

from . import efficientnet, mobilenet, resnet, vit
from .efficientnet import EfficientNetSpec, efficientnet_spec
from .mobilenet import MobileNetV2Spec, mobilenet_v2_spec
from .vit import ViTSpec, vit_spec
from .widths import ResNetSpec, resnet_spec

SpecLike = Union[str, Dict, ResNetSpec, ViTSpec, MobileNetV2Spec, EfficientNetSpec]

# User-registered model names → spec constructor. The analog of the
# reference's any-timm-name passthrough (`teacher_training/utils.py:21-28`):
# there is no timm in this stack, but any spec expressible over the four
# family dataclasses (arbitrary widths/depths/patch sizes) can be bound to a
# name here and then used from every stage CLI via ``model_name=<name>``.
_CUSTOM: Dict[str, Any] = {}


def register_model(name: str, spec_fn, *, overwrite: bool = False) -> None:
    """Register ``name`` → ``spec_fn(num_classes=..., in_chans=...) -> spec``.

    The returned spec must be one of the four family dataclasses (they carry
    the functional module dispatch); every downstream subsystem — training,
    KD, the pruning dependency graph, all quantization modes, serving — works
    on any such spec, so a registered name is a first-class zoo member.
    """
    if name in _CUSTOM and not overwrite:
        raise ValueError(f"model {name!r} already registered")
    _CUSTOM[name] = spec_fn


def registered_models():
    return sorted(_CUSTOM)


def spec_from_dict(d: Dict):
    """Spec-JSON → the right spec dataclass (non-resnet dicts carry __kind__)."""
    kind = d.get("__kind__")
    if kind == "vit" or "patch" in d:
        return ViTSpec.from_dict(d)
    if kind == "efficientnet" or "se_widths" in d:
        return EfficientNetSpec.from_dict(d)
    if kind == "mobilenet_v2" or "hidden_widths" in d:
        return MobileNetV2Spec.from_dict(d)
    return ResNetSpec.from_dict(d)


def make_spec(model: SpecLike, num_classes: int = 6, in_chans: int = 3):
    if isinstance(model, (ResNetSpec, ViTSpec, MobileNetV2Spec, EfficientNetSpec)):
        return model
    if isinstance(model, dict):
        return spec_from_dict(model)
    if model in _CUSTOM:
        return _CUSTOM[model](num_classes=num_classes, in_chans=in_chans)
    if model.startswith("vit_"):
        return vit_spec(model, num_classes=num_classes)
    if model.startswith("efficientnet"):
        return efficientnet_spec(model, num_classes=num_classes, in_chans=in_chans)
    if model.startswith("mobilenet_v2"):
        return mobilenet_v2_spec(model, num_classes=num_classes, in_chans=in_chans)
    return resnet_spec(model, num_classes=num_classes, in_chans=in_chans)


def model_module(spec):
    """The functional module (init/apply/param_count) for a spec."""
    if isinstance(spec, ViTSpec):
        return vit
    if isinstance(spec, EfficientNetSpec):
        return efficientnet
    if isinstance(spec, MobileNetV2Spec):
        return mobilenet
    return resnet


def apply_model(spec, params, state, x, *, train=False, compute_dtype=None, **kw):
    """Model-generic forward used by the train/eval steps."""
    import jax.numpy as jnp

    dtype = compute_dtype if compute_dtype is not None else jnp.float32
    return model_module(spec).apply(
        spec, params, state, x, train=train, compute_dtype=dtype, **kw
    )


def features_and_logits(spec, params, state, x, *, train=False, compute_dtype=None):
    """One forward returning (feats, logits, new_state).

    Every family ends in ``logits = feats @ head.w + head.b`` on the pooled
    penultimate feature (resnet.apply:207-209 and counterparts), so the head
    is applied here on top of the ``return_features=True`` forward — one
    trunk execution, both outputs. Used by the feature-distillation KD step."""
    feats, new_state = apply_model(
        spec, params, state, x, train=train, compute_dtype=compute_dtype,
        return_features=True,
    )
    head = params["head"] if isinstance(spec, ViTSpec) else params["fc"]
    logits = feats @ head["w"] + head["b"]
    return feats, logits, new_state


def create_model(
    model: SpecLike,
    num_classes: int = 6,
    *,
    key: jax.Array | None = None,
    pretrained: bool = False,
    logger=None,
) -> Tuple[ResNetSpec, Any, Any]:
    """Returns ``(spec, params, state)``.

    ``pretrained=True`` initializes from torchvision's ImageNet weights when a
    local torchvision cache is available (no network access is assumed);
    otherwise falls back to random init with a warning — the reference
    downloads weights at `teacher_training/utils.py:32-43`.
    """
    spec = make_spec(model, num_classes=num_classes)
    if key is None:
        key = jax.random.PRNGKey(0)
    params, state = model_module(spec).init(key, spec)
    if pretrained:
        # Every family initializes from a cached torch state_dict via its
        # torch_import converter (IEVM_WEIGHTS_DIR / torch-hub cache;
        # torchvision's downloader as a last resort for ResNets).
        try:
            from .torch_import import find_cached_weights, load_pretrained

            if find_cached_weights(spec.name) is None and isinstance(spec, ResNetSpec):
                from .torch_import import load_torchvision_pretrained

                params, state = load_torchvision_pretrained(spec, params, state)
            else:
                params, state = load_pretrained(spec, params, state)
        except Exception as e:  # no cache / no network — keep random init
            # never fall back silently: a pretrained=True run that quietly
            # trains from scratch is a correctness trap (the reference logs
            # the failure too, `teacher_training/utils.py:61-66`)
            import logging

            (logger or logging.getLogger("ievm")).warning(
                "pretrained=True requested for %s but no local weight cache "
                "has it (%s: %s) — falling back to RANDOM init (set "
                "IEVM_WEIGHTS_DIR or populate ~/.cache/torch/hub/checkpoints)",
                spec.name, type(e).__name__, e,
            )
    return spec, params, state
