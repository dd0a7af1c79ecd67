"""Model zoo factory — the rebuild of the reference's ``create_model``
(`teacher_training/utils.py:21-66`): name → (spec, init, apply), head sized to
``num_classes``. Pruned architectures are created by passing a width
descriptor dict (from a checkpoint's ``.spec.json``) instead of a name.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax

from . import resnet
from .widths import ResNetSpec, resnet_spec

SpecLike = Union[str, Dict, ResNetSpec]


def make_spec(model: SpecLike, num_classes: int = 6, in_chans: int = 3) -> ResNetSpec:
    if isinstance(model, ResNetSpec):
        return model
    if isinstance(model, dict):
        return ResNetSpec.from_dict(model)
    return resnet_spec(model, num_classes=num_classes, in_chans=in_chans)


def create_model(
    model: SpecLike,
    num_classes: int = 6,
    *,
    key: jax.Array | None = None,
    pretrained: bool = False,
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
    params, state = resnet.init(key, spec)
    if pretrained:
        try:
            from .torch_import import load_torchvision_pretrained

            params, state = load_torchvision_pretrained(spec, params, state)
        except Exception:  # no cache / no network — keep random init
            pass
    return spec, params, state
