"""Pretrained-weight initialization from a local cache for ALL families
(models/torch_import.load_pretrained + registry wiring) — the reference
constructs every backbone with ImageNet weights by default
(`teacher_training/utils.py:29-43`)."""

import numpy as np
import pytest
import torch

from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.models.torch_import import (
    _conv,
    find_cached_weights,
)

from tests import torch_ref


_FAMILIES = {
    # our registry name -> (oracle ctor, our-params stem path, torch stem key)
    "resnet18": (torch_ref.resnet18, ("conv1", "w"), "conv1.weight"),
    "mobilenet_v2": (torch_ref.mobilenet_v2, ("stem", "w"), "features.0.0.weight"),
    "efficientnet_b0": (torch_ref.efficientnet_b0, ("stem", "w"), "features.0.0.weight"),
    "vit_tiny_patch16_224": (torch_ref.vit_tiny, ("patch_embed", "w"), "patch_embed.proj.weight"),
}


@pytest.fixture()
def weight_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("IEVM_WEIGHTS_DIR", str(tmp_path))
    return tmp_path


@pytest.mark.parametrize("name", list(_FAMILIES))
def test_pretrained_from_cache_all_families(name, weight_cache):
    ctor, stem_path, torch_key = _FAMILIES[name]
    tm = ctor(num_classes=1000)  # ImageNet-shaped head, like a real cache file
    # torchvision cache naming: <name>-<hash>.pth
    torch.save(tm.state_dict(), weight_cache / f"{name}-0badc0de.pth")
    assert find_cached_weights(name) is not None

    spec, params, state = create_model(name, num_classes=6, pretrained=True)

    node = params
    for k in stem_path:
        node = node[k]
    want = tm.state_dict()[torch_key].numpy()
    np.testing.assert_allclose(np.asarray(node), _conv(want), atol=1e-6)
    # our 6-class head survives (the reference swaps the head the same way)
    head = params["head" if name.startswith("vit") else "fc"]
    assert head["w"].shape[-1] == 6


def test_pretrained_missing_cache_warns_and_random_inits(weight_cache, caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="ievm"):
        spec, params, state = create_model(
            "mobilenet_v2", num_classes=6, pretrained=True
        )
    assert any("RANDOM init" in r.message for r in caplog.records)
    assert params["stem"]["w"].shape[-1] == spec.stem_width
