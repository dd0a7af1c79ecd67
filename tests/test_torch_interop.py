"""Reference-checkpoint interop: load .pth artifacts (incl. DataParallel
``module.`` prefixes and ``model_state_dict`` wrappers) into our pytrees —
the reference's tolerant-loading contract (`quantization/utils.py:130-150`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.models import resnet, resnet_spec
from inference_efficient_vision_models_tpu.models.torch_import import (
    from_torch_state_dict,
    load_torch_checkpoint,
)


def test_load_pth_with_module_prefix_and_wrapper(tmp_path):
    torch = pytest.importorskip("torch")
    from tests import torch_ref

    tm = torch_ref.resnet18(num_classes=6)
    tm.eval()
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    path = str(tmp_path / "model_best.pth")
    torch.save({"model_state_dict": sd}, path)

    spec = resnet_spec("resnet18", num_classes=6)
    params, state = load_torch_checkpoint(spec, path)

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got, _ = resnet.apply(spec, params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_load_full_pickled_module(tmp_path):
    """The reference saves pruned models as whole pickled modules
    (`pruning/main.py:164-166`); unpruned module pickles must load too."""
    torch = pytest.importorskip("torch")
    from tests import torch_ref

    tm = torch_ref.resnet18(num_classes=6)
    path = str(tmp_path / "pruned_model.pth")
    torch.save(tm, path)

    spec = resnet_spec("resnet18", num_classes=6)
    params, state = load_torch_checkpoint(spec, path)
    assert params["fc"]["w"].shape == (512, 6)
