"""Torch-checkpoint import CLI: reference `.pth` → fold dir → load_stage_model.

Closes VERDICT r3 item 5: a reference user migrating real checkpoints gets a
command-line path (`quantization/utils.py:130-150` tolerant-load contract)
instead of writing Python. Oracle round trip: torch_ref checkpoint → CLI →
``load_stage_model`` → logits match torch to 1e-4 (CPU backend, fp32).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.cli.import_torch import main as import_main
from inference_efficient_vision_models_tpu.cli.teacher import load_stage_model
from inference_efficient_vision_models_tpu.models.registry import apply_model


def test_import_cli_round_trip(tmp_path):
    torch = pytest.importorskip("torch")
    from tests import torch_ref

    tm = torch_ref.resnet18(num_classes=6)
    tm.eval()
    ckpt = str(tmp_path / "model_best.pth")
    # the wrapped + DataParallel-prefixed form the reference emits
    torch.save(
        {"model_state_dict": {"module." + k: v for k, v in tm.state_dict().items()}},
        ckpt,
    )

    out = str(tmp_path / "fold_0")
    import_main([ckpt, "model=resnet18", f"out={out}", "num_classes=6"])

    spec, params, state = load_stage_model(out, "best")
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got, _ = apply_model(spec, params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_import_cli_requires_model_and_out(tmp_path):
    with pytest.raises(SystemExit):
        import_main([str(tmp_path / "x.pth")])
