#!/usr/bin/env python
"""Apples-to-apples training parity: torch pipeline vs this framework.

The reference's published numbers come from a PyTorch pipeline; torchvision
is not installed here, so the full reference can't run. This script trains
the SAME architecture (ResNet18, tests/torch_ref oracle) on the SAME
synthetic NEU-DET split with the SAME protocol (AdamW defaults, CE, per-epoch
shuffling) in both frameworks and compares test accuracy — the direct check
behind the "within 0.5% top-1 of the PyTorch reference" target.

Run: python scripts/compare_torch_parity.py  (CPU for torch; JAX on default)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EPOCHS = int(os.environ.get("PARITY_EPOCHS", 16))
BATCH = 32
LR = 1e-3
IMG = 64
SEED = 42


def data():
    from inference_efficient_vision_models_tpu.data import make_synthetic_neudet

    train = make_synthetic_neudet(100, IMG, seed=SEED)
    test = make_synthetic_neudet(50, IMG, seed=SEED + 1)
    return train, test


def run_torch(train, test):
    import torch
    import torch.nn.functional as F

    from tests import torch_ref

    torch.manual_seed(SEED)
    model = torch_ref.resnet18(num_classes=6)
    opt = torch.optim.AdamW(model.parameters(), lr=LR)
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255
    std = np.array([0.229, 0.224, 0.225], np.float32) * 255

    def to_t(imgs):
        x = (imgs.astype(np.float32) - mean) / std
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    def test_acc():
        model.eval()
        correct = 0
        with torch.no_grad():
            for s in range(0, len(test[1]), BATCH):
                out = model(to_t(test[0][s : s + BATCH]))
                correct += (out.argmax(1).numpy() == test[1][s : s + BATCH]).sum()
        return correct / len(test[1])

    imgs, labels = train
    rng = np.random.default_rng(SEED)
    n = len(labels)
    t0 = time.time()
    curve = []
    for epoch in range(EPOCHS):
        order = rng.permutation(n)
        model.train()
        for s in range(0, n, BATCH):
            idx = order[s : s + BATCH]
            opt.zero_grad()
            out = model(to_t(imgs[idx]))
            loss = F.cross_entropy(out, torch.from_numpy(labels[idx]).long())
            loss.backward()
            opt.step()
        curve.append(test_acc())
    return curve, time.time() - t0


def run_jax(train, test):
    """Bare loop, FINAL weights (no model selection) — mirrors run_torch."""
    from inference_efficient_vision_models_tpu.data.pipeline import Batches
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.train import (
        adamw_init,
        make_eval_step,
        make_train_step,
    )
    from inference_efficient_vision_models_tpu.train.loop import evaluate
    from inference_efficient_vision_models_tpu.utils import device_materialize

    spec, params, state = create_model("resnet18", num_classes=6)
    params, state = device_materialize((params, state))
    opt = adamw_init(params)
    step = make_train_step(spec, learning_rate=LR, compute_dtype="float32")
    es = make_eval_step(spec, compute_dtype="float32")
    loader = Batches(train[0], train[1], BATCH, shuffle=True, seed=SEED)
    test_loader = Batches(test[0], test[1], BATCH)
    t0 = time.time()
    curve = []
    for _epoch in range(EPOCHS):
        for batch in loader:
            params, state, opt, _m = step(params, state, opt, batch)
        curve.append(evaluate(es, params, state, test_loader)["acc"])
    return curve, time.time() - t0


def main():
    train, test = data()
    jax_curve, jax_s = run_jax(train, test)
    torch_curve, torch_s = run_torch(train, test)
    print(f"\nepoch | torch acc | jax acc   (matched budget: {EPOCHS} epochs, "
          f"torch {torch_s:.0f}s CPU, jax {jax_s:.0f}s)")
    for e, (t, j) in enumerate(zip(torch_curve, jax_curve)):
        print(f"{e + 1:5d} | {t * 100:8.2f}% | {j * 100:6.2f}%")
    print(f"final delta: {abs(torch_curve[-1] - jax_curve[-1]) * 100:.2f} points")
    # CSV for REPORT.md
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "output", "parity_curves.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("epoch,torch_acc,jax_acc\n")
        for e, (t, j) in enumerate(zip(torch_curve, jax_curve)):
            f.write(f"{e + 1},{t:.4f},{j:.4f}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
