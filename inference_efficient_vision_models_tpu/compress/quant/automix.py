"""Automatic mixed-precision policy search over the quantization taps.

Completes the sensitivity story (sensitivity.py): instead of handing the
user a ranked tap list, pick the SMALLEST set of activation taps to keep
in high precision such that the simulated static-int8 forward meets an
accuracy budget — measured, not guessed. The reference has no analog (its
method choice is global per model, `/root/reference/quantization/main.py:
184-262`); this is the per-point decision tool its FX observer machinery
never grew.

Search = greedy prefix over the isolated-sensitivity ranking:

1. rank every tap by isolated logit RMSE (the tap_sensitivity sweep),
2. for k = 0, 1, 2, ...: exempt the top-k taps from quantization
   (weights stay on the int8 grid — re-fitting those is QAT's job),
   run the switch forward over the eval split, record top-1-vs-float
   flip rate and labeled accuracy,
3. stop at the first k whose flip rate <= ``flip_budget`` (or at
   ``max_float_taps``).

Greedy-prefix is the right shape here because isolated sensitivities are
near-additive in practice (REPORT.md's ef2 analysis: __all__ ~ sum of
parts + weight grid); a full combinatorial search would re-measure 2^N
patterns to shave at most one or two taps.

TPU design: every pattern is the SAME compiled executable — the on/off
switches are traced scalars (see sensitivity.make_switch_forward), so the
whole ladder costs (k_max + 2) eval passes and zero recompiles.

Deployment mapping: the returned float set is the policy input for the
real executors — all-int8 (empty set), the MBConv ``mixed`` executor
(depthwise taps float), the ViT bf16-carrier (attention-tail taps float),
or W8A16 (every tap float) — and the simulated ladder tells you which
rung you actually need before you commit to a runtime.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .observers import ObserverState
from .sensitivity import make_switch_forward

__all__ = ["auto_mixed_policy"]


def auto_mixed_policy(
    spec,
    qmod,
    folded,
    observers: Dict[str, ObserverState],
    eval_data,
    *,
    flip_budget: float = 0.01,
    max_float_taps: int = 8,
    batch_size: int = 32,
    max_images: int = 256,
    skip_taps: tuple = ("input",),
    logger=None,
) -> Tuple[List[str], List[dict]]:
    """Pick the smallest float-tap set meeting ``flip_budget``.

    ``eval_data`` is ``(images_u8, labels)``; labels are used only for the
    reported accuracy column (the stopping metric is the label-free
    top-1-vs-float flip rate, so the search itself never sees test labels
    — calibration data is a valid input).

    Returns ``(float_taps, ladder)`` where ``ladder[k]`` is
    ``{"k", "float_taps", "top1_flips", "logit_rmse", "acc"}`` for the
    top-k-exempt configuration; ``float_taps`` is the first rung meeting
    the budget (the full ladder is returned even then, for reporting).
    """
    imgs = np.asarray(eval_data[0][:max_images])
    labels = np.asarray(eval_data[1][: len(imgs)])
    n = (len(imgs) // batch_size) * batch_size
    imgs, labels = imgs[:n], labels[:n]

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)
    fwd, names = make_switch_forward(
        spec, qmod, folded, observers, skip_taps=skip_taps
    )

    def run(float_set, fq_w):
        sw = {
            name: jnp.float32(0.0 if name in float_set else 1.0)
            for name in names
        }
        outs = []
        for i in range(0, n, batch_size):
            outs.append(
                np.asarray(
                    fwd(params, sw, jnp.float32(fq_w), jnp.asarray(imgs[i : i + batch_size]))
                )
            )
        return np.concatenate(outs)

    clean = run(frozenset(names), 0.0)  # everything float, float weights
    ref_rms = float(np.sqrt(np.mean(clean**2))) + 1e-12
    ref_top1 = clean.argmax(1)

    # phase 1 — isolated ranking (the tap_sensitivity sweep, same compiled
    # executable: only this tap quantized, weights float)
    others = {name: frozenset(m for m in names if m != name) for name in names}
    ranking = sorted(
        names,
        key=lambda name: -float(
            np.sqrt(np.mean((run(others[name], 0.0) - clean) ** 2))
        ),
    )

    ladder: List[dict] = []
    for k in range(0, min(max_float_taps, len(ranking)) + 1):
        float_set = frozenset(ranking[:k])
        logits = run(float_set, 1.0)
        flips = float((logits.argmax(1) != ref_top1).mean())
        rmse = float(np.sqrt(np.mean((logits - clean) ** 2))) / ref_rms
        acc = float((logits.argmax(1) == labels).mean())
        ladder.append(
            {
                "k": k,
                "float_taps": sorted(float_set),
                "top1_flips": flips,
                "logit_rmse": rmse,
                "acc": acc,
            }
        )
        if logger is not None:
            logger.info(
                "automix k=%d flips %.3f rmse %.4f acc %.4f (+%s)",
                k, flips, rmse, acc, ranking[k - 1] if k else "-",
            )
        if flips <= flip_budget:
            chosen = ranking[:k]
            break
    else:
        if logger is not None:
            logger.info(
                "automix: budget %.3f not met within %d taps; returning the "
                "deepest rung (consider qat_epochs or W8A16 instead)",
                flip_budget, max_float_taps,
            )
        chosen = ladder[-1]["float_taps"]
    return list(chosen), ladder
