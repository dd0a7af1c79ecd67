"""Per-layer quantization sensitivity analysis (mixed-precision advisor).

Answers "which layer hurts when quantized?" with measurements instead of
folklore — the evidence behind the per-family method guidance (REPORT.md's
family × method table). The reference has no analog; its method choice is
global per model (`/root/reference/quantization/main.py:184-262`).

For every quantization point (the SAME tap set the static-int8 conversion
uses, so the analysis can't drift from deployment), the float forward runs
with ONLY that activation fake-quantized to its calibrated range
(`qat.fake_quant_act`), and the logit distortion vs the clean float forward
is recorded:

* ``logit_rmse`` — RMS logit error normalized by the clean logits' RMS,
* ``top1_flips`` — fraction of eval images whose argmax changed.

Two aggregate rows complete the picture: ``__weights__`` (every weight on
its per-channel int8 grid, activations clean) and ``__all__`` (the full
static-int8 simulation — weights + every tap). ``__all__`` minus the sum
of parts exposes error cancellation/compounding.

TPU design: ONE jitted program for all rows. The per-tap on/off switches
are traced scalars (a pytree argument), so sweeping N taps costs N
executions of one compiled executable — not N compiles. The fake-quant ops
are elementwise round/clip pairs XLA fuses into the surrounding matmuls.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .observers import ObserverState, minmax_qparams_affine
from .qat import fake_quant_act, fq_weights

__all__ = ["tap_sensitivity", "make_switch_forward"]


def make_switch_forward(spec, qmod, folded, observers, *, skip_taps=("input",)):
    """ONE jitted fake-quant forward with per-tap on/off switches.

    Returns ``(fwd, names)`` where ``fwd(params, switches, fq_w, x_u8)``
    runs the folded float forward with tap ``n`` fake-quantized to its
    calibrated range iff ``switches[n]`` is 1.0, and every weight on its
    per-channel int8 grid iff ``fq_w`` is 1.0. The switches are traced
    scalars, so any on/off pattern reuses the same compiled executable —
    the shared engine under both the per-tap sensitivity sweep and the
    greedy mixed-precision search (automix.py)."""
    from ...data.pipeline import normalize_images

    names = [n for n in observers if n not in skip_taps]
    fq_params = {
        n: minmax_qparams_affine(observers[n].min, observers[n].max) for n in names
    }

    def _fwd(p, switches, fq_w, x_u8):
        def tap_fn(name, t):
            if name not in fq_params:
                return t
            s, zp = fq_params[name]
            on = switches[name]
            return on * fake_quant_act(t, s, zp) + (1.0 - on) * t

        w = jax.tree.map(
            lambda a, b: fq_w * a + (1.0 - fq_w) * b, fq_weights(p), p
        )
        return qmod.apply_folded(spec, w, normalize_images(x_u8), tap_fn=tap_fn)

    return jax.jit(_fwd), names


def tap_sensitivity(
    spec,
    qmod,
    folded,
    observers: Dict[str, ObserverState],
    eval_data,
    *,
    batch_size: int = 32,
    max_images: int = 256,
    skip_taps: tuple = ("input",),
    logger=None,
) -> List[dict]:
    """Measure each quantization point's isolated logit distortion.

    ``eval_data`` is ``(images_u8, labels)`` (labels unused — the metric is
    model-vs-itself, no ground truth needed). ``skip_taps`` defaults to the
    "input" tap: deployed stems fold normalization and consume raw uint8
    exactly (stemfold), so the input carries no quantization noise.

    Returns rows sorted most-sensitive-first:
    ``{"tap", "logit_rmse", "top1_flips"}`` plus the ``__weights__`` /
    ``__all__`` aggregates (appended last, unsorted).
    """
    imgs = np.asarray(eval_data[0][:max_images])
    n = (len(imgs) // batch_size) * batch_size
    if n == 0:
        raise ValueError(f"need >= {batch_size} eval images, got {len(imgs)}")
    imgs = imgs[:n]

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)
    fwd, names = make_switch_forward(
        spec, qmod, folded, observers, skip_taps=skip_taps
    )

    def run(switch_on: Optional[str], fq_w: float, all_on: bool = False):
        sw = {
            name: jnp.float32(1.0 if (all_on or name == switch_on) else 0.0)
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

    clean = run(None, 0.0)
    ref_rms = float(np.sqrt(np.mean(clean**2))) + 1e-12
    ref_top1 = clean.argmax(1)

    def metrics(logits):
        rmse = float(np.sqrt(np.mean((logits - clean) ** 2))) / ref_rms
        flips = float((logits.argmax(1) != ref_top1).mean())
        return rmse, flips

    rows = []
    for name in names:
        rmse, flips = metrics(run(name, 0.0))
        rows.append({"tap": name, "logit_rmse": rmse, "top1_flips": flips})
        if logger is not None:
            logger.info("sensitivity %-12s rmse %.4f flips %.3f", name, rmse, flips)
    rows.sort(key=lambda r: -r["logit_rmse"])

    for label, (sw, fqw, all_on) in {
        "__weights__": (None, 1.0, False),
        "__all__": (None, 1.0, True),
    }.items():
        rmse, flips = metrics(run(sw, fqw, all_on))
        rows.append({"tap": label, "logit_rmse": rmse, "top1_flips": flips})
        if logger is not None:
            logger.info("sensitivity %-12s rmse %.4f flips %.3f", label, rmse, flips)
    return rows
