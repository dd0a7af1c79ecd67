"""Calibration observer menu: minmax-EMA, percentile, entropy (KL).

The reference's FX flow hardwires ``MovingAverageMinMaxObserver`` for
activations (`/root/reference/quantization/main.py:198-208`); that stays the
parity default. On top of it this module adds the two standard
outlier-robust range estimators, selectable per stage-4 run via
``QuantConfig.observer``:

* ``percentile`` — clip each tail at the (100−pct)% mass quantile of the
  calibration distribution (e.g. pct=99.99 keeps the central 99.98%).
* ``entropy`` — TensorRT-style KL(P‖Q) minimization, generalized to the
  affine/asymmetric quint8 scheme: search candidate (lo, hi) clip windows on
  a quantile grid; for each, simulate 256-level quantization by
  block-summing the window and re-expanding over nonzero bins, with clipped
  outlier mass mapped to the window-edge levels, and keep the window
  minimizing KL(P‖Q) **over the full support**. The full-support reference
  is the load-bearing detail: TensorRT's classic formulation folds clipped
  mass into the edge bins of BOTH distributions, which makes clipping free
  in the objective — on spike-plus-heavy-tail activations (EfficientNet
  SiLU) the narrowest candidate then always wins and saturates the
  informative tail (measured 36% vs 90% fp32 on ef2 before this fix; see
  tests/test_calib.py for the distilled regression).

All three run off ONE shared sweep over the model's activation taps
(``apply_folded(..., with_taps=True)``, the same tap set the conversions
consume): a jitted per-tap min/max pass, plus — for the histogram observers
— a second jitted pass that strided-subsamples each tap (≤2²⁰ elements) for
host-side ``np.histogram``. The binning deliberately does NOT run on device:
a 2048-bin bincount over a 50M-element activation is a giant scatter, which
TPUs serialize (the first attempt hung the chip); a static-strided slice is
free on the VPU and the host histograms a 4 MB sample in milliseconds.
Observers return the same ``Dict[str, ObserverState]`` the family
``convert_static_int8`` functions already take, so changing the estimator
never touches conversion code.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .observers import ObserverState

__all__ = ["calibrate_taps", "percentile_range", "entropy_range"]


def percentile_range(
    hist: np.ndarray, lo: float, hi: float, pct: float = 99.99
) -> Tuple[float, float]:
    """Two-sided percentile clip: keep the [(100−pct)%, pct%] mass window."""
    hist = np.asarray(hist, np.float64)
    total = hist.sum()
    if total <= 0:
        return lo, hi
    edges = np.linspace(lo, hi, len(hist) + 1)
    c = np.cumsum(hist) / total
    f = max((100.0 - pct) / 100.0, 0.0)
    lo_idx = int(np.searchsorted(c, f, side="left"))
    hi_idx = int(np.searchsorted(c, 1.0 - f, side="left"))
    hi_idx = min(hi_idx + 1, len(hist))
    if hi_idx <= lo_idx:
        return lo, hi
    return float(edges[lo_idx]), float(edges[hi_idx])


def _kl(p: np.ndarray, q: np.ndarray) -> float:
    p = p / p.sum()
    q = q / max(q.sum(), 1e-12)
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / np.maximum(q[mask], 1e-12))))


_Q_FLOOR = 1e-12  # q mass assigned to bins outside the clip window


def _quantize_expand(p: np.ndarray, nlevels: int) -> np.ndarray:
    """Simulate nlevels-bucket quantization of a distribution: block-sum,
    then spread each bucket's mass uniformly over its NONZERO source bins
    (TensorRT's expansion rule — empty bins stay empty)."""
    n = len(p)
    q = np.zeros_like(p)
    bounds = np.linspace(0, n, nlevels + 1).astype(int)
    for i in range(nlevels):
        s, e = bounds[i], bounds[i + 1]
        if e <= s:
            continue
        block = p[s:e]
        nz = block > 0
        cnt = int(nz.sum())
        if cnt:
            q[s:e][nz] = block.sum() / cnt
    return q


def entropy_range(
    hist: np.ndarray, lo: float, hi: float, *, nlevels: int = 256,
    tail_fracs=(0.0, 1e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2),
) -> Tuple[float, float]:
    """KL-minimizing asymmetric clip window over a quantile candidate grid."""
    hist = np.asarray(hist, np.float64)
    total = hist.sum()
    nbins = len(hist)
    if total <= 0:
        return lo, hi
    edges = np.linspace(lo, hi, nbins + 1)
    c = np.cumsum(hist) / total

    lo_cands = sorted({int(np.searchsorted(c, f, side="left")) for f in tail_fracs})
    hi_cands = sorted(
        {min(int(np.searchsorted(c, 1.0 - f, side="left")) + 1, nbins) for f in tail_fracs}
    )
    p_full = hist / total
    best = (lo, hi)
    best_kl = np.inf
    seen = set()
    for li in lo_cands:
        for hj in hi_cands:
            # a window narrower than the level count quantizes losslessly —
            # widen it to nlevels bins (cheapest window that still holds the
            # candidate's mass) instead of discarding the candidate, else a
            # narrow bulk inside a wide outlier support is never reachable
            if hj - li < nlevels:
                hj = min(li + nlevels, nbins)
                if hj - li < nlevels:
                    li = max(hj - nlevels, 0)
            if (li, hj) in seen:
                continue
            seen.add((li, hj))
            inner = hist[li:hj].astype(np.float64).copy()
            if inner.sum() <= 0:
                continue
            # clipped values saturate to the window-edge quantization levels
            inner[0] += hist[:li].sum()
            inner[-1] += hist[hj:].sum()
            q_full = np.full(nbins, _Q_FLOOR)
            q_full[li:hj] = np.maximum(_quantize_expand(inner, nlevels), _Q_FLOOR)
            kl = _kl(p_full, q_full)
            if kl < best_kl:
                best_kl = kl
                best = (float(edges[li]), float(edges[hj]))
    return best


def _tap_minmax_fn(apply_folded, spec):
    return jax.jit(
        lambda f, x: jax.tree.map(
            lambda t: (jnp.min(t.astype(jnp.float32)), jnp.max(t.astype(jnp.float32))),
            apply_folded(spec, f, x, with_taps=True)[1],
        )
    )


def calibrate_taps(
    apply_folded, spec, folded, batches, *, max_images: int = 256,
    observer: str = "minmax", averaging_constant: float = 0.01,
    percentile: float = 99.99, bins: int = 2048,
) -> Dict[str, ObserverState]:
    """Shared calibration driver for every quantized family module.

    ``observer``: 'minmax' (EMA, reference parity) | 'percentile' | 'entropy'.
    Returns tap name → ObserverState whose (min, max) is the chosen clip
    range; conversion code is estimator-agnostic.
    """
    from ...data.pipeline import normalize_images

    calib = []
    seen = 0
    for batch in batches:
        imgs = batch[0] if isinstance(batch, tuple) else batch
        calib.append(np.asarray(imgs))
        seen += int(len(imgs))
        if seen >= max_images:
            break
    tap_minmax = _tap_minmax_fn(apply_folded, spec)

    if observer == "minmax":
        obs: Dict[str, ObserverState] = {}
        for imgs in calib:
            mm = jax.device_get(tap_minmax(folded, normalize_images(jnp.asarray(imgs))))
            for name, (lo, hi) in mm.items():
                obs.setdefault(name, ObserverState.fresh())
                obs[name] = obs[name].update(lo, hi, averaging_constant)
        return obs
    if observer not in ("percentile", "entropy"):
        raise ValueError(f"unknown observer '{observer}'")

    # pass 1: global per-tap ranges (histogram support must cover everything)
    ranges: Dict[str, Tuple[float, float]] = {}
    for imgs in calib:
        mm = jax.device_get(tap_minmax(folded, normalize_images(jnp.asarray(imgs))))
        for name, (lo, hi) in mm.items():
            cur = ranges.get(name, (np.inf, -np.inf))
            ranges[name] = (min(cur[0], float(lo)), max(cur[1], float(hi)))
    ranges = {k: (lo, hi if hi > lo else lo + 1e-6) for k, (lo, hi) in ranges.items()}

    # pass 2: strided tap subsamples (static shapes) → host-side histograms
    cap = 1 << 20

    def subsample_all(f, x):
        taps = apply_folded(spec, f, x, with_taps=True)[1]
        out = {}
        for name, t in taps.items():
            flat = t.astype(jnp.float32).reshape(-1)
            stride = max(1, flat.shape[0] // cap)
            out[name] = flat[::stride]
        return out

    sub_fn = jax.jit(subsample_all)
    hists = {name: np.zeros(bins, np.int64) for name in ranges}
    for imgs in calib:
        ss = jax.device_get(sub_fn(folded, normalize_images(jnp.asarray(imgs))))
        for name, s in ss.items():
            h, _ = np.histogram(np.asarray(s), bins=bins, range=ranges[name])
            hists[name] += h.astype(np.int64)

    out: Dict[str, ObserverState] = {}
    for name, h in hists.items():
        lo, hi = ranges[name]
        if observer == "percentile":
            nlo, nhi = percentile_range(h, lo, hi, percentile)
        else:
            nlo, nhi = entropy_range(h, lo, hi)
        out[name] = ObserverState(float(nlo), float(nhi), True)
    return out
