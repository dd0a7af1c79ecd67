"""Structured pruning engine: select → physically re-pack → fine-tune.

TPU-native rebuild of ``StructuredPruningEngine``
(`pruning/pruning_engine_structured.py:10-184`). Differences by design:

* channels are *physically removed* by re-packing dense arrays keyed by the
  width descriptor — the pruned model is an ordinary (smaller) ResNet whose
  spec serializes to JSON, not a pickled module (`pruning/main.py:164-166`),
* ``round_to`` is load-bearing on TPU: keeping channel counts at multiples
  of 8 (VPU sublanes) / 128 (lanes) preserves XLA tiling efficiency,
* head protection is structural: the classifier is not part of any prunable
  group (reference ignores head modules at `pruning_engine_structured.py:35-43`).
"""

from __future__ import annotations

import copy
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ...models.widths import ResNetSpec
from .graph import IN_AXIS, get_path, group_slices, set_path
from .importance import channel_importance

GroupKey = Tuple


def _keep_count(width: int, ratio: float, round_to: int) -> int:
    n_prune = int(ratio * width)
    keep = width - n_prune
    if round_to > 1:
        keep = int(round(keep / round_to)) * round_to
    return int(min(max(keep, min(round_to, width), 1), width))


def select_channels(
    spec: ResNetSpec,
    params,
    *,
    ratio: float,
    method: str = "l2",
    global_pruning: bool = False,
    round_to: int = 1,
    rng: Optional[np.random.Generator] = None,
    grads=None,
) -> Dict[GroupKey, np.ndarray]:
    """Choose kept channel indices (sorted, original order) per group."""
    groups = group_slices(spec)
    scores = {}
    for g in groups:
        s = channel_importance(g, params, method, rng=rng, grads=grads)
        lanes = int(g.get("lanes", 1))
        if lanes > 1:
            # Grouped-conv group (ResNeXt): selection granularity is a LANE
            # (one channel per cardinality group, same relative index) —
            # rank lane scores, importance summed across groups (channel
            # layout is group-major, so reshape axis 0 is the group index).
            s = s.reshape(lanes, len(s) // lanes).sum(axis=0)
        scores[tuple(g["key"])] = s

    if global_pruning:
        # One threshold across all groups on mean-normalized scores
        # (reference knob `p_config.py:33`).
        if ratio >= 1.0:
            raise ValueError(f"pruning ratio must be < 1.0, got {ratio}")
        all_scores = np.concatenate(
            [s / (s.mean() + 1e-12) for s in scores.values()]
        )
        # 'sn >= thresh' below keeps exactly len-k channels modulo ties;
        # clamp k so the index stays in range even at extreme ratios
        k = min(int(ratio * len(all_scores)), len(all_scores) - 1)
        thresh = np.partition(all_scores, k)[k] if k > 0 else -np.inf

    keep: Dict[GroupKey, np.ndarray] = {}
    for g in groups:
        key = tuple(g["key"])
        s = scores[key]  # lane scores for lane groups (see above)
        lanes = int(g.get("lanes", 1))
        per_group = len(s)  # == lanes count for lane groups
        if global_pruning:
            sn = s / (s.mean() + 1e-12)
            kept = np.flatnonzero(sn >= thresh)
            min_keep = max(1, min(round_to, len(s)))
            if len(kept) < min_keep:
                kept = np.argsort(-sn)[:min_keep]
            if round_to > 1 and lanes == 1:  # trim to multiple, dropping weakest
                n = max((len(kept) // round_to) * round_to, min_keep)
                kept = kept[np.argsort(-sn[kept])][:n]
        elif lanes > 1:
            # total keep rounded to round_to, then to whole lanes
            n_total = _keep_count(len(s) * lanes, ratio, round_to)
            n_lanes = int(min(max(round(n_total / lanes), 1), len(s)))
            kept = np.argsort(-s)[:n_lanes]
        else:
            n = _keep_count(len(s), ratio, round_to)
            kept = np.argsort(-s)[:n]  # strongest n
        if lanes > 1:  # expand kept lanes to absolute channel indices
            kept = (kept[None, :] + (np.arange(lanes) * per_group)[:, None]).ravel()
        keep[key] = np.sort(kept)
    return keep


def apply_pruning(
    spec, params, state, keep: Dict[GroupKey, np.ndarray]
) -> Tuple[ResNetSpec, dict, dict]:
    """Physically slice every coupled array; return the smaller model."""
    params = copy.deepcopy(jax.device_get(params))
    state = copy.deepcopy(jax.device_get(state))

    new_widths: Dict[GroupKey, int] = {}
    for g in group_slices(spec):
        key = tuple(g["key"])
        if key not in keep:
            continue
        idx = np.asarray(keep[key])
        for path, axis in g["producers"]:
            set_path(params, path, np.take(np.asarray(get_path(params, path)), idx, axis=axis))
        for bn_path in g["bns"]:
            bn_p = get_path(params, bn_path)
            bn_s = get_path(state, bn_path)
            for k in ("scale", "bias"):
                bn_p[k] = np.take(np.asarray(bn_p[k]), idx, axis=0)
            for k in ("mean", "var"):
                bn_s[k] = np.take(np.asarray(bn_s[k]), idx, axis=0)
        for path, axis in g["consumers"]:
            set_path(params, path, np.take(np.asarray(get_path(params, path)), idx, axis=axis))
        for path, n_groups in g.get("grouped_in", ()):
            # grouped conv kernel (H, W, C_in/groups, C_out): the input axis
            # is per-group RELATIVE indexing, sliced by the kept lanes
            per_group = g["width"] // n_groups
            rel = np.unique(idx % per_group)
            assert len(rel) * n_groups == len(idx), (
                "grouped-conv keep set is not lane-structured: "
                f"{len(idx)} kept of {g['width']} over {n_groups} groups"
            )
            set_path(params, path, np.take(np.asarray(get_path(params, path)), rel, axis=IN_AXIS))
        for path in g.get("vectors", ()):  # 1-D biases (SE convs)
            set_path(params, path, np.take(np.asarray(get_path(params, path)), idx, axis=0))
        if g["fc_in"]:
            params["fc"]["w"] = np.take(np.asarray(params["fc"]["w"]), idx, axis=0)
        new_widths[key] = len(idx)

    return _rebuild_spec(spec, new_widths), params, state


def _rebuild_spec(spec, new_widths: Dict[GroupKey, int]):
    """Record pruned widths into a fresh descriptor (family-specific keys)."""
    from ...models.efficientnet import EfficientNetSpec
    from ...models.mobilenet import MobileNetV2Spec

    if isinstance(spec, EfficientNetSpec):
        widths = list(spec.stage_widths)
        hidden = [list(r) for r in spec.hidden_widths]
        se = [list(r) for r in spec.se_widths]
        stem, last = spec.stem_width, spec.last_width
        for key, n in new_widths.items():
            if key[0] == "stem":
                stem = n
            elif key[0] == "stage":
                widths[key[1]] = n
            elif key[0] == "hidden":
                hidden[key[1]][key[2]] = n
            elif key[0] == "se":
                se[key[1]][key[2]] = n
            elif key[0] == "last":
                last = n
        new = spec.with_widths(widths, hidden, stem, last, se_widths=se)
        # t=1 blocks share their input group: keep hidden == input width
        hidden2 = [list(r) for r in new.hidden_widths]
        for s, depth in enumerate(new.depths):
            for b in range(depth):
                if not new.has_expand[s][b]:
                    hidden2[s][b] = new.block_in_width(s, b)
        return new.with_widths(hidden_widths=hidden2)

    if isinstance(spec, MobileNetV2Spec):
        widths = list(spec.stage_widths)
        hidden = [list(r) for r in spec.hidden_widths]
        stem, last = spec.stem_width, spec.last_width
        for key, n in new_widths.items():
            if key[0] == "stem":
                stem = n
            elif key[0] == "stage":
                widths[key[1]] = n
            elif key[0] == "hidden":
                hidden[key[1]][key[2]] = n
            elif key[0] == "last":
                last = n
        new = spec.with_widths(widths, hidden, stem, last)
        # t=1 blocks share their input group: keep hidden == input width
        hidden2 = [list(r) for r in new.hidden_widths]
        for s, depth in enumerate(new.depths):
            for b in range(depth):
                if not new.has_expand[s][b]:
                    hidden2[s][b] = new.block_in_width(s, b)
        return new.with_widths(hidden_widths=hidden2)

    stage_widths = list(spec.stage_widths)
    inner = [[list(blk) for blk in stg] for stg in spec.inner_widths]
    stem_width = spec.stem_width
    for key, n in new_widths.items():
        if key[0] == "stem":
            stem_width = n
        elif key[0] == "stage":
            stage_widths[key[1]] = n
            if key[1] == 0 and spec.stem_tied_to_stage0:
                stem_width = n
        else:  # inner
            _, s, b, i = key
            if spec.groups > 1 and spec.block == "bottleneck":
                # grouped bottleneck: one welded inner group sets both widths
                inner[s][b] = [n] * len(inner[s][b])
            else:
                inner[s][b][i] = n
    return spec.with_widths(
        stage_widths=tuple(stage_widths), inner_widths=inner, stem_width=stem_width
    )


def taylor_grads(spec, params, state, batch, compute_dtype="float32"):
    """One-batch loss gradients for Taylor importance."""
    import jax.numpy as jnp

    from ...data.pipeline import normalize_images
    from ...models.registry import apply_model
    from ...train.losses import cross_entropy

    imgs_u8, labels, mask = batch

    def loss_fn(p):
        x = normalize_images(jnp.asarray(imgs_u8))
        logits, _ = apply_model(spec, p, state, x, train=False)
        return cross_entropy(logits, jnp.asarray(labels), jnp.asarray(mask))

    return jax.grad(loss_fn)(params)


def taylor_grads_accumulated(spec, params, state, batches, compute_dtype="float32"):
    """Mean loss gradient over a calibration set of batches.

    The reference's Taylor path sees exactly one batch (a single
    `pruner.step()` after one backward, `pruning_engine_structured.py:66,70`)
    which makes |w·g| rankings noise-dominated; averaging the gradient over N
    batches (jitted per-batch grad, running mean on device) recovers a usable
    estimator at identical peak memory."""
    mean = None
    n = 0
    grad_fn = jax.jit(
        lambda p, batch: taylor_grads(spec, p, state, batch, compute_dtype)
    )
    for batch in batches:
        g = grad_fn(params, batch)
        n += 1
        if mean is None:
            mean = g
        else:
            mean = jax.tree.map(lambda m, x: m + (x - m) / n, mean, g)
    if mean is None:
        raise ValueError("taylor_grads_accumulated: empty calibration iterable")
    return mean


def prune_model(
    spec,
    params,
    state,
    *,
    ratio: float,
    method: str = "l2",
    global_pruning: bool = False,
    round_to: int = 1,
    seed: int = 42,
    grads=None,
    keep: Optional[Dict[GroupKey, np.ndarray]] = None,
) -> Tuple[ResNetSpec, dict, dict]:
    """One-shot structured pruning (the reference's single `pruner.step()`).

    Dispatches per family: CNNs (ResNet/MobileNetV2) prune channel groups
    through the dependency graph; ViTs prune MLP channels + whole attention
    heads (see vit_engine)."""
    from ...models.vit import ViTSpec

    if isinstance(spec, ViTSpec):
        from .vit_engine import prune_vit

        return prune_vit(
            spec, params, state, ratio=ratio, method=method,
            round_to=round_to, seed=seed, keep=keep,
        )
    if keep is None:
        keep = select_channels(
            spec,
            params,
            ratio=ratio,
            method=method,
            global_pruning=global_pruning,
            round_to=round_to,
            rng=np.random.default_rng(seed),
            grads=grads,
        )
    return apply_pruning(spec, params, state, keep)


class StructuredPruningEngine:
    """Stage-3 engine: mirrors the reference class surface
    (`prune_model` / `finetune` / `evaluate_metrics` / `evaluate_accuracy`)."""

    def __init__(self, cfg, spec, params, state, logger):
        self.cfg = cfg
        self.spec = spec
        self.params = params
        self.state = state
        self.logger = logger

    def prune_model(self, grads=None, ratio=None):
        self.spec, self.params, self.state = prune_model(
            self.spec,
            self.params,
            self.state,
            ratio=self.cfg.pruning_ratio if ratio is None else ratio,
            method=self.cfg.pruning_method,
            global_pruning=self.cfg.global_pruning,
            round_to=self.cfg.round_to,
            seed=self.cfg.seed,
            grads=grads,
        )
        if hasattr(self.spec, "stage_widths"):  # CNN families
            self.logger.info(
                "pruned → stem %d, stages %s",
                self.spec.stem_width, self.spec.stage_widths,
            )
        else:  # ViT: widths live per-block (head/MLP pruning)
            self.logger.info("pruned → %s", self.spec.name)
        return self.spec, self.params, self.state

    def prune_iterative(self, train_d, val_d, fold_dir, grads_fn=None):
        """Gradual pruning: K prune→finetune cycles (extension; the reference
        is one-shot, `pruning_engine_structured.py:70`). Each step keeps
        (1-ratio)^(1/K) of the CURRENT channels so the compounded keep
        fraction matches a one-shot run at cfg.pruning_ratio; the short
        fine-tune between steps lets importance re-rank on recovered weights
        (Han et al.'s iterative prune-retrain loop). The final step ends
        un-finetuned so the caller's pruned / pruned+ft rows keep their
        one-shot meaning. `grads_fn(spec, params, state)` re-derives taylor
        grads on the current (pruned, re-tuned) model each step."""
        k = max(int(self.cfg.iterative_steps), 1)
        step_ratio = 1.0 - (1.0 - self.cfg.pruning_ratio) ** (1.0 / k)
        for i in range(k):
            grads = grads_fn(self.spec, self.params, self.state) if grads_fn else None
            self.prune_model(grads=grads, ratio=step_ratio)
            if train_d is not None:
                self.recalibrate(train_d)
            if i < k - 1 and self.cfg.iterative_ft_epochs > 0:
                self.logger.info(
                    "iterative step %d/%d: fine-tuning %d epoch(s) before next step",
                    i + 1, k, self.cfg.iterative_ft_epochs,
                )
                self.finetune(train_d, val_d, fold_dir,
                              epochs=self.cfg.iterative_ft_epochs)
        return self.spec, self.params, self.state

    def recalibrate(self, train_d):
        """Re-estimate BN running stats on train images (train/bn_recal.py).

        No-op when disabled or for BN-less families (ViT)."""
        if not getattr(self.cfg, "bn_recalibrate", True):
            return self.state
        from ...train.bn_recal import recalibrate_bn

        self.state = recalibrate_bn(
            self.spec, self.params, self.state, train_d[0],
            batch_size=self.cfg.batch_size,
            num_batches=getattr(self.cfg, "bn_recal_batches", 16),
            compute_dtype=self.cfg.compute_dtype,
        )
        return self.state

    def finetune(self, train_d, val_d, fold_dir, epochs=None):
        from ...train.loop import train_classifier

        epochs = self.cfg.finetune_epochs if epochs is None else epochs
        if epochs <= 0:
            return self.params, self.state
        self.params, self.state, _ = train_classifier(
            self.cfg,
            self.spec,
            self.params,
            self.state,
            train_d,
            val_d,
            fold_dir,
            self.logger,
            epochs=epochs,
            learning_rate=self.cfg.learning_rate,
            save=False,
        )
        return self.params, self.state

    def evaluate_metrics(self, test_d, tag=""):
        """accuracy + p50 latency (batch-1, 10 warmup / 50 timed, reference
        protocol) + FLOPs/MACs + params + serialized size."""
        import jax.numpy as jnp

        from ...data.pipeline import Batches, normalize_images
        from ...metrics.profile import (
            count_params,
            flops_of,
            latency_ms,
            model_size_bytes,
        )
        from ...models.registry import apply_model
        from ...train.loop import evaluate
        from ...train.steps import make_eval_step
        from ...utils import device_materialize

        params, state = device_materialize((self.params, self.state))
        eval_step = make_eval_step(self.spec, compute_dtype=self.cfg.compute_dtype)
        self.logger.info("%s: evaluating accuracy (first batch compiles)...", tag)
        res = evaluate(
            eval_step, params, state,
            Batches(test_d[0], test_d[1], self.cfg.batch_size),
            self.cfg.DEBUG_MODE,
        )

        spec = self.spec
        fwd = jax.jit(
            lambda p, s, x: apply_model(spec, p, s, normalize_images(x), train=False)[0]
        )
        h, w = self.cfg.image_size
        x1 = jnp.zeros((1, h, w, 3), jnp.uint8)
        self.logger.info("%s: measuring batch-1 latency + FLOPs...", tag)
        lat = latency_ms(fwd, params, state, x1)
        flops = flops_of(fwd, params, state, x1)
        metrics = {
            "Accuracy": res["acc"] * 100.0,
            "Latency (ms)": lat["p50"],
            "MACs (G)": flops / 2 / 1e9,
            "Params (M)": count_params(params) / 1e6,
            "Size (MB)": model_size_bytes(params, state) / 1e6,
        }
        self.logger.info("%s metrics: %s", tag, {k: round(v, 4) for k, v in metrics.items()})
        return metrics
