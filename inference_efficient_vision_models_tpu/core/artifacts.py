"""Experiment artifact store.

Keeps the reference's on-disk contract (`teacher_training/utils.py:178-284`):

    output/<stage>/<experiment>/
        fold_idx_dict.json          # persisted CV split (written once, stage 1)
        <experiment>.log
        fold_<k>/
            model_best.msgpack      # pytree checkpoint (best val accuracy)
            model_last.msgpack
            model_best.spec.json    # architecture descriptor (widths etc.)
            training_log.json       # per-epoch history
            training_curves.png

TPU-rebuild differences:

* checkpoints are msgpack-serialized pytrees (flax.serialization), not torch
  pickles — and every checkpoint carries a JSON *architecture descriptor* next
  to it, so shape-changed (pruned) models are reconstructible from metadata
  instead of the reference's full-module pickle (`pruning/main.py:164-166`).
* there is exactly one split implementation and one on-disk split file; later
  stages reload it instead of re-deriving (fixes the reference's
  "val"/"validation" key and shuffle inconsistencies, SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

BEST = "best"
LAST = "last"


def _ckpt_path(fold_dir: str, which: str) -> str:
    return os.path.join(fold_dir, f"model_{which}.msgpack")


def _spec_path(fold_dir: str, which: str) -> str:
    return os.path.join(fold_dir, f"model_{which}.spec.json")


def save_checkpoint(
    fold_dir: str,
    which: str,
    params: Any,
    state: Any = None,
    spec: Any = None,
    extra: Optional[Dict[str, Any]] = None,
    opt: Any = None,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Serialize ``{'params', 'state'[, 'opt', 'meta']}`` to msgpack + spec JSON.

    ``opt``/``meta`` (optimizer state, epoch counters) make the checkpoint
    resumable after preemption — the reference always restarted from scratch
    (SURVEY.md §5 checkpoint/resume)."""
    os.makedirs(fold_dir, exist_ok=True)
    bundle = {
        "params": jax.device_get(params),
        "state": jax.device_get(state) if state is not None else {},
    }
    if opt is not None:
        bundle["opt"] = jax.device_get(opt)
    if meta is not None:
        bundle["meta"] = {k: np.asarray(v) for k, v in meta.items()}
    path = _ckpt_path(fold_dir, which)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(bundle))
    if spec is not None:
        if hasattr(spec, "to_dict"):
            spec_dict = spec.to_dict()
        elif dataclasses.is_dataclass(spec):
            spec_dict = dataclasses.asdict(spec)
        else:
            spec_dict = dict(spec)
        if extra:
            spec_dict = {**spec_dict, "__extra__": extra}
        with open(_spec_path(fold_dir, which), "w") as f:
            json.dump(spec_dict, f, indent=2, default=_json_default)
    return path


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def load_spec_dict(fold_dir: str, which: str = BEST) -> Optional[Dict[str, Any]]:
    path = _spec_path(fold_dir, which)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_checkpoint(fold_dir: str, which: str, template: Any) -> Tuple[Any, Any]:
    """Deserialize into the structure of ``template`` ({'params','state'})."""
    path = _ckpt_path(fold_dir, which)
    with open(path, "rb") as f:
        bundle = serialization.from_bytes(template, f.read())
    return bundle["params"], bundle["state"]


def load_checkpoint_raw(fold_dir: str, which: str) -> Dict[str, Any]:
    """Deserialize without a template (msgpack → nested dicts of np arrays)."""
    path = _ckpt_path(fold_dir, which)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def checkpoint_exists(fold_dir: str, which: str) -> bool:
    return os.path.exists(_ckpt_path(fold_dir, which))


# -- CV split persistence (reference `utils.py:188-191` fold_idx_dict.json) --


def save_fold_split(output_dir: str, fold_idx_dict: Dict) -> str:
    path = os.path.join(output_dir, "fold_idx_dict.json")
    clean = {
        str(k): {s: [int(i) for i in idx] for s, idx in v.items()}
        for k, v in fold_idx_dict.items()
    }
    with open(path, "w") as f:
        json.dump(clean, f)
    return path


def load_fold_split(output_dir: str) -> Optional[Dict[int, Dict[str, list]]]:
    path = os.path.join(output_dir, "fold_idx_dict.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


# -- training history (reference `utils.py:208-211` training_log.json) -------


def save_training_log(fold_dir: str, history: Dict[str, list]) -> str:
    os.makedirs(fold_dir, exist_ok=True)
    path = os.path.join(fold_dir, "training_log.json")
    with open(path, "w") as f:
        json.dump(history, f, indent=2, default=_json_default)
    return path


def load_training_log(fold_dir: str) -> Optional[Dict[str, list]]:
    path = os.path.join(fold_dir, "training_log.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
