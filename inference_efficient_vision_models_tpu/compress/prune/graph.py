"""Channel-dependency graph for structured pruning of ResNets.

The reference delegates dependency tracking to ``torch_pruning``'s dependency
graph traced from example inputs (`pruning/pruning_engine_structured.py:50-70`).
Here the graph is derived *statically from the width descriptor*: every
prunable width in ``ResNetSpec`` corresponds to one coupled group of
parameter slices —

* producers: conv kernels whose OUTPUT channel dim carries the width
  (HWIO axis 3) + the BN that normalizes it (all vectors, axis 0),
* consumers: conv kernels whose INPUT channel dim carries it (HWIO axis 2),
  and the classifier kernel's input rows for the final stage.

Residual adds force stage-wide coupling: every block output in a stage, its
downsample branch, and (for BasicBlock nets) the stem share one group —
pruning a channel removes it from all of them simultaneously, exactly the
coupling torch_pruning discovers dynamically.

Paths are key tuples into the params/state pytrees of models.resnet.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ...models.widths import ResNetSpec

Path = Tuple[str, ...]

OUT_AXIS = 3  # HWIO conv kernel output-channel axis
IN_AXIS = 2   # HWIO conv kernel input-channel axis


def _last_conv(spec: ResNetSpec) -> str:
    return "conv2" if spec.block == "basic" else "conv3"


def group_slices(spec: ResNetSpec) -> List[Dict]:
    """Enumerate coupled groups with their parameter slices.

    Each group dict:
      key:        ("stem",) | ("stage", s) | ("inner", s, b, i)
      width:      current channel count
      producers:  [(conv_w_path, OUT_AXIS), ...]
      bns:        [bn_path_prefix, ...]   (slice scale/bias/mean/var, axis 0)
      consumers:  [(conv_w_path, IN_AXIS), ...]
      fc_in:      True if fc kernel axis-0 rows are consumers
      protected:  True for groups that must never be pruned (none today; the
                  classifier head is simply not part of any group — head
                  protection as in reference `pruning_engine_structured.py:35-43`)
    """
    groups: List[Dict] = []
    lc = _last_conv(spec)

    def layer(s: int) -> str:
        return f"layer{s + 1}"

    n_stages = len(spec.depths)

    # --- stem group (only when NOT tied into stage 0) ---------------------
    if not spec.stem_tied_to_stage0:
        consumers = [((layer(0), "0", "conv1", "w"), IN_AXIS)]
        if spec.has_downsample(0, 0):
            consumers.append(((layer(0), "0", "down_conv", "w"), IN_AXIS))
        groups.append({
            "key": ("stem",),
            "width": spec.stem_width,
            "producers": [(("conv1", "w"), OUT_AXIS)],
            "bns": [("bn1",)],
            "consumers": consumers,
            "fc_in": False,
        })

    # --- one residual group per stage ------------------------------------
    for s, depth in enumerate(spec.depths):
        producers: List[Tuple[Path, int]] = []
        bns: List[Path] = []
        consumers: List[Tuple[Path, int]] = []

        if s == 0 and spec.stem_tied_to_stage0:
            producers.append((("conv1", "w"), OUT_AXIS))
            bns.append(("bn1",))
            # block 0 consumes the (same-group) stem width
            consumers.append(((layer(0), "0", "conv1", "w"), IN_AXIS))

        for b in range(depth):
            producers.append(((layer(s), str(b), lc, "w"), OUT_AXIS))
            bns.append((layer(s), str(b), f"bn{lc[-1]}"))
            if spec.has_downsample(s, b):
                producers.append(((layer(s), str(b), "down_conv", "w"), OUT_AXIS))
                bns.append((layer(s), str(b), "down_bn"))
            if b >= 1:
                consumers.append(((layer(s), str(b), "conv1", "w"), IN_AXIS))

        if s + 1 < n_stages:
            consumers.append(((layer(s + 1), "0", "conv1", "w"), IN_AXIS))
            if spec.has_downsample(s + 1, 0):
                consumers.append(((layer(s + 1), "0", "down_conv", "w"), IN_AXIS))
        fc_in = s + 1 == n_stages

        groups.append({
            "key": ("stage", s),
            "width": spec.stage_widths[s],
            "producers": producers,
            "bns": bns,
            "consumers": consumers,
            "fc_in": fc_in,
        })

    # --- free inner-conv groups ------------------------------------------
    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            for i, w in enumerate(spec.inner_widths[s][b]):
                conv_n = i + 1
                groups.append({
                    "key": ("inner", s, b, i),
                    "width": w,
                    "producers": [((layer(s), str(b), f"conv{conv_n}", "w"), OUT_AXIS)],
                    "bns": [(layer(s), str(b), f"bn{conv_n}")],
                    "consumers": [((layer(s), str(b), f"conv{conv_n + 1}", "w"), IN_AXIS)],
                    "fc_in": False,
                })
    return groups


def get_path(tree, path: Path):
    for p in path:
        tree = tree[p]
    return tree


def set_path(tree, path: Path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value
