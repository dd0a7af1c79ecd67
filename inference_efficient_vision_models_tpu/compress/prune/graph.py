"""Channel-dependency graphs for structured pruning (ResNet, MobileNetV2,
EfficientNet).

The reference delegates dependency tracking to ``torch_pruning``'s dependency
graph traced from example inputs (`pruning/pruning_engine_structured.py:50-70`).
Here the graph is derived *statically from the width descriptor*: every
prunable width corresponds to one coupled group of parameter slices —

* producers: conv kernels whose OUTPUT channel dim carries the width
  (HWIO axis 3) + the BN that normalizes it (all vectors, axis 0),
* consumers: conv kernels whose INPUT channel dim carries it (HWIO axis 2),
  and the classifier kernel's input rows for the final group,
* depthwise kernels (MobileNetV2/EfficientNet) are a special edge: their
  HWIO shape is ``(k, k, 1, C)`` with input channels == output channels ==
  C, so they are listed as PRODUCERS (axis 3) of whatever group carries
  their channels — the group of the preceding expand conv, or the block's
  *input* group for t=1 blocks,
* squeeze-excitation (EfficientNet) couples twice: the gate's elementwise
  multiply puts ``se_expand``'s OUTPUT columns (and bias) in the hidden
  group alongside the dw conv, and ``se_reduce``'s INPUT rows consume it;
  the SE squeeze width itself is a free group. SE weights are 2-D
  ``(in, out)`` matrices, so their axes are 0/1 rather than HWIO 2/3; an
  optional ``vectors`` entry lists 1-D parameter arrays (biases) sliced on
  axis 0.

Residual adds force stage-wide coupling: every block output in a stage (plus
the downsample branch / the stem where tied) shares one group — pruning a
channel removes it from all of them simultaneously, exactly the coupling
torch_pruning discovers dynamically.

Paths are key tuples into the params/state pytrees of the family's model
module (models.resnet / models.mobilenet).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ...models.efficientnet import EfficientNetSpec
from ...models.mobilenet import MobileNetV2Spec
from ...models.widths import ResNetSpec

Path = Tuple[str, ...]

OUT_AXIS = 3  # HWIO conv kernel output-channel axis
IN_AXIS = 2   # HWIO conv kernel input-channel axis


def _last_conv(spec: ResNetSpec) -> str:
    return "conv2" if spec.block == "basic" else "conv3"


def group_slices(spec) -> List[Dict]:
    """Enumerate coupled groups with their parameter slices (any family).

    Each group dict:
      key:        family-specific tuple, e.g. ("stem",) | ("stage", s) |
                  ("inner", s, b, i) | ("hidden", s, b) | ("last",)
      width:      current channel count
      producers:  [(conv_w_path, OUT_AXIS), ...]
      bns:        [bn_path_prefix, ...]   (slice scale/bias/mean/var, axis 0)
      consumers:  [(conv_w_path, IN_AXIS), ...]
      fc_in:      True if fc kernel axis-0 rows are consumers
      protected:  True for groups that must never be pruned (none today; the
                  classifier head is simply not part of any group — head
                  protection as in reference `pruning_engine_structured.py:35-43`)
    """
    if isinstance(spec, EfficientNetSpec):
        return group_slices_effnet(spec)
    if isinstance(spec, MobileNetV2Spec):
        return group_slices_mbv2(spec)
    return group_slices_resnet(spec)


def group_slices_effnet(spec: EfficientNetSpec) -> List[Dict]:
    """Coupled groups of an EfficientNet (MBConv = MobileNetV2 inverted
    residual + squeeze-excitation; see group_slices_mbv2 for the base
    topology). Extra SE edges per block on the hidden group:
    producers += se_expand.w columns (axis 1) + se_expand.b; consumers +=
    se_reduce.w rows (axis 0). One free ("se", s, b) group per block for
    the squeeze width."""
    groups: List[Dict] = []

    def attach_consumer(group: Dict, s: int, b: int) -> None:
        """Wire group → block (s, b) whose INPUT carries the group's width."""
        base = (f"stage{s}", str(b))
        if spec.has_expand[s][b]:
            group["consumers"].append((base + ("expand", "w"), IN_AXIS))
        else:
            # t=1: the depthwise conv + SE gate operate directly on the
            # group's channels (cf. the mbv2 dw edge, plus the SE coupling)
            group["producers"].append((base + ("dw", "w"), OUT_AXIS))
            group["producers"].append((base + ("se_expand", "w"), 1))
            group["vectors"].append(base + ("se_expand", "b"))
            group["bns"].append(base + ("dw_bn",))
            group["consumers"].append((base + ("project", "w"), IN_AXIS))
            group["consumers"].append((base + ("se_reduce", "w"), 0))

    stem_group = {
        "key": ("stem",),
        "width": spec.stem_width,
        "producers": [(("stem", "w"), OUT_AXIS)],
        "bns": [("stem_bn",)],
        "consumers": [],
        "vectors": [],
        "fc_in": False,
    }
    attach_consumer(stem_group, 0, 0)
    groups.append(stem_group)

    for s, depth in enumerate(spec.depths):
        g = {
            "key": ("stage", s),
            "width": spec.stage_widths[s],
            "producers": [],
            "bns": [],
            "consumers": [],
            "vectors": [],
            "fc_in": False,
        }
        for b in range(depth):
            base = (f"stage{s}", str(b))
            g["producers"].append((base + ("project", "w"), OUT_AXIS))
            g["bns"].append(base + ("project_bn",))
            if b >= 1:
                attach_consumer(g, s, b)
        if s + 1 < len(spec.depths):
            attach_consumer(g, s + 1, 0)
        else:
            g["consumers"].append((("last", "w"), IN_AXIS))
        groups.append(g)

    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            base = (f"stage{s}", str(b))
            if spec.has_expand[s][b]:
                groups.append({
                    "key": ("hidden", s, b),
                    "width": spec.hidden_widths[s][b],
                    "producers": [
                        (base + ("expand", "w"), OUT_AXIS),
                        (base + ("dw", "w"), OUT_AXIS),
                        (base + ("se_expand", "w"), 1),
                    ],
                    "bns": [base + ("expand_bn",), base + ("dw_bn",)],
                    "consumers": [
                        (base + ("project", "w"), IN_AXIS),
                        (base + ("se_reduce", "w"), 0),
                    ],
                    "vectors": [base + ("se_expand", "b")],
                    "fc_in": False,
                })
            groups.append({
                "key": ("se", s, b),
                "width": spec.se_widths[s][b],
                "producers": [(base + ("se_reduce", "w"), 1)],
                "bns": [],
                "consumers": [(base + ("se_expand", "w"), 0)],
                "vectors": [base + ("se_reduce", "b")],
                "fc_in": False,
            })

    groups.append({
        "key": ("last",),
        "width": spec.last_width,
        "producers": [(("last", "w"), OUT_AXIS)],
        "bns": [("last_bn",)],
        "consumers": [],
        "vectors": [],
        "fc_in": True,
    })
    return groups


def group_slices_mbv2(spec: MobileNetV2Spec) -> List[Dict]:
    """Coupled groups of a MobileNetV2.

    * one group per stage (residual adds couple every block's project output
      with the next blocks' inputs),
    * the stem is its own group (consumed by stage-0 block 0),
    * one FREE group per expanded block: expand-out + depthwise + project-in,
    * t=1 blocks have no free hidden group — their depthwise kernel and BN
      ride the block's INPUT group (the new dw edge type),
    * the final 1×1 'last' conv is its own group feeding the classifier.
    """
    groups: List[Dict] = []

    def block_paths(s: int, b: int):
        return (f"stage{s}", str(b))

    def attach_consumer(group: Dict, s: int, b: int) -> None:
        """Wire group → block (s, b) whose INPUT carries the group's width."""
        base = block_paths(s, b)
        if spec.has_expand[s][b]:
            group["consumers"].append((base + ("expand", "w"), IN_AXIS))
        else:
            # t=1: the depthwise conv operates directly on the group's
            # channels — its kernel/BN carry them (sliced on OUT_AXIS; the
            # HWIO input axis has size 1) and the project conv consumes them
            group["producers"].append((base + ("dw", "w"), OUT_AXIS))
            group["bns"].append(base + ("dw_bn",))
            group["consumers"].append((base + ("project", "w"), IN_AXIS))

    # --- stem ---------------------------------------------------------------
    stem_group = {
        "key": ("stem",),
        "width": spec.stem_width,
        "producers": [(("stem", "w"), OUT_AXIS)],
        "bns": [("stem_bn",)],
        "consumers": [],
        "fc_in": False,
    }
    attach_consumer(stem_group, 0, 0)
    groups.append(stem_group)

    # --- one residual group per stage ----------------------------------------
    for s, depth in enumerate(spec.depths):
        g = {
            "key": ("stage", s),
            "width": spec.stage_widths[s],
            "producers": [],
            "bns": [],
            "consumers": [],
            "fc_in": False,
        }
        for b in range(depth):
            base = block_paths(s, b)
            g["producers"].append((base + ("project", "w"), OUT_AXIS))
            g["bns"].append(base + ("project_bn",))
            if b >= 1:
                attach_consumer(g, s, b)
        if s + 1 < len(spec.depths):
            attach_consumer(g, s + 1, 0)
        else:
            g["consumers"].append((("last", "w"), IN_AXIS))
        groups.append(g)

    # --- free hidden groups (expanded blocks only) ---------------------------
    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            if not spec.has_expand[s][b]:
                continue
            base = block_paths(s, b)
            groups.append({
                "key": ("hidden", s, b),
                "width": spec.hidden_widths[s][b],
                "producers": [
                    (base + ("expand", "w"), OUT_AXIS),
                    (base + ("dw", "w"), OUT_AXIS),
                ],
                "bns": [base + ("expand_bn",), base + ("dw_bn",)],
                "consumers": [(base + ("project", "w"), IN_AXIS)],
                "fc_in": False,
            })

    # --- last 1×1 conv → classifier ------------------------------------------
    groups.append({
        "key": ("last",),
        "width": spec.last_width,
        "producers": [(("last", "w"), OUT_AXIS)],
        "bns": [("last_bn",)],
        "consumers": [],
        "fc_in": True,
    })
    return groups


def group_slices_resnet(spec: ResNetSpec) -> List[Dict]:
    """Coupled groups of a ResNet (see group_slices for the dict contract)."""
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
    # ResNeXt (spec.groups > 1): conv2 is a grouped conv, which welds the
    # two bottleneck inner widths into ONE coupled group — conv1-out ==
    # conv2-in == conv2-out == conv3-in — with lane-structured selection:
    # channels can only be removed as whole LANES (the same within-group
    # relative index across all cardinality groups), because the grouped
    # kernel's HWIO input axis (size W/groups) is shared relative indexing
    # across output groups. This is the grouped dependency edge the
    # reference gets from torch_pruning's group-conv handling.
    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            if spec.groups > 1 and spec.block == "bottleneck":
                w0, w1 = spec.inner_widths[s][b]
                assert w0 == w1, (
                    f"grouped bottleneck ({s},{b}) needs equal inner widths, "
                    f"got {spec.inner_widths[s][b]}"
                )
                groups.append({
                    "key": ("inner", s, b, 0),
                    "width": w0,
                    "producers": [
                        ((layer(s), str(b), "conv1", "w"), OUT_AXIS),
                        ((layer(s), str(b), "conv2", "w"), OUT_AXIS),
                    ],
                    "bns": [(layer(s), str(b), "bn1"), (layer(s), str(b), "bn2")],
                    "consumers": [((layer(s), str(b), "conv3", "w"), IN_AXIS)],
                    # conv2's IN axis is per-group relative: sliced by LANE
                    # indices (idx % (W/groups)), not absolute channels
                    "grouped_in": [((layer(s), str(b), "conv2", "w"), spec.groups)],
                    "lanes": spec.groups,
                    "fc_in": False,
                })
                continue
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
