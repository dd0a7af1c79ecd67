"""Architecture width descriptors.

The reference saves pruned models as whole pickled torch modules because
pruning physically changes tensor shapes (`pruning/main.py:164-166`,
`quantization/main.py:100-129`). The TPU rebuild replaces that with an
explicit, JSON-serializable *width descriptor*: every prunable channel count
is a field of the spec, so any (possibly pruned) architecture is
reconstructible from metadata and a flat pytree of dense arrays.

The descriptor also encodes the channel-coupling structure that structured
pruning must respect (residual adds force equal widths across a stage).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    """Complete shape description of a (possibly pruned) ResNet.

    ``stage_widths[s]`` is the *output* width of every block in stage ``s``
    (post-expansion for bottleneck nets) — one residual-coupled group per
    stage. ``inner_widths[s][b]`` are the free (uncoupled) widths of the
    non-final convs inside block ``b``: one entry for BasicBlock (conv1),
    two for Bottleneck (conv1, conv2).
    """

    name: str
    block: str  # 'basic' | 'bottleneck'
    depths: Tuple[int, ...]
    stage_widths: Tuple[int, ...]
    inner_widths: Tuple[Tuple[Tuple[int, ...], ...], ...]
    stem_width: int
    num_classes: int
    in_chans: int = 3
    # Cardinality (ResNeXt): conv2 of every bottleneck block is a grouped
    # conv with this many feature groups (torchvision `groups=32` etc.).
    # Pruning must then keep conv2's in/out widths equal and group-aligned —
    # the grouped dependency edge (see compress/prune/graph.py).
    groups: int = 1

    # -- derived structure -------------------------------------------------
    def block_in_width(self, s: int, b: int) -> int:
        if b > 0:
            return self.stage_widths[s]
        return self.stem_width if s == 0 else self.stage_widths[s - 1]

    def block_stride(self, s: int, b: int) -> int:
        return 2 if (s > 0 and b == 0) else 1

    def has_downsample(self, s: int, b: int) -> bool:
        return self.block_stride(s, b) != 1 or self.block_in_width(s, b) != self.stage_widths[s]

    @property
    def stem_tied_to_stage0(self) -> bool:
        """True when the stem output sits in stage 0's residual group.

        For BasicBlock nets (ResNet18/34) stage 0 has no downsample, so the
        identity path ties the stem width to every stage-0 block output; any
        pruning of one must prune all. Bottleneck nets always have a
        downsample in block 0, decoupling the stem.
        """
        return not self.has_downsample(0, 0)

    def feature_width(self) -> int:
        return self.stage_widths[-1]

    # -- editing (used by the pruner) -------------------------------------
    def with_widths(
        self,
        stage_widths: Tuple[int, ...] | None = None,
        inner_widths=None,
        stem_width: int | None = None,
    ) -> "ResNetSpec":
        return dataclasses.replace(
            self,
            stage_widths=tuple(stage_widths) if stage_widths is not None else self.stage_widths,
            inner_widths=_freeze_inner(inner_widths) if inner_widths is not None else self.inner_widths,
            stem_width=stem_width if stem_width is not None else self.stem_width,
        )

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Dict) -> "ResNetSpec":
        d = {k: v for k, v in d.items() if k != "__extra__"}
        d["depths"] = tuple(d["depths"])
        d["stage_widths"] = tuple(d["stage_widths"])
        d["inner_widths"] = _freeze_inner(d["inner_widths"])
        return ResNetSpec(**d)


def _freeze_inner(inner) -> Tuple[Tuple[Tuple[int, ...], ...], ...]:
    return tuple(tuple(tuple(int(w) for w in blk) for blk in stage) for stage in inner)


def _uniform_inner(block: str, depths, planes) -> Tuple:
    n_inner = 1 if block == "basic" else 2
    return _freeze_inner([[(p,) * n_inner for _ in range(d)] for d, p in zip(depths, planes)])


_PLANES = (64, 128, 256, 512)

# Bottleneck depth layouts keyed by torchvision's depth naming:
# total depth = 3·sum(depths) + 2 (stem conv + fc).
_DEPTH_TABLE = {
    26: (2, 2, 2, 2),
    38: (3, 3, 3, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}

_RESNEXT_RE = None  # compiled lazily
_WIDE_RE = None


def _parse_resnet_name(name: str):
    """Parametric fallback for torchvision-style family names not in the
    fixed table — the open-factory analog of the reference's any-name
    passthrough (`teacher_training/utils.py:21-66`):

      resnext<D>_<G>x<W>d   → bottleneck, cardinality G, base width W
      wide_resnet<D>_<k>    → bottleneck, base_width = 64·k

    Returns ``(block, depths, expansion, groups, base_width)`` or None.
    """
    global _RESNEXT_RE, _WIDE_RE
    import re

    if _RESNEXT_RE is None:
        _RESNEXT_RE = re.compile(r"^resnext(\d+)_(\d+)x(\d+)d$")
        _WIDE_RE = re.compile(r"^wide_resnet(\d+)_(\d+)$")
    m = _RESNEXT_RE.match(name)
    if m:
        depth, groups, base_width = map(int, m.groups())
        if depth in _DEPTH_TABLE and groups >= 1 and base_width >= 1:
            return ("bottleneck", _DEPTH_TABLE[depth], 4, groups, base_width)
        return None
    m = _WIDE_RE.match(name)
    if m:
        depth, k = map(int, m.groups())
        if depth in _DEPTH_TABLE and k >= 1:
            return ("bottleneck", _DEPTH_TABLE[depth], 4, 1, 64 * k)
        return None
    return None


def resnet_spec(name: str, num_classes: int = 6, in_chans: int = 3) -> ResNetSpec:
    """Stock torchvision-compatible specs (reference model zoo:
    `teacher_training/utils.py:21-66` builds these via torchvision).

    ResNeXt rows follow torchvision's parametrization: inner bottleneck
    width = planes · base_width/64 · groups, both inner convs equal, conv2
    grouped by cardinality. ``resnext26_32x4d`` is the compact student
    variant (depths of resnet18, bottleneck/grouped blocks) for the 4-stage
    pipeline on the fifth family."""
    table = {
        # name: (block, depths, expansion, groups, base_width)
        "resnet18": ("basic", (2, 2, 2, 2), 1, 1, 64),
        "resnet34": ("basic", (3, 4, 6, 3), 1, 1, 64),
        "resnet50": ("bottleneck", (3, 4, 6, 3), 4, 1, 64),
        "resnet101": ("bottleneck", (3, 4, 23, 3), 4, 1, 64),
        "resnet152": ("bottleneck", (3, 8, 36, 3), 4, 1, 64),
        "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 4, 32, 4),
        "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 4, 32, 8),
        "resnext26_32x4d": ("bottleneck", (2, 2, 2, 2), 4, 32, 4),
        # torchvision Wide ResNets: bottleneck width doubled via base_width
        "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 4, 1, 128),
        "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), 4, 1, 128),
    }
    if name in table:
        block, depths, expansion, groups, base_width = table[name]
    else:
        parsed = _parse_resnet_name(name)
        if parsed is None:
            raise ValueError(
                f"unknown resnet variant: {name!r} (have {sorted(table)}, or any "
                "parametric 'resnext<D>_<G>x<W>d' / 'wide_resnet<D>_<k>' name "
                f"with D in {sorted(_DEPTH_TABLE)})"
            )
        block, depths, expansion, groups, base_width = parsed
    stage_widths = tuple(p * expansion for p in _PLANES)
    if groups > 1 or base_width != 64:
        # torchvision parametrization: width = planes·(base_width/64)·groups
        # (ResNeXt cardinality and/or Wide-ResNet doubled bottleneck width)
        inner_planes = tuple(p * base_width // 64 * groups for p in _PLANES)
    else:
        inner_planes = _PLANES
    return ResNetSpec(
        name=name,
        block=block,
        depths=depths,
        stage_widths=stage_widths,
        inner_widths=_uniform_inner(block, depths, inner_planes),
        stem_width=64,
        num_classes=num_classes,
        in_chans=in_chans,
        groups=groups,
    )


def residual_groups(spec: ResNetSpec) -> List[Dict]:
    """Enumerate the channel-coupled groups for structured pruning.

    Returns a list of group dicts:
      {"kind": "stage", "stage": s, "width": w}   — residual group of stage s
                                                     (includes the stem when tied)
      {"kind": "inner", "stage": s, "block": b, "idx": i, "width": w}
                                                   — free inner conv i of block b
    The classifier head is never listed (head protection, reference
    `pruning_engine_structured.py:35-43`).
    """
    groups: List[Dict] = []
    if not spec.stem_tied_to_stage0:
        groups.append({"kind": "stem", "width": spec.stem_width})
    for s, d in enumerate(spec.depths):
        groups.append({"kind": "stage", "stage": s, "width": spec.stage_widths[s]})
        for b in range(d):
            for i, w in enumerate(spec.inner_widths[s][b]):
                groups.append(
                    {"kind": "inner", "stage": s, "block": b, "idx": i, "width": w}
                )
    return groups
