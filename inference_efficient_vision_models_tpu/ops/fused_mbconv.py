"""Pallas TPU kernel: one WHOLE int8 MBConv block, VMEM-resident.

The REPORT.md roofline blames HBM round-trips for static-int8 MBConv losing
to bf16: the unfused path writes the 6×-expanded hidden tensor to HBM after
the expand requant, reads it for the depthwise conv, writes the dw output,
reads it again for the SE gate, writes the gated tensor, and reads it once
more for the 1×1 project — five expanded-tensor transfers per block. This
kernel keeps the entire block on-chip:

    HBM traffic per block:  read x_in (C_in)  +  write y_out (C_out)

and everything in between — expand matmul (MXU int8), requant, k×k depthwise
(VPU, exact f32 integer MACs), SiLU/ReLU6, SE gate, requant, project matmul
(MXU int8), residual add, output requant — happens in VMEM/registers. The
expanded tensor never exists in HBM.

Design notes (tpu-first, see /opt/skills/guides/pallas_guide.md):

* Grid is over the batch: each step processes ``nb`` images with the FULL
  spatial extent resident (the SE squeeze is a global spatial pool, so
  spatial tiling is impossible once SE is fused; a whole 224²-input MBConv
  activation set fits VMEM for every EfficientNet-B0..B3 / MobileNetV2
  block — worst case ~6 MB f32). ``nb`` scales up for late small blocks so
  the project matmul has MXU-sized M.
* The depthwise conv is k² shifted multiply-adds on an f32 scratch copy of
  the expanded activations (integer values ≤ 2^24, so f32 MACs are EXACT —
  bit-identical to the int32 formulation). int8 is never sliced at sublane
  offsets inside the kernel (a known Mosaic failure mode — the scratch is
  f32 and zero-padded in place, so the affine zp correction is built in).
* Both matmuls run int8×int8→int32 on the MXU; the input-zp corrections
  ``zp_s·Σw`` are folded into the bias vectors at pack time.
* All per-block scalars (requant scales/zps) arrive through one SMEM row so
  the packed model stays a plain serializable pytree.

Replaces (with `compress/quant/fusedpath`) the per-op XLA lowering of
`compress/quant/qeffnet.apply_int8` / `qmobilenet.apply_int8`; equivalence
is asserted in tests/test_fused_mbconv.py. The reference's analog is the
QNNPACK per-op kernel chain (`/root/reference/quantization/main.py:187-188`)
which has no cross-op fusion at all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mbconv_block", "fusable", "pick_nb"]

# SMEM scalar row layout (1, 12) f32
_ZP_S_IN = 0      # input zero point − 128 (shifted)
_INV_E, _E_ZP = 1, 2          # expand requant (unused without expand)
_INV_D, _D_ZP, _D_SCALE = 3, 4, 5   # dw requant + dequant scale
_INV_Q, _Q_ZP = 6, 7          # project-input requant (SE domain / dw domain)
_INV_O, _O_ZP = 8, 9          # block-output requant
_RES_SCALE, _RES_ZP_S = 10, 11  # residual dequant


def _act(y, kind: str):
    if kind == "silu":
        return y * jax.nn.sigmoid(y)
    if kind == "relu6":
        return jnp.minimum(jnp.maximum(y, 0.0), 6.0)
    raise ValueError(kind)


def _kernel(
    scal_ref,  # SMEM (1, 12) f32
    *refs,
    k: int,
    stride: int,
    pad: int,
    act: str,
    has_expand: bool,
    has_se: bool,
    has_residual: bool,
    nb: int,
    hw_in,      # (H, W) block-input spatial
    hw_out,     # (Ho, Wo)
):
    it = iter(refs)
    x_ref = next(it)
    if has_expand:
        we_ref, ve_ref = next(it), next(it)
    wdw_ref, vdw_ref = next(it), next(it)
    if has_se:
        srw_ref, srb_ref, sew_ref, seb_ref = next(it), next(it), next(it), next(it)
    wp_ref, vp_ref = next(it), next(it)
    if has_residual:
        xres_ref = next(it)
    out_ref = next(it)
    xf_ref = next(it)  # f32 scratch (nb, Hp, Wp, Ce) — scratch refs follow outputs
    acc_ref = next(it)  # f32 scratch (nb, Ho, Wo, Ce) — dw accumulator

    h_in, w_in = hw_in
    ho, wo = hw_out
    ce = xf_ref.shape[-1]

    # ---- expand (1×1 int8 matmul) or direct dw input ----
    if has_expand:
        cin = x_ref.shape[-1]
        xm = x_ref[:].reshape(nb * h_in * w_in, cin)
        acc = jnp.dot(xm, we_ref[:], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * ve_ref[0, :] + ve_ref[1, :]
        y = _act(y, act)
        # requant to the expand-out domain, keep (q − zp) in f32 (exact ints)
        yq = jnp.clip(jnp.round(y * scal_ref[0, _INV_E]) + scal_ref[0, _E_ZP], 0.0, 255.0)
        hidden = (yq - scal_ref[0, _E_ZP]).reshape(nb, h_in, w_in, ce)
    else:
        hidden = x_ref[:].astype(jnp.float32) - scal_ref[0, _ZP_S_IN]

    # ---- zero-padded f32 scratch: (x − zp) with 0 borders ≡ zp padding ----
    if pad:
        xf_ref[:] = jnp.zeros(xf_ref.shape, jnp.float32)
        xf_ref[:, pad : pad + h_in, pad : pad + w_in, :] = hidden
    else:
        xf_ref[:] = hidden

    # ---- depthwise k×k: k² shifted MACs (exact f32 integer arithmetic) ----
    # One fori_loop tap per iteration: an unrolled `acc = acc + term` value
    # chain makes Mosaic's scoped-vmem stack hold every shifted slice at
    # once (k²·Ho·Wo·Ce f32 blew the 16 MB limit at 112² — measured 31 MB),
    # while a loop body compiles once and keeps exactly one tap live. The
    # TPU path is stride-1 only (see fused_mbconv_block), so the tap slice
    # is contiguous (`pl.ds` dynamic offsets, unit stride — Mosaic rejects
    # strided vector slices). Interpret mode keeps the general strided
    # formulation for the stride-2 block tests.
    if stride == 1:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        def tap_body(i, carry):
            dy, dx = i // k, i % k
            sl = xf_ref[:, pl.ds(dy, ho), pl.ds(dx, wo), :]
            acc_ref[:] = acc_ref[:] + sl * wdw_ref[pl.ds(i, 1), :]
            return carry

        lax.fori_loop(0, k * k, tap_body, 0)
    else:
        xv = xf_ref[:]
        acc = None
        for dy in range(k):
            for dx in range(k):
                sl = lax.slice(
                    xv,
                    (0, dy, dx, 0),
                    (nb, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, ce),
                    (1, stride, stride, 1),
                )
                term = sl * wdw_ref[dy * k + dx, :]
                acc = term if acc is None else acc + term
        acc_ref[:] = acc
    y = acc_ref[:] * vdw_ref[0, :] + vdw_ref[1, :]
    y = _act(y, act)
    # dw requant→dequant (the intermediate quantization the unfused path has)
    yq = jnp.clip(jnp.round(y * scal_ref[0, _INV_D]) + scal_ref[0, _D_ZP], 0.0, 255.0)
    h = (yq - scal_ref[0, _D_ZP]) * scal_ref[0, _D_SCALE]

    # ---- SE gate (fp32: tiny matmul pair + sigmoid) ----
    if has_se:
        pooled = jnp.mean(h, axis=(1, 2))                     # (nb, Ce)
        g = pooled @ srw_ref[:] + srb_ref[0, :]
        g = g * jax.nn.sigmoid(g)                             # SiLU
        g = jax.nn.sigmoid(g @ sew_ref[:] + seb_ref[0, :])
        h = h * g[:, None, None, :]

    # ---- requant to the project-input domain → int8 MXU matmul ----
    hq = jnp.clip(jnp.round(h * scal_ref[0, _INV_Q]) + scal_ref[0, _Q_ZP], 0.0, 255.0)
    hm = (hq - 128.0).astype(jnp.int8).reshape(nb * ho * wo, ce)
    accp = jnp.dot(hm, wp_ref[:], preferred_element_type=jnp.int32)
    co = wp_ref.shape[-1]
    yp = accp.astype(jnp.float32) * vp_ref[0, :] + vp_ref[1, :]
    yp = yp.reshape(nb, ho, wo, co)

    if has_residual:
        res = (xres_ref[:].astype(jnp.float32) - scal_ref[0, _RES_ZP_S]) * scal_ref[
            0, _RES_SCALE
        ]
        yp = yp + res

    oq = jnp.clip(jnp.round(yp * scal_ref[0, _INV_O]) + scal_ref[0, _O_ZP], 0.0, 255.0)
    out_ref[:] = (oq - 128.0).astype(jnp.int8)


# Scoped-VMEM ceiling requested per kernel (v5e/v6e have 128 MB VMEM; the
# Mosaic default scope is 16 MB, far below what a whole-block working set
# needs at large spatial extents).
_VMEM_LIMIT = 100 << 20


def fusable(h: int, ce: int, stride: int) -> bool:
    """Mosaic lowering envelope for this kernel, measured per-block on a real
    v5e (scripts/fused_probe.py, round 3): stride-1 blocks whose spatial
    extent is sublane-aligned (h % 8 == 0) and whose expanded channel count
    fits one lane tile (ce <= 128) compile and run; outside it Mosaic fails
    on unaligned-lane dynamic ``vector.load`` (28², ce 176/216) or
    infer-vector-layout for the flatten at 14²/7². The in-envelope blocks
    are exactly the top HBM-traffic ones (112²·32, 56²·128 expanded
    tensors — the two largest by bytes), so the bandwidth experiment still
    tests its hypothesis; the rest run the unfused op chain."""
    return stride == 1 and h % 8 == 0 and ce <= 128


def pick_nb(n: int, hp: int, wp: int, ce: int, budget_bytes: int = 64 << 20) -> int:
    """Images per grid step: bounded by an f32-working-set VMEM budget,
    then snapped to a divisor of n. The per-image factor 16 is measured,
    not modeled: Mosaic's scoped-stack accounting held ~15 full (Hp·Wp·Ce)
    f32 values live for this kernel body (24.86 MB at 114²·32), so the
    budget assumes 16 and leaves the rest of ``_VMEM_LIMIT`` as headroom."""
    est = 16 * hp * wp * ce * 4
    nb = max(1, budget_bytes // max(est, 1))
    nb = int(min(nb, n))
    while n % nb:
        nb -= 1
    return nb


def fused_mbconv_block(
    x_s8: jax.Array,                  # (N, H, W, Cin) int8 shifted-quint8
    packed: dict,
    *,
    kernel: int,
    stride: int,
    act: str,
    x_res: Optional[jax.Array] = None,  # (N, Ho, Wo, Co) int8 residual input
    nb: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Run one packed MBConv block (see fusedpath.pack_* for `packed`).

    Returns the block output as (N, Ho, Wo, Co) int8 in the block-out domain.
    """
    n, h, w, _ = x_s8.shape
    if stride != 1 and not interpret:
        # Mosaic lowers lax.slice to vector.extract_strided_slice, which only
        # admits unit strides — the k² shifted-MAC depthwise cannot
        # downsample on real TPU. Callers (fusedpath) route stride-2 blocks
        # to the unfused op chain.
        raise NotImplementedError(
            "fused_mbconv_block compiles on TPU only for stride=1 "
            f"(got stride={stride}); use the unfused family apply for "
            "downsampling blocks"
        )
    pad = (kernel - 1) // 2
    hp, wp = h + 2 * pad, w + 2 * pad
    ho = (hp - kernel) // stride + 1
    wo = (wp - kernel) // stride + 1
    ce = int(packed["wdw"].shape[-1])
    co = int(packed["wp"].shape[-1])
    has_expand = "we" in packed
    has_se = "srw" in packed
    has_residual = x_res is not None
    if nb is None:
        nb = pick_nb(n, hp, wp, ce)
    assert n % nb == 0, (n, nb)

    operands = [packed["scal"]]
    in_specs = [pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.SMEM)]

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    operands.append(x_s8)
    in_specs.append(
        pl.BlockSpec((nb, h, w, x_s8.shape[-1]), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    )
    if has_expand:
        operands += [packed["we"], packed["ve"]]
        in_specs += [vspec(packed["we"].shape), vspec(packed["ve"].shape)]
    operands += [packed["wdw"], packed["vdw"]]
    in_specs += [vspec(packed["wdw"].shape), vspec(packed["vdw"].shape)]
    if has_se:
        for key in ("srw", "srb", "sew", "seb"):
            operands.append(packed[key])
            in_specs.append(vspec(packed[key].shape))
    operands += [packed["wp"], packed["vp"]]
    in_specs += [vspec(packed["wp"].shape), vspec(packed["vp"].shape)]
    if has_residual:
        operands.append(x_res)
        in_specs.append(
            pl.BlockSpec((nb, ho, wo, co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        )

    flops = (
        2 * n * h * w * (x_s8.shape[-1] * ce if has_expand else 0)
        + 2 * n * ho * wo * ce * kernel * kernel
        + 2 * n * ho * wo * ce * co
    )
    return pl.pallas_call(
        functools.partial(
            _kernel,
            k=kernel, stride=stride, pad=pad, act=act,
            has_expand=has_expand, has_se=has_se, has_residual=has_residual,
            nb=nb, hw_in=(h, w), hw_out=(ho, wo),
        ),
        grid=(n // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, ho, wo, co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((nb, hp, wp, ce), jnp.float32),
            pltpu.VMEM((nb, ho, wo, ce), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_s8.size + n * ho * wo * co,
            transcendentals=n * ho * wo * ce if act == "silu" else 0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
