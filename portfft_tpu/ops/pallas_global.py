"""Two-pass Pallas engine for GLOBAL-level transforms.

TPU-native redesign of the reference's global engine
(common/global.hpp:303-401, global_dispatcher.hpp:312-412): where the
reference launches one kernel per factor per batch chunk plus explicit
transpose kernels between passes with double-buffered scratch, this engine
needs exactly TWO Pallas kernels for n = G1·G2 (each Gi solved by a single
DFT matmul), with the inter-factor transposes folded into the BlockSpec
index maps — the data is never transposed in HBM, only block-locally in
VMEM where the transpose unit is free-ish:

  pass 1, grid (B, G2/T): block x[b, :, t·T:(t+1)T] (G1, T)
      S[b, tT:(t+1)T, :] = (xᵀ · W_G1) ∘ Tw[tT:(t+1)T, :]     # (T, G1)
  pass 2, grid (B, G1/T): block S[b, :, jT:(j+1)T] (G2, T)
      O[b, :, jT:(j+1)T] = (Sᵀ · W_G2)ᵀ                        # (G2, T)

O viewed (B, G2, G1) flattens to the natural order for free
(k = k1 + G1·k2 = row-major index of [k2, k1]).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Level
from ..planner import Plan1D
from . import xla_fft
from .pallas_fft import _kernel_precision


def global2_supported(plan: Plan1D, max_direct: int = 256) -> bool:
    if plan.level != Level.GLOBAL:
        return False
    g1, g2 = plan.sub
    return (
        g1.level == Level.DIRECT
        and g2.level == Level.DIRECT
        and g1.n <= max_direct
        and g2.n <= max_direct
        and g1.n % 8 == 0
        and g2.n % 8 == 0
    )


def _const(t):
    return pl.BlockSpec(
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )


def global2_call(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config, precision=None,
    scale: float = 1.0,
):
    """Planes (..., n) -> planes (..., n), two Pallas passes."""
    n = plan.n
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    prec = _kernel_precision(precision)

    lead = xr.shape[:-1]
    b = math.prod(lead) if lead else 1
    x3r = xr.reshape(b, g1, g2)
    x3i = xi.reshape(b, g1, g2)

    w1 = bank_keys[("W", g1, sign)]
    w2 = bank_keys[("W", g2, sign)]
    tw = bank_keys[("T", g1, g2, sign)]

    t1 = min(512, g2)
    while g2 % t1:
        t1 //= 2
    in1 = pl.BlockSpec(
        (1, g1, t1), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec(
        (t1, g1), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
    )
    out1 = pl.BlockSpec(
        (1, t1, g1), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )

    def p1(xr_ref, xi_ref, wr, wi, twr, twi, or_ref, oi_ref):
        xr_ = xr_ref[0].T
        xi_ = xi_ref[0].T
        ar, ai = xla_fft.complex_matmul_last(xr_, xi_, wr[...], wi[...], prec)
        ar, ai = xla_fft.complex_mul(ar, ai, twr[...], twi[...])
        or_ref[0] = ar
        oi_ref[0] = ai

    sr, si = pl.pallas_call(
        p1,
        grid=(b, g2 // t1),
        in_specs=[in1, in1, _const(bank[w1 + "r"]), _const(bank[w1 + "i"]),
                  tw_spec, tw_spec],
        out_specs=[out1, out1],
        out_shape=[jax.ShapeDtypeStruct((b, g2, g1), xr.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * g1,
            bytes_accessed=4 * 4 * b * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3r, x3i, bank[w1 + "r"], bank[w1 + "i"], bank[tw + "r"], bank[tw + "i"])

    t2 = min(512, g1)
    while g1 % t2:
        t2 //= 2
    in2 = pl.BlockSpec(
        (1, g2, t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )
    out2 = pl.BlockSpec(
        (1, g2, t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )

    def p2(xr_ref, xi_ref, wr, wi, or_ref, oi_ref):
        xr_ = xr_ref[0].T  # (t2, g2) = [k1-slice, n2]
        xi_ = xi_ref[0].T
        cr, ci = xla_fft.complex_matmul_last(xr_, xi_, wr[...], wi[...], prec)
        if scale != 1.0:
            cr = cr * scale
            ci = ci * scale
        or_ref[0] = cr.T  # (g2, t2) = [k2, k1-slice]
        oi_ref[0] = ci.T

    yr, yi = pl.pallas_call(
        p2,
        grid=(b, g1 // t2),
        in_specs=[in2, in2, _const(bank[w2 + "r"]), _const(bank[w2 + "i"])],
        out_specs=[out2, out2],
        out_shape=[jax.ShapeDtypeStruct((b, g2, g1), xr.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * g2,
            bytes_accessed=4 * 4 * b * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(sr, si, bank[w2 + "r"], bank[w2 + "i"])

    # (b, g2, g1) row-major flat = k1 + g1·k2 = the transform index: free.
    return yr.reshape(*lead, n), yi.reshape(*lead, n)


def fft_axis_m2_call(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config, precision=None
):
    """Batched FFT over the second-to-last axis, no HBM transposes.

    x planes (..., L1, L2) -> planes (..., L1, L2) with the L1 axis
    transformed.  Only DIRECT plans (L1 ≤ 256): per (L1, T) tile the kernel
    transposes in VMEM, applies the DFT matmul, and transposes back.  Used
    by the multi-dimensional dispatcher for the non-contiguous axes (the
    reference launches per-slice kernels on BATCH_INTERLEAVED views here,
    committed_descriptor_impl.hpp:932-948).
    """
    l1 = plan.n
    # Cap at 256: the direct-matmul column pass measured slower than the
    # XLA moveaxis path at 512 (flops grow as 8·l1 per element).
    if l1 % 8 or l1 > 256:
        return None
    if ("W", l1, sign) not in bank_keys:
        return None
    prec = _kernel_precision(precision, l1)
    lead = xr.shape[:-2]
    l2 = xr.shape[-1]
    b = math.prod(lead) if lead else 1
    x3r = xr.reshape(b, l1, l2)
    x3i = xi.reshape(b, l1, l2)

    t = min(512, l2)
    while l2 % t:
        t //= 2
    if t < 128 and l2 >= 128:
        return None

    wkey = bank_keys[("W", l1, sign)]
    spec = pl.BlockSpec(
        (1, l1, t), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )

    def kern(xr_ref, xi_ref, wr, wi, or_ref, oi_ref):
        xr_ = xr_ref[0].T  # (t, l1)
        xi_ = xi_ref[0].T
        ar, ai = xla_fft.complex_matmul_last(xr_, xi_, wr[...], wi[...], prec)
        or_ref[0] = ar.T  # (l1, t)
        oi_ref[0] = ai.T

    yr, yi = pl.pallas_call(
        kern,
        grid=(b, l2 // t),
        in_specs=[spec, spec, _const(bank[wkey + "r"]), _const(bank[wkey + "i"])],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, l1, l2), xr.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * l1 * l1 * l2,
            bytes_accessed=4 * 4 * b * l1 * l2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3r, x3i, bank[wkey + "r"], bank[wkey + "i"])
    return yr.reshape(*lead, l1, l2), yi.reshape(*lead, l1, l2)


def fft_axis_m2_fused_call(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config, precision=None
):
    """Column FFT for axis lengths L1 = a·128 (a ≥ 8), no HBM transposes.

    Per (L1, T) tile: transpose to rows, run the two-stage pipeline, and
    write through a 4D output block whose (128, a) middle axes flatten to
    the natural frequency order (k = k1 + a·k2) for free.
    """
    if plan.level != Level.FUSED or len(plan.factors) != 2:
        return None
    a, f2 = plan.factors
    if f2 != 128 or a < 8:
        return None
    l1 = plan.n
    prec = _kernel_precision(precision, l1)
    lead = xr.shape[:-2]
    l2 = xr.shape[-1]
    b = math.prod(lead) if lead else 1
    x3r = xr.reshape(b, l1, l2)
    x3i = xi.reshape(b, l1, l2)

    t = min(256, l2)
    while l2 % t:
        t //= 2
    if t < 128 and l2 >= 128:
        return None

    wa = bank_keys[("W", a, sign)]
    tk = bank_keys[("T", a, 128, sign)]
    wb = bank_keys[("W", 128, sign)]

    in_spec = pl.BlockSpec(
        (1, l1, t), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 128, a, t), lambda bi, ti: (bi, 0, 0, ti), memory_space=pltpu.VMEM
    )

    def kern(xr_ref, xi_ref, war, wai, tr, ti_, wbr, wbi, or_ref, oi_ref):
        def pipeline(x):
            x = x[0].T.reshape(t, a, 128)  # [t, n1, n2]
            return x

        ur = pipeline(xr_ref)
        ui = pipeline(xi_ref)
        ur = jnp.swapaxes(ur, 1, 2)  # (t, 128, a) = [t, n2, n1]
        ui = jnp.swapaxes(ui, 1, 2)
        ar, ai = xla_fft.complex_matmul_last(ur, ui, war[...], wai[...], prec)
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti_[...])
        ar = jnp.swapaxes(ar, 1, 2)  # [t, k1, n2]
        ai = jnp.swapaxes(ai, 1, 2)
        cr, ci = xla_fft.complex_matmul_last(ar, ai, wbr[...], wbi[...], prec)

        def reorder(c):  # (t, a, 128) [t, k1, k2] -> (128, a, t)
            c = jnp.swapaxes(c, 1, 2)  # (t, 128, a)
            c = jnp.transpose(c, (1, 0, 2))  # (128, t, a)
            return jnp.swapaxes(c, 1, 2)  # (128, a, t)

        or_ref[0] = reorder(cr)
        oi_ref[0] = reorder(ci)

    yr, yi = pl.pallas_call(
        kern,
        grid=(b, l2 // t),
        in_specs=[in_spec, in_spec, _const(bank[wa + "r"]),
                  _const(bank[wa + "i"]), _const(bank[tk + "r"]),
                  _const(bank[tk + "i"]), _const(bank[wb + "r"]),
                  _const(bank[wb + "i"])],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, 128, a, l2), xr.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * l1 * (a + 128) * l2,
            bytes_accessed=4 * 4 * b * l1 * l2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3r, x3i, bank[wa + "r"], bank[wa + "i"], bank[tk + "r"],
      bank[tk + "i"], bank[wb + "r"], bank[wb + "i"])
    # (b, 128, a, l2): the (128, a) axes flatten to k = k1 + a·k2 — free.
    return (
        yr.reshape(*lead, l1, l2),
        yi.reshape(*lead, l1, l2),
    )


def global2_raw_supported(plan: Plan1D, max_direct: int = 256) -> bool:
    """Raw variant additionally needs 128 | G1 and 128 | G2 (the in-kernel
    de/interleave walks 128-lane tiles)."""
    if not global2_supported(plan, max_direct):
        return False
    g1, g2 = plan.sub
    return g1.n % 128 == 0 and g2.n % 128 == 0


def global2_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0,
):
    """PACKED interleaved raw (2·batch·n,) -> transformed raw, two passes.

    The interleave handling folds into the per-tile scratch transposes both
    kernels already need: pass 1's input transpose deinterleaves (the even/
    odd sublane slices of the transposed tile ARE the planes in [n2, n1]
    orientation), and pass 2's output transpose reinterleaves while placing
    the digit-reversed result (out row-major = 2(k1 + G1·k2) + p).
    """
    n = plan.n
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    prec = _kernel_precision(precision)

    x3 = raw.reshape(batch, g1, 2 * g2)

    w1 = bank_keys[("W", g1, sign)]
    w2 = bank_keys[("W", g2, sign)]
    tw = bank_keys[("T", g1, g2, sign)]

    t1 = min(256, g2)
    while g2 % t1:
        t1 //= 2
    in1 = pl.BlockSpec(
        (1, g1, 2 * t1), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec(
        (t1, g1), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
    )
    out1 = pl.BlockSpec(
        (1, t1, g1), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )

    def p1(x_ref, wr, wi, twr, twi, or_ref, oi_ref, s3, pr, pi):
        # deinterleave per 128-column tile of the (g1, 2t1) block; the
        # strided sublane reads require a 128-lane scratch base
        for j in range(g1 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s3[...] = x_ref[0, sl, :].T  # (2t1, 128)
            pr[:, sl] = s3[0::2, :]  # (t1, 128) = [n2, n1-slice]
            pi[:, sl] = s3[1::2, :]
        ar, ai = xla_fft.complex_matmul_last(
            pr[...], pi[...], wr[...], wi[...], prec
        )
        ar, ai = xla_fft.complex_mul(ar, ai, twr[...], twi[...])
        or_ref[0] = ar
        oi_ref[0] = ai

    sr, si = pl.pallas_call(
        p1,
        grid=(batch, g2 // t1),
        in_specs=[in1, _const(bank[w1 + "r"]), _const(bank[w1 + "i"]),
                  tw_spec, tw_spec],
        out_specs=[out1, out1],
        out_shape=[jax.ShapeDtypeStruct((batch, g2, g1), raw.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * t1, 128), raw.dtype),
            pltpu.VMEM((t1, g1), raw.dtype),
            pltpu.VMEM((t1, g1), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * g1,
            bytes_accessed=4 * 4 * batch * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, bank[w1 + "r"], bank[w1 + "i"], bank[tw + "r"], bank[tw + "i"])

    t2 = min(256, g1)
    while g1 % t2:
        t2 //= 2
    in2 = pl.BlockSpec(
        (1, g2, t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )
    out2 = pl.BlockSpec(
        (1, g2, 2 * t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )

    def p2(xr_ref, xi_ref, wr, wi, o_ref, s2):
        xr_ = xr_ref[0].T  # (t2, g2) = [k1-slice, n2]
        xi_ = xi_ref[0].T
        cr, ci = xla_fft.complex_matmul_last(xr_, xi_, wr[...], wi[...], prec)
        if scale != 1.0:
            cr = cr * scale
            ci = ci * scale
        # reinterleave per 128-column tile (128-lane strided-store bases)
        for j in range(g2 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = cr[:, sl]  # (2t2, 128)
            s2[1::2, :] = ci[:, sl]
            o_ref[0, sl, :] = s2[...].T  # (128, 2t2) = [k2-slice, 2k1+p]

    out = pl.pallas_call(
        p2,
        grid=(batch, g1 // t2),
        in_specs=[in2, in2, _const(bank[w2 + "r"]), _const(bank[w2 + "i"])],
        out_specs=out2,
        out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
        scratch_shapes=[pltpu.VMEM((2 * t2, 128), raw.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * g2,
            bytes_accessed=4 * 4 * batch * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(sr, si, bank[w2 + "r"], bank[w2 + "i"])

    return out.reshape(raw.shape[0])
