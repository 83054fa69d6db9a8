"""Interleaved two-pass engine (v3) for GLOBAL-level transforms.

Redesign of ``pallas_global`` around the interleaved-matmul primitives
(ops/pallas_multidim.py): complex arithmetic rides inside real matmuls on
the raw interleaved data, so neither pass deinterleaves, and the one
irreducible lane→sublane reordering of the four-step algorithm is paid
exactly once (pass 2's output reinterleave).  Per-pass structure for
n = G1·G2 on the raw buffer viewed (batch, G1, 2·G2):

  pass 1, grid (B, G2/T1), block x[b, :, 2·tT1 : 2(t+1)T1]   (G1, 2T1)
      sublane G1-DFT as LEFT interleaved matmuls (dense W_G1 for G1 ≤ 512,
      or the two-stage a·128 split with free leading-dim digit reshapes),
      then the global twiddle W_n^{k1·n2} applied as lane rolls with
      RESIDENT factored tables — k1 = k1_lo + ga·k1_hi splits it into
      (A_lo·B1)·(A_hi·B2) where B1 (ga, 2T1) / B2 (gb, 2T1) depend only on
      the within-block offset n2b (block-independent, tiny, resident) and
      the per-block factors A are a handful of cos/sin values computed
      in-kernel from the grid index.  Zero twiddle bytes streamed (the
      round-2 engine streamed one data-unit of dense tables per pass).
      Output S[b, k1, 2n2+q] — written straight, NO transpose.

  pass 2, grid (B, G1/T2), block S[b, 2·jT2 : ..., :]        (T2, 2G2)
      lane G2-DFT as a RIGHT matmul against split-output interleaved
      tables (2G2, G2) (TwiddleBank.vmat_split, scale folded in), then the
      reinterleave-transpose loop writes O[b, k2, 2k1+q] — the single
      orientation flip of the whole pipeline.

O viewed (B, G2, 2·G1) flattens to natural PACKED interleaved order.

Reference counterpart: global_dispatcher.hpp:312-412 (its L2-chunked
multi-kernel chain with explicit transpose kernels and twiddle loads); the
v3 engine runs the same mathematics in two kernels with ~1 VPU transpose
pass total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Level
from ..planner import Plan1D
from .pallas_fft import _const_spec, _interpret_mode, _kernel_precision, _mm
from .pallas_multidim import _ctw_raw, _pairswap_last

#: candidate pass-1 lane tiles (complex units); B tables are registered for
#: each viable candidate at commit time (they are tiny).
T1_CANDIDATES = (512, 256, 128, 64)
T2_CANDIDATES = (256, 128, 64)


def digit_split(g: int) -> tuple[int, int]:
    """g = ga·gb with ga ≤ gb, ga the largest power-of-two divisor
    ≤ sqrt(g) (both factors stay small for the resident twiddle tables)."""
    ga = 1
    d = 2
    while g % d == 0 and d * d <= g:
        ga = d
        d *= 2
    return ga, g // ga


def _sub_ok(p: Plan1D, max_dense: int) -> bool:
    if p.level == Level.DIRECT:
        return p.n <= max_dense
    return (
        p.level == Level.FUSED
        and len(p.factors) == 2
        and p.factors[1] == 128
        and p.factors[0] >= 2
    )


def global3_supported(plan: Plan1D, config) -> bool:
    """v3 engine capability: G1 dense ≤ 512 or a·128 two-stage; G2 ≤ 512
    with 128 | G2 (the pass-2 reinterleave walks 128-lane tiles)."""
    if plan.level != Level.GLOBAL:
        return False
    g1p, g2p = plan.sub
    return (
        _sub_ok(g1p, 512)
        and g2p.level == Level.DIRECT
        and g2p.n <= 512
        and g2p.n % 128 == 0
        and g1p.n % 128 == 0
    )


def _pick_t1(g2: int, g1: int, vmem: int, fused: bool) -> int:
    for t1 in T1_CANDIDATES:
        if g2 % t1 == 0 and _p1_bytes(g1, t1, fused) <= vmem:
            return t1
    return 0


def _pick_t2(g1: int, g2: int, vmem: int) -> int:
    for t2 in T2_CANDIDATES:
        if g1 % t2 == 0 and _p2_bytes(g2, t2) <= vmem:
            return t2
    return 0


def _p1_bytes(g1: int, t1: int, fused: bool) -> int:
    """Pass-1 VMEM working set: io blocks (×2 pipeline buffers each) +
    stage tensors / pairswap temps / bf16 splits + dense W tables (two-stage
    tables are negligible)."""
    e = g1 * 2 * t1 * 4
    tables = 0 if fused else 2 * g1 * g1 * 4 * 2  # fp32 + bf16 splits
    return (11 if fused else 12) * e + tables


def _p2_bytes(g2: int, t2: int) -> int:
    e = t2 * 2 * g2 * 4
    tables = 2 * 2 * g2 * g2 * 4 * 2
    return 10 * e + tables


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _cmm_left_3d(wr, wi, x3, prec):
    """Left interleaved complex matmul on a 3D (K, M, 2L) tensor contracting
    the leading axis, rolls kept on the narrow 3D views (wide-lane pairswap
    is a known Mosaic compile hazard)."""
    k = x3.shape[0]
    xs3 = _pairswap_last(x3)
    e1 = _mm(wr, x3.reshape(k, -1), prec)
    e2 = _mm(wi, xs3.reshape(k, -1), prec)
    out_shape = (wr.shape[0],) + x3.shape[1:]
    e13 = e1.reshape(out_shape)
    e23 = e2.reshape(out_shape)
    lane = jax.lax.broadcasted_iota(jnp.int32, out_shape, len(out_shape) - 1)
    return jnp.where(lane % 2 == 0, e13 - e23, e13 + e23)


def _apply_global_twiddle(y3, b1r, b1i, b2r, b2i, m2, n, ga, gb, sign):
    """y3 (gb, ga, 2T1) = [k1_hi, k1_lo, 2n2b+q] times W_n^{k1·n2} where
    n2 = m2 + n2b and k1 = k1_lo + ga·k1_hi.

    B1/B2 are the resident n2b-dependent factors; the m2-dependent factors
    A_lo[k1_lo] = W_n^{k1_lo·m2} and A_hi[k1_hi] = W_{n/ga}^{k1_hi·m2} are a
    few thousand cos/sin values computed here (k1·m2 ≤ g1·g2 = n < 2^31,
    int32-exact before the mod).  A is folded into the B tables at
    table-sized cost, then two roll-multiply passes hit the data."""
    f32 = y3.dtype
    klo = jax.lax.broadcasted_iota(jnp.int32, (1, ga, 1), 1)
    th1 = (2.0 * np.pi / n) * ((klo * m2) % n).astype(f32)
    alr = jnp.cos(th1)
    ali = sign * jnp.sin(th1)
    c1r = b1r * alr - b1i * ali  # (1, ga, 2T1)
    c1i = b1r * ali + b1i * alr
    y3 = _ctw_raw(y3, c1r, c1i)
    nh = n // ga
    khi = jax.lax.broadcasted_iota(jnp.int32, (gb, 1, 1), 0)
    th2 = (2.0 * np.pi / nh) * ((khi * m2) % nh).astype(f32)
    ahr = jnp.cos(th2)
    ahi = sign * jnp.sin(th2)
    c2r = b2r * ahr - b2i * ahi  # (gb, 1, 2T1)
    c2i = b2r * ahi + b2i * ahr
    return _ctw_raw(y3, c2r, c2i)


def _p1_dense_kernel(g1, t1, prec, n, sign, ga, gb):
    def kernel(x_ref, wr, wi, b1r, b1i, b2r, b2i, o_ref):
        x = x_ref[0]  # (g1, 2t1) [n1, 2n2+q]
        p = _cmm_left_3d(wr[...], wi[...], x.reshape(g1, 1, 2 * t1), prec)
        y3 = p.reshape(gb, ga, 2 * t1)  # rows k1 = k1_hi·ga + k1_lo
        m2 = pl.program_id(1) * t1
        y3 = _apply_global_twiddle(
            y3,
            b1r[...].reshape(1, ga, 2 * t1),
            b1i[...].reshape(1, ga, 2 * t1),
            b2r[...].reshape(gb, 1, 2 * t1),
            b2i[...].reshape(gb, 1, 2 * t1),
            m2, n, ga, gb, sign,
        )
        o_ref[0] = y3.reshape(g1, 2 * t1)

    return kernel


def _p1_fused_kernel(g1, a, t1, prec, n, sign):
    """G1 = a·128 two-stage over the sublane digits — all digit splits and
    merges are leading-dim reshapes (free), no restack anywhere."""

    def kernel(x_ref, war, wai, ur, ui, wbr, wbi, b1r, b1i, b2r, b2i, o_ref):
        x = x_ref[0]  # (g1, 2t1), rows n1 = n1a·128 + n1b
        x3 = x.reshape(a, 128, 2 * t1)
        p3 = _cmm_left_3d(war[...], wai[...], x3, prec)  # [k1a, n1b, n2q]
        # intra-G1 twiddle W_g1^{k1a·n1b}: one value per (k1a, n1b)
        p3 = _ctw_raw(
            p3, ur[...].reshape(a, 128, 1), ui[...].reshape(a, 128, 1)
        )
        q3 = jnp.transpose(p3, (1, 0, 2))  # (128, a, 2t1) [n1b, k1a, n2q]
        f3 = _cmm_left_3d(wbr[...], wbi[...], q3, prec)  # [k1b, k1a, n2q]
        # rows (k1b, k1a) merge to k1b·a + k1a = k1 = k1a + a·k1b? NO —
        # k1 = k1a + a·k1b, and row-major (k1b, k1a) IS k1b·a + k1a = k1. ✓
        m2 = pl.program_id(1) * t1
        y3 = _apply_global_twiddle(
            f3,
            b1r[...].reshape(1, a, 2 * t1),
            b1i[...].reshape(1, a, 2 * t1),
            b2r[...].reshape(128, 1, 2 * t1),
            b2i[...].reshape(128, 1, 2 * t1),
            m2, n, a, 128, sign,
        )
        o_ref[0] = y3.reshape(g1, 2 * t1)

    return kernel


def _p2_kernel(g2, t2, prec):
    def kernel(x_ref, vr, vi, o_ref, s2):
        z = x_ref[0]  # (t2, 2g2) [k1-slice, 2n2+q]
        cr = _mm(z, vr[...], prec)  # (t2, g2) [k1s, k2]
        ci = _mm(z, vi[...], prec)
        # the single orientation flip: reinterleave per 128-column tile
        for j in range(g2 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = cr[:, sl]  # (2t2, 128)
            s2[1::2, :] = ci[:, sl]
            o_ref[0, sl, :] = s2[...].T  # (128, 2t2) = [k2-slice, 2k1+q]

    return kernel


# ---------------------------------------------------------------------------
# Launch
# ---------------------------------------------------------------------------


def p1_table_names(g1p: Plan1D, n: int, t1: int, sign: int, bank) -> list:
    """Register (idempotently) and return pass-1 bank names."""
    if g1p.level == Level.DIRECT:
        w = bank.dft(g1p.n, sign)
        ga, gb = digit_split(g1p.n)
        bkey = bank.global3_btw(ga, gb, n, t1, sign)
        return [w + "r", w + "i", bkey + "1r", bkey + "1i", bkey + "2r",
                bkey + "2i"]
    a = g1p.factors[0]
    wa = bank.dft(a, sign)
    u = bank.twiddle_fm(a, 128, sign)
    wb = bank.dft(128, sign)
    bkey = bank.global3_btw(a, 128, n, t1, sign)
    return [wa + "r", wa + "i", u + "r", u + "i", wb + "r", wb + "i",
            bkey + "1r", bkey + "1i", bkey + "2r", bkey + "2i"]


def build_call(
    plan: Plan1D, sign: int, names1, vs_name: str, config,
    precision=None, t1: int = 0, t2: int = 0,
):
    """Return fn(raw, batch, bank_arrays) -> raw for this plan, or None when
    no legal tiling exists.  ``names1``/``vs_name`` from ``p1_table_names``
    and ``TwiddleBank.vmat_split(g2, sign, 1, scale)`` at commit time."""
    g1p, g2p = plan.sub
    g1, g2, n = g1p.n, g2p.n, plan.n
    prec = _kernel_precision(precision)
    vmem = int(config.vmem_bytes * 3 / 4)
    fused1 = g1p.level != Level.DIRECT
    t1 = t1 or _pick_t1(g2, g1, vmem, fused1)
    t2 = t2 or _pick_t2(g1, g2, vmem)
    if not t1 or not t2 or g2 % t1 or g1 % t2:
        return None
    if fused1:
        a = g1p.factors[0]
        kern1 = _p1_fused_kernel(g1, a, t1, prec, n, sign)
    else:
        ga, gb = digit_split(g1)
        kern1 = _p1_dense_kernel(g1, t1, prec, n, sign, ga, gb)
    kern2 = _p2_kernel(g2, t2, prec)

    in1 = pl.BlockSpec(
        (1, g1, 2 * t1), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    out1 = pl.BlockSpec(
        (1, g1, 2 * t1), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    in2 = pl.BlockSpec(
        (1, t2, 2 * g2), lambda bi, ji: (bi, ji, 0), memory_space=pltpu.VMEM
    )
    out2 = pl.BlockSpec(
        (1, g2, 2 * t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )

    def fn(raw, batch, bank):
        x3 = raw.reshape(batch, g1, 2 * g2)
        tabs1 = [bank[nm] for nm in names1]
        s = pl.pallas_call(
            kern1,
            grid=(batch, g2 // t1),
            in_specs=[in1] + [_const_spec(t) for t in tabs1],
            out_specs=out1,
            out_shape=jax.ShapeDtypeStruct((batch, g1, 2 * g2), raw.dtype),
            cost_estimate=pl.CostEstimate(
                flops=8 * batch * n * (sum(g1p.factors) or g1),
                bytes_accessed=4 * 4 * batch * n,
                transcendentals=2 * batch * (g2 // t1) * g1,
            ),
            interpret=_interpret_mode(),
        )(x3, *tabs1)
        tabs2 = [bank[vs_name + "r"], bank[vs_name + "i"]]
        out = pl.pallas_call(
            kern2,
            grid=(batch, g1 // t2),
            in_specs=[in2] + [_const_spec(t) for t in tabs2],
            out_specs=out2,
            out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
            scratch_shapes=[pltpu.VMEM((2 * t2, 128), raw.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=8 * batch * n * g2,
                bytes_accessed=4 * 4 * batch * n,
                transcendentals=0,
            ),
            interpret=_interpret_mode(),
        )(s, *tabs2)
        return out.reshape(raw.shape)

    return fn
