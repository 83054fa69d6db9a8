"""Fused three-pass Bluestein engine for large-prime sizes.

The generic chirp-z executor (ops/xla_fft._exec_bluestein) runs the padded
convolution as two independent two-pass GLOBAL transforms plus chirp/pad
prologue sweeps — ~8 HBM sweeps of conv-sized data.  This module collapses
the whole transform into THREE Pallas passes by exploiting the structure of
the convolution:

1. **Prologue fold** — the chirp multiply and the zero-pad to ``conv_n``
   ride inside conv-forward pass 1: the pass reads only the ``nv·g2 ≈ n``
   valid rows of the (g1, g2) input view (the zero tail of the padded
   sequence spans whole j1-rows because conv_n ≥ 2n−1), multiplies the
   chirp table in VMEM and zero-extends the sublanes to g1 before the
   column DFT.  Pass-1 input traffic drops from conv_n to ~n per batch row
   (a 3x reduction at the 3·2^k convolution lengths).
2. **Merged middle pass** — with the backward convolution factorized as
   (G1', G2') = (g2, g1) (the forward factors swapped), the backward
   stage-1 axis coincides with the forward stage-2 axis: forward pass-2
   output element [k2, k1] is exactly backward pass-1 input [j1', j2'].
   One kernel therefore runs fwd-stage-2 DFT → ×b̂ → bwd-stage-1 DFT →
   ×backward twiddle per (t, g2) tile, deleting one full conv-sized
   read+write sweep.
3. **Epilogue fold** — the final chirp multiply, the user scale and the
   slice back to ``n`` ride inside backward pass 2: the post table is zero
   past ``n`` and only the ``nv`` valid output rows are written.

Reference counterpart: none — portFFT throws for large primes
(committed_descriptor_impl.hpp:240-241); its GLOBAL engine's fused
store-modifiers (committed_descriptor_impl.hpp:467-468) are the pattern
being generalized.
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
from . import pallas_fft as _pf
from .pallas_fft import _kernel_precision
from .pallas_global import (
    _const,
    _fold_scratches,
    _lane_dft,
    _pick_tile,
    global2_supported,
    mm_enabled,
    sub_tables,
)


def _bf_slabs_p(slabs: list, sign: int) -> list:
    """Mixed-radix (2/3) DIT butterfly over (re, im) slab pairs: input
    slab index = HIGH digit iA, output = LOW frequency digit kA, natural
    order (generalizes pallas_global_bf._bf_slabs beyond powers of two)."""
    from .pallas_global_bf import _cmul_const, _snap

    a = len(slabs)
    if a == 1:
        return slabs
    r = 2 if a % 2 == 0 else 3
    m = a // r
    sub = [_bf_slabs_p(slabs[i::r], sign) for i in range(r)]
    out = [None] * a
    for q in range(m):
        parts = [sub[0][q]]
        for i in range(1, r):
            ang = sign * 2.0 * math.pi * i * q / a
            parts.append(
                _cmul_const(
                    *sub[i][q], _snap(math.cos(ang)), _snap(math.sin(ang))
                )
            )
        for t in range(r):
            ar, ai = parts[0]
            for i in range(1, r):
                ang = sign * 2.0 * math.pi * i * t / r
                tr, ti = _cmul_const(
                    *parts[i], _snap(math.cos(ang)), _snap(math.sin(ang))
                )
                ar, ai = ar + tr, ai + ti
            out[q + t * m] = (ar, ai)
    return out


def lane_perm(f: int) -> list:
    """inv[p] = frequency held at lane position p by the butterfly lane
    DFT (:func:`blane_dif`): slab kA = k mod A at lanes [128·kA, ...),
    lane within slab = kB = k // A (f = A·128)."""
    a = f // 128
    return [(p // 128) + a * (p % 128) for p in range(f)]


def blane_dif(xr, xi, f: int, sign: int, ur, ui, wkt):
    """Butterfly-factored lane DFT, natural lanes in -> PERMUTED lanes
    out (slab-digit-major order, :func:`lane_perm`): radix-A slab
    butterfly + digit twiddle (A, 128) + ONE Karatsuba 128-matmul —
    ~(A + 128) cMAC/pt instead of the dense f.  The permutation is
    consumed by :func:`blane_dit` on the convolution's inverse stage
    (tables in between are stored permuted), the classic
    convolution-without-bit-reversal pairing."""
    from .pallas_fft import kara_matmul_last

    a = f // 128
    slabs = [
        (xr[:, j * 128 : (j + 1) * 128], xi[:, j * 128 : (j + 1) * 128])
        for j in range(a)
    ]
    y = _bf_slabs_p(slabs, sign)
    tw = [
        xla_fft.complex_mul(
            yr_, yi_, ur[k : k + 1, :], ui[k : k + 1, :]
        )
        for k, (yr_, yi_) in enumerate(y)
    ]
    sr = jnp.stack([t[0] for t in tw], axis=-2)  # (rows, A, 128)
    si = jnp.stack([t[1] for t in tw], axis=-2)
    zr, zi = kara_matmul_last(sr, si, wkt)
    rows = xr.shape[0]
    return zr.reshape(rows, f), zi.reshape(rows, f)


def blane_dit(xr, xi, f: int, sign: int, ur, ui, wkt):
    """Inverse-ordered butterfly lane DFT: PERMUTED lanes in
    (:func:`lane_perm`) -> natural lanes out.  Per-slab 128-matmul first
    (the slab's t-digit contraction), then the digit twiddle W_f^{jB·a}
    (the same (A, 128) table read per input slab a), then an A-point DFT
    across slabs producing the natural high output digit."""
    from .pallas_fft import kara_matmul_last

    a = f // 128
    rows = xr.shape[0]
    sr = xr.reshape(rows, a, 128)
    si = xi.reshape(rows, a, 128)
    zr, zi = kara_matmul_last(sr, si, wkt)  # (rows, A, 128) over t -> jB
    slabs = [
        xla_fft.complex_mul(
            zr[:, k, :], zi[:, k, :], ur[k : k + 1, :], ui[k : k + 1, :]
        )
        for k in range(a)
    ]
    # plain A-point DFT across slabs (input index a, natural output jA)
    y = _bf_slabs_p(slabs, sign)
    return (
        jnp.concatenate([t[0] for t in y], axis=-1),
        jnp.concatenate([t[1] for t in y], axis=-1),
    )


def valid_rows(n: int, g2: int) -> int:
    """Rows of the (g1, g2) input view that intersect [0, n), rounded up to
    the sublane granularity (8) — also the valid output-row count of the
    swapped backward factorization (both equal ceil(n / g2))."""
    return -(-(-(-n // g2)) // 8) * 8


def supported(plan: Plan1D, config) -> bool:
    """The fused path needs a GLOBAL convolution whose sub-transforms the
    in-kernel lane-DFT helper can solve, and valid-row counts below g1."""
    if plan.level != Level.BLUESTEIN or plan.conv is None:
        return False
    conv = plan.conv
    if not global2_supported(conv, config.direct_threshold):
        return False
    g1, g2 = conv.sub[0].n, conv.sub[1].n
    return valid_rows(plan.n, g2) <= g1




def bluestein_call(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None,
):
    """Planes (..., n) -> transformed planes (..., n), three Pallas passes.

    Returns None when a required bank table is missing or no tiling fits
    (caller falls back to the generic chirp-z executor)."""
    if not supported(plan, config):
        return None
    n = plan.n
    conv = plan.conv
    g1p, g2p = conv.sub
    g1, g2 = g1p.n, g2p.n
    nv = valid_rows(n, g2)
    prec = _kernel_precision(precision)
    mm_ok = mm_enabled(prec)  # shared gate incl. PORTFFT_ENGINE_MM

    pre_k = bank_keys.get(("BPRE", n, sign))
    post_k = bank_keys.get(("BPOST", n, sign))
    fin_k = bank_keys.get(("BFIN", n, sign))
    twb_k = bank_keys.get(("T", g2, g1, +1))
    twf_k = bank_keys.get(("T", g1, g2, -1))
    if None in (pre_k, post_k, fin_k, twb_k, twf_k):
        return None

    # butterfly (bf) mode: factored lane DFTs (~A + 128 cMAC/pt instead
    # of the dense g) with the fwd digit permutation cancelled by the
    # paired bwd stage; the in-between tables come pre-permuted
    # (TwiddleBank.blane_permuted).  Round-5 VERDICT weak #6 candidate —
    # but the on-chip A/B (scripts/ab_bluestein.py 2048 bf, 2026-08-21)
    # measured bf 169.5 ms vs dense 108.1 at 65537x2048: the butterfly's
    # extra VPU/permute passes serialize with the DMA stream and cost
    # more than the MXU FLOPs they remove (same lesson as eng-8), so bf
    # is OPT-IN via PORTFFT_BLUESTEIN_BF, never the default.
    from .pallas_global_ilv import ilv_factor

    a1c, a2c = ilv_factor(g1), ilv_factor(g2)
    blt_k = bank_keys.get(("BLT", n, sign))
    blp_k = bank_keys.get(("BLP", n, sign))
    blb_k = bank_keys.get(("BLB", n, sign))
    from ..utils.logging import _env_flag

    bf = (
        prec == "x3"
        and _env_flag("PORTFFT_BLUESTEIN_BF")
        and not _env_flag("PORTFFT_BLUESTEIN_DENSE")
        and bool(a1c)
        and bool(a2c)
        and None not in (blt_k, blp_k, blb_k)
        and all(
            (k in bank_keys)
            for k in (
                ("U", a1c, 128, -1), ("U", a1c, 128, +1),
                ("U", a2c, 128, -1), ("U", a2c, 128, +1),
                ("WK", 128, -1), ("WK", 128, +1),
            )
        )
    )
    if bf:
        twf_k = blt_k
        twb_k = blb_k
        u1f = bank_keys[("U", a1c, 128, -1)]
        u1b = bank_keys[("U", a1c, 128, +1)]
        u2f = bank_keys[("U", a2c, 128, -1)]
        u2b = bank_keys[("U", a2c, 128, +1)]
        wkf = bank_keys[("WK", 128, -1)]
        wkb = bank_keys[("WK", 128, +1)]
        bf1f = [bank[u1f + "r"], bank[u1f + "i"]] + [
            bank[wkf + str(j)] for j in range(1, 7)
        ]
        bf1b = [bank[u1b + "r"], bank[u1b + "i"]] + [
            bank[wkb + str(j)] for j in range(1, 7)
        ]
        bf2f = [bank[u2f + "r"], bank[u2f + "i"]] + [
            bank[wkf + str(j)] for j in range(1, 7)
        ]
        bf2b = [bank[u2b + "r"], bank[u2b + "i"]] + [
            bank[wkb + str(j)] for j in range(1, 7)
        ]

    # conv directions are fixed (-1 forward, +1 backward) for either user
    # direction; the user sign lives in the chirp tables.
    names_f1, mm_f1 = sub_tables(g1p, -1, bank_keys, mm_ok)
    names_f2, mm_f2 = sub_tables(g2p, -1, bank_keys, mm_ok)
    names_b2, mm_b2 = sub_tables(g2p, +1, bank_keys, mm_ok)
    names_b1, mm_b1 = sub_tables(g1p, +1, bank_keys, mm_ok)

    vmem = config.vmem_bytes
    t1 = _pick_tile(g2, g1p, g1, vmem * 5 // 8, 512, 128)
    # the middle pass runs two lane-DFT stages + three streamed tables:
    # halve the budget to double the per-tile estimate
    t2 = _pick_tile(g1, g2p, g2, vmem * 5 // 16, 512, 128)
    t3 = t1  # pass 3 shares pass 1's access pattern and budget
    if not (t1 and t2):
        return None

    lead = xr.shape[:-1]
    b = math.prod(lead) if lead else 1
    dt = xr.dtype
    pad = [(0, 0)] * (xr.ndim - 1) + [(0, nv * g2 - n)]
    x3r = jnp.pad(xr, pad).reshape(b, nv, g2)
    x3i = jnp.pad(xi, pad).reshape(b, nv, g2)

    # ---- pass 1: chirp · zero-extend · column DFT over g1 · fwd twiddle
    in1 = pl.BlockSpec(
        (1, nv, t1), lambda ti, bi: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    pre_spec = pl.BlockSpec(
        (nv, t1), lambda ti, bi: (0, ti), memory_space=pltpu.VMEM
    )
    twf_spec = pl.BlockSpec(
        (t1, g1), lambda ti, bi: (ti, 0), memory_space=pltpu.VMEM
    )
    out1 = pl.BlockSpec(
        (1, t1, g1), lambda ti, bi: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    tabs1 = bf1f if bf else [bank[nm] for nm in names_f1]
    nt1 = len(tabs1)

    def p1(xr_ref, xi_ref, bcr, bci, *rest):
        tabs = rest[:nt1]
        twr, twi = rest[nt1], rest[nt1 + 1]
        or_ref, oi_ref = rest[nt1 + 2], rest[nt1 + 3]
        fold = rest[nt1 + 4 :]
        ar0, ai0 = xla_fft.complex_mul(
            xr_ref[0], xi_ref[0], bcr[...], bci[...]
        )
        if nv < g1:
            z = jnp.zeros((g1 - nv, t1), dt)
            ar0 = jnp.concatenate([ar0, z], axis=0)
            ai0 = jnp.concatenate([ai0, z], axis=0)
        if bf:
            ar, ai = blane_dif(
                ar0.T, ai0.T, g1, -1, tabs[0], tabs[1], tabs[2:8]
            )
        else:
            ar, ai = _lane_dft(
                ar0.T, ai0.T, g1p, tabs, prec, fold, mm=mm_f1
            )
        ar, ai = xla_fft.complex_mul(ar, ai, twr[...], twi[...])
        _pf.dump("bluestein3.p1", ar)
        or_ref[0] = ar
        oi_ref[0] = ai

    sr, si = pl.pallas_call(
        p1,
        grid=(g2 // t1, b),
        in_specs=[in1, in1, pre_spec, pre_spec]
        + [_const(t) for t in tabs1]
        + [twf_spec, twf_spec],
        out_specs=[out1, out1],
        out_shape=[jax.ShapeDtypeStruct((b, g2, g1), dt)] * 2,
        scratch_shapes=[] if bf else _fold_scratches(g1p, t1, dt),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * conv.n * (sum(g1p.factors) or g1),
            bytes_accessed=4 * 2 * b * (nv * g2 + conv.n),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x3r, x3i, bank[pre_k + "r"], bank[pre_k + "i"],
        *tabs1,
        bank[twf_k + "r"], bank[twf_k + "i"],
    )

    # ---- pass 2 (merged middle): fwd row DFT over g2 · ×b̂ ·
    #      bwd column DFT over g2 (= the same lane axis) · bwd twiddle
    in2 = pl.BlockSpec(
        (1, g2, t2), lambda ji, bi: (bi, 0, ji), memory_space=pltpu.VMEM
    )
    tab2 = pl.BlockSpec(
        (t2, g2), lambda ji, bi: (ji, 0), memory_space=pltpu.VMEM
    )
    out2 = pl.BlockSpec(
        (1, t2, g2), lambda ji, bi: (bi, ji, 0), memory_space=pltpu.VMEM
    )
    tabs2f = bf2f if bf else [bank[nm] for nm in names_f2]
    tabs2b = bf2b if bf else [bank[nm] for nm in names_b2]
    ntf, ntb = len(tabs2f), len(tabs2b)
    bhat_k = blp_k if bf else post_k

    def p2(xr_ref, xi_ref, *rest):
        tabs_f = rest[:ntf]
        tabs_b = rest[ntf : ntf + ntb]
        fhr, fhi, tpr, tpi = rest[ntf + ntb : ntf + ntb + 4]
        or_ref, oi_ref = rest[ntf + ntb + 4], rest[ntf + ntb + 5]
        fold = rest[ntf + ntb + 6 :]
        if bf:
            ar, ai = blane_dif(
                xr_ref[0].T, xi_ref[0].T, g2, -1,
                tabs_f[0], tabs_f[1], tabs_f[2:8],
            )
        else:
            ar, ai = _lane_dft(
                xr_ref[0].T, xi_ref[0].T, g2p, tabs_f, prec, fold,
                mm=mm_f2,
            )  # (t2, g2) = [k1-slice, k2]
        ar, ai = xla_fft.complex_mul(ar, ai, fhr[...], fhi[...])
        if bf:
            cr, ci = blane_dit(
                ar, ai, g2, +1, tabs_b[0], tabs_b[1], tabs_b[2:8]
            )
        else:
            cr, ci = _lane_dft(
                ar, ai, g2p, tabs_b, prec, fold, mm=mm_b2
            )
        # (t2, g2) = [j2'-slice, k1']
        cr, ci = xla_fft.complex_mul(cr, ci, tpr[...], tpi[...])
        _pf.dump("bluestein3.p2", cr)
        or_ref[0] = cr
        oi_ref[0] = ci

    mr, mi = pl.pallas_call(
        p2,
        grid=(g1 // t2, b),
        in_specs=[in2, in2]
        + [_const(t) for t in tabs2f]
        + [_const(t) for t in tabs2b]
        + [tab2] * 4,
        out_specs=[out2, out2],
        out_shape=[jax.ShapeDtypeStruct((b, g1, g2), dt)] * 2,
        scratch_shapes=[] if bf else _fold_scratches(g2p, t2, dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * b * conv.n * (sum(g2p.factors) or g2),
            bytes_accessed=4 * 4 * b * conv.n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        sr, si,
        *tabs2f,
        *tabs2b,
        bank[bhat_k + "fr"], bank[bhat_k + "fi"],
        bank[twb_k + "r"], bank[twb_k + "i"],
    )

    # ---- pass 3: bwd row DFT over g1 · final chirp/scale/zero · short write
    in3 = pl.BlockSpec(
        (1, g1, t3), lambda ti, bi: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    fin_spec = pl.BlockSpec(
        (t3, g1), lambda ti, bi: (ti, 0), memory_space=pltpu.VMEM
    )
    out3 = pl.BlockSpec(
        (1, nv, t3), lambda ti, bi: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    tabs3 = bf1b if bf else [bank[nm] for nm in names_b1]
    nt3 = len(tabs3)

    def p3(xr_ref, xi_ref, *rest):
        tabs = rest[:nt3]
        pfr, pfi = rest[nt3], rest[nt3 + 1]
        or_ref, oi_ref = rest[nt3 + 2], rest[nt3 + 3]
        fold = rest[nt3 + 4 :]
        if bf:
            cr, ci = blane_dit(
                xr_ref[0].T, xi_ref[0].T, g1, +1,
                tabs[0], tabs[1], tabs[2:8],
            )
        else:
            cr, ci = _lane_dft(
                xr_ref[0].T, xi_ref[0].T, g1p, tabs, prec, fold, mm=mm_b1
            )  # (t3, g1) = [k1'-slice, k2']
        cr, ci = xla_fft.complex_mul(cr, ci, pfr[...], pfi[...])
        _pf.dump("bluestein3.p3", cr)
        or_ref[0] = cr.T[:nv]
        oi_ref[0] = ci.T[:nv]

    yr, yi = pl.pallas_call(
        p3,
        grid=(g2 // t3, b),
        in_specs=[in3, in3]
        + [_const(t) for t in tabs3]
        + [fin_spec, fin_spec],
        out_specs=[out3, out3],
        out_shape=[jax.ShapeDtypeStruct((b, nv, g2), dt)] * 2,
        scratch_shapes=[] if bf else _fold_scratches(g1p, t3, dt),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * conv.n * (sum(g1p.factors) or g1),
            bytes_accessed=4 * 2 * b * (conv.n + nv * g2),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        mr, mi,
        *tabs3,
        bank[fin_k + "r"], bank[fin_k + "i"],
    )

    # (b, nv, g2) row-major flat index = k1' + g2·k2' = the output index.
    yr = yr.reshape(b, nv * g2)[:, :n].reshape(*lead, n)
    yi = yi.reshape(b, nv * g2)[:, :n].reshape(*lead, n)
    return yr, yi
