"""Two-pass Pallas engine for GLOBAL-level transforms.

TPU-native redesign of the reference's global engine
(common/global.hpp:303-401, global_dispatcher.hpp:312-412): where the
reference launches one kernel per factor per batch chunk plus explicit
transpose kernels between passes with double-buffered scratch, this engine
needs exactly TWO Pallas kernels for n = G1·G2 (each Gi solved in-register
by the lane-DFT helper: one DFT matmul for direct sizes, the two-stage
[a, 128] pipeline for fused sizes up to a·128 — covering n ≤ 2^20 and
beyond), with the inter-factor transposes folded into the BlockSpec
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Level
from ..planner import Plan1D
from . import xla_fft
from . import pallas_fft as _pf
from .pallas_fft import _kernel_precision


def _sub_lane_ok(p: Plan1D, max_direct: int) -> bool:
    """A sub-transform the in-kernel lane-DFT helper can solve: DIRECT (one
    matmul) or the Mosaic-native FUSED shape [a, 128] with a | 128 (the
    natural-order k2-fold needs integer g = 128/a)."""
    if p.level == Level.DIRECT:
        return p.n <= max_direct and p.n % 8 == 0
    return (
        p.level == Level.FUSED
        and len(p.factors) == 2
        and p.factors[1] == 128
        and 128 % p.factors[0] == 0
    )


def global2_supported(plan: Plan1D, max_direct: int = 256) -> bool:
    if plan.level != Level.GLOBAL:
        return False
    g1, g2 = plan.sub
    return _sub_lane_ok(g1, max_direct) and _sub_lane_ok(g2, max_direct)


def _sub_table_names(sub: Plan1D, sign: int, bank_keys) -> list[str]:
    """Bank array names the lane-DFT helper needs for one sub-transform."""
    if sub.level == Level.DIRECT:
        w = bank_keys[("W", sub.n, sign)]
        return [w + "r", w + "i"]
    a = sub.factors[0]
    g = 128 // a
    wa = bank_keys[("W", a, sign)]
    u = bank_keys[("U", a, 128, sign)]
    p = bank_keys[("P", 128, sign, g)]
    return [wa + "r", wa + "i", u + "r", u + "i", p + "r", p + "i"]


def _sub_table_names_mm(sub: Plan1D, sign: int, bank_keys):
    """Widened-matmul table set for one sub-transform (None when the bank
    has no bf16 tables — fp64 banks, or shapes the keys were not built
    for).  DIRECT: Karatsuba presplit of W.  FUSED: the K/M-stacked
    stage-A table + Karatsuba presplit of the fold-permuted W128."""
    if sub.level == Level.DIRECT:
        wk = bank_keys.get(("WK", sub.n, sign))
        if wk is None:
            return None
        return [wk + str(j) for j in range(1, 7)]
    a = sub.factors[0]
    g = 128 // a
    ks = bank_keys.get(("KS", a, sign))
    pk = bank_keys.get(("PK", 128, sign, g))
    u = bank_keys.get(("U", a, 128, sign))
    if ks is None or pk is None or u is None:
        return None
    return [ks + "k", u + "r", u + "i"] + [pk + str(j) for j in range(1, 7)]


def mm_enabled(prec) -> bool:
    """Widened-matmul sub-DFT gate: x3-grade precision, with the
    PORTFFT_ENGINE_MM=0 A/B escape hatch (read at trace time).  The single
    source for every engine — two-pass plane/raw and the fused Bluestein
    engine must agree."""
    return prec == "x3" and os.environ.get("PORTFFT_ENGINE_MM", "1") != "0"


def sub_tables(sub: Plan1D, sign: int, bank_keys, mm_ok: bool):
    """(names, use_mm): the widened-matmul table set when enabled and
    banked, else the plain lane-DFT set."""
    if mm_ok:
        nm = _sub_table_names_mm(sub, sign, bank_keys)
        if nm is not None:
            return nm, True
    return _sub_table_names(sub, sign, bank_keys), False


def _fold_scratches(sub: Plan1D, t: int, dtype) -> list:
    """Restack scratch refs for a FUSED sub (none for DIRECT).  Oriented
    (128, a, t) so the lane dimension is the (large) tile width — at t=128
    the scratch is completely unpadded."""
    if sub.level == Level.DIRECT:
        return []
    a = sub.factors[0]
    return [pltpu.VMEM((128, a, t), dtype), pltpu.VMEM((128, a, t), dtype)]


def _lane_dft(xr, xi, sub: Plan1D, tabs, prec, fold, gtw=None, mm=False):
    """DFT over the lane axis of (T, n) plane tensors, natural output order.

    DIRECT: one complex matmul.  FUSED [a, 128]: the two-stage pipeline of
    ``_fused2_raw_v2_kernel`` adapted to plane tensors — stage-A left matmul
    over the a-digit, inter-factor twiddle, stage-B matmul against the
    column-permuted W_128 (storage column c = j·a + k2h holds frequency
    k2h·g + j), then a g-slice restack through the ``fold`` scratch refs:

        s[j·a + k1, k2h, t] = C[k1, t, j·a + k2h]
        out lane index       = k2h·128 + (j·a + k1) = k1 + a·(k2h·g + j) ✓

    so the lane order comes out natural (k = k1 + a·k2) and dense, and the
    surrounding pass logic is identical for DIRECT and FUSED subs.

    ``gtw`` (pass 1 only): the factored global twiddle refs
    (z1, z2, each sliced (t, 128)) — W_n^{k1·n2} split as T2 applied pre-fold on
    (a, t, 128) (columns pre-permuted by σ to match the storage order) and
    T1 applied post-fold on (128, a, t), both as legal middle-unit
    broadcasts.  This replaces the dense (g2, g1) twiddle table and its
    per-block DMA (~25% of pass-1 traffic).

    The restack uses only ops proven on hardware by the v2 raw kernel:
    contiguous sublane stores into a ≤128-lane scratch, (1,0,2) permutes,
    last-two transposes, and 128-multiple lane merges.

    ``mm``: tabs are the widened-matmul set (_sub_table_names_mm) — the
    DIRECT sub runs Karatsuba with presplit bf16 tables (9 matmuls for
    12), the FUSED sub's stage A collapses into one K/M-stacked matmul
    and stage B goes Karatsuba (the fused2 family measured MATMUL-bound;
    see ops/pallas_fft._fused2_raw_mm_kernel).
    """
    from .pallas_fft import _mm, kara_matmul_last, kstack_dft_left

    if sub.level == Level.DIRECT:
        if mm:
            return kara_matmul_last(xr, xi, tabs)
        wr, wi = tabs
        return xla_fft.complex_matmul_last(xr, xi, wr[...], wi[...], prec)
    sr, si = fold
    a = sub.factors[0]
    g = 128 // a
    t = xr.shape[0]
    # (T, n) -> (a, T, 128): lane-split reshape + leading permute
    x3r = jnp.transpose(xr.reshape(t, a, 128), (1, 0, 2))
    x3i = jnp.transpose(xi.reshape(t, a, 128), (1, 0, 2))
    x2r = x3r.reshape(a, t * 128)
    x2i = x3i.reshape(a, t * 128)
    if mm:
        ks, ur, ui = tabs[0], tabs[1], tabs[2]
        qs = tabs[3:9]
        ar, ai = kstack_dft_left(x2r, x2i, ks, a)
    else:
        war, wai, ur, ui, wpr, wpi = tabs
        # stage A: left matmul over the a-digit (DFT matrices are symmetric)
        war_, wai_ = war[...], wai[...]
        ar = _mm(war_, x2r, prec) - _mm(wai_, x2i, prec)
        ai = _mm(wai_, x2r, prec) + _mm(war_, x2i, prec)
    # inter-factor twiddle W_sub^{k1·n2}: tables (a, 128) broadcast over T
    ar3 = ar.reshape(a, t, 128)
    ai3 = ai.reshape(a, t, 128)
    ar3, ai3 = xla_fft.complex_mul(
        ar3, ai3, ur[...].reshape(a, 1, 128), ui[...].reshape(a, 1, 128)
    )
    # stage B against the permuted 128-point table
    if mm:
        cr, ci = kara_matmul_last(ar3, ai3, qs)
    else:
        cr, ci = xla_fft.complex_matmul_last(
            ar3, ai3, wpr[...], wpi[...], prec
        )
    if gtw is not None:
        z2r = gtw[2][...].reshape(1, t, 128)
        z2i = gtw[3][...].reshape(1, t, 128)
        cr, ci = xla_fft.complex_mul(cr, ci, z2r, z2i)
    for j in range(g):
        sl = slice(j * a, (j + 1) * a)
        sr[sl] = jnp.swapaxes(cr[:, :, sl], 1, 2)  # (a, a, t) [k1, k2h, t]
        si[sl] = jnp.swapaxes(ci[:, :, sl], 1, 2)
    mr, mi = sr[...], si[...]
    if gtw is not None:
        z1r = jnp.swapaxes(gtw[0][...], 0, 1).reshape(128, 1, t)
        z1i = jnp.swapaxes(gtw[1][...], 0, 1).reshape(128, 1, t)
        mr, mi = xla_fft.complex_mul(mr, mi, z1r, z1i)

    def unfold(m):
        v = jnp.transpose(m, (1, 0, 2))  # (a, 128, t) [k2h, q, t]
        v = jnp.swapaxes(v, 1, 2)        # (a, t, 128) [k2h, t, q]
        v = jnp.transpose(v, (1, 0, 2))  # (t, a, 128) [t, k2h, q]
        return v.reshape(t, a * 128)     # lane k2h·128 + j·a + k1 = k

    return unfold(mr), unfold(mi)


def _factored_ztw(tws, ti_ix):
    """Per-block Z twiddle slices from the resident factored tables
    (TwiddleBank.global_fused_twiddles_factored): complex product of the
    n2b parts (t1, 128) with the dynamically-row-sliced m2 parts."""
    b1r, b1i, b2r, b2i, a1r, a1i, a2r, a2i = tws
    r1r = a1r[pl.ds(ti_ix, 1), :]  # (1, 128)
    r1i = a1i[pl.ds(ti_ix, 1), :]
    r2r = a2r[pl.ds(ti_ix, 1), :]
    r2i = a2i[pl.ds(ti_ix, 1), :]
    c1r, c1i = xla_fft.complex_mul(b1r[...], b1i[...], r1r, r1i)
    c2r, c2i = xla_fft.complex_mul(b2r[...], b2i[...], r2r, r2i)
    return (c1r, c1i, c2r, c2i)


def _apply_factored_q(ar, ai, tws, ti_ix, t1: int, gb: int):
    """Apply the factored-resident pass-1 twiddle (TwiddleBank.btw_planes)
    to (t1, g1) planes: two broadcast complex multiplies over the
    (t1, gb, 128) lane-split view — replaces the dense streamed slices."""
    b1r, b1i, b2r, b2i, a1r, a1i, a2r, a2i = tws
    r1r = a1r[pl.ds(ti_ix, 1), :]  # (1, 128)
    r1i = a1i[pl.ds(ti_ix, 1), :]
    r2r = a2r[pl.ds(ti_ix, 1), :]  # (1, gb)
    r2i = a2i[pl.ds(ti_ix, 1), :]
    c1r, c1i = xla_fft.complex_mul(b1r[...], b1i[...], r1r, r1i)
    c2r, c2i = xla_fft.complex_mul(b2r[...], b2i[...], r2r, r2i)
    g1 = gb * 128
    a3r = ar.reshape(t1, gb, 128)
    a3i = ai.reshape(t1, gb, 128)
    a3r, a3i = xla_fft.complex_mul(
        a3r, a3i, c1r.reshape(t1, 1, 128), c1i.reshape(t1, 1, 128)
    )
    a3r, a3i = xla_fft.complex_mul(
        a3r, a3i, c2r.reshape(t1, gb, 1), c2i.reshape(t1, gb, 1)
    )
    return a3r.reshape(t1, g1), a3i.reshape(t1, g1)


def _pick_tile(g_other: int, sub_lane: Plan1D, n_lane: int, vmem: int,
               cap: int, step: int) -> int:
    """Tile width over the non-transform axis: the largest multiple of
    ``step`` dividing ``g_other`` (or g_other itself — full-dim blocks are
    always legal) whose estimated VMEM working set fits; 0 when none does.

    ``step`` encodes the Pallas block-divisibility rule: any non-full block
    dimension in the lane position must be a multiple of 128 scalars (64
    complex on the raw side's interleaved axis).
    """
    t = min(cap, g_other)
    t -= t % step
    while t >= step:
        if g_other % t == 0 and pass_est_bytes(sub_lane, n_lane, t) <= vmem:
            return t
        t -= step
    if pass_est_bytes(sub_lane, n_lane, g_other) <= vmem:
        return g_other
    return 0


def pass_est_bytes(sub_lane: Plan1D, n_lane: int, t: int) -> int:
    """VMEM working-set estimate of one engine pass at tile width ``t``:
    io blocks (double-buffered) + stage tensors/bf16 temporaries + the fold
    scratch (lane-padded below t=128) for fused subs."""
    e = t * n_lane * 4
    if sub_lane.level != Level.DIRECT:
        a = sub_lane.factors[0]
        return 18 * e + 2 * 128 * a * max(t, 128) * 4
    return 14 * e


def _const(t):
    return pl.BlockSpec(
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )


def global2_call(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config, precision=None,
    scale: float = 1.0, post: tuple | None = None, use_ftw: bool = False,
):
    """Planes (..., n) -> planes (..., n), two Pallas passes.

    ``post``: optional (re, im) arrays of shape (g1, g2) = [k1, k2] applied
    as an elementwise complex multiply inside pass 2 — the Bluestein
    convolution folds its b̂ spectrum / final chirp here, replacing a full
    read+write pass over the data.  With the post tables the pass-2 grid
    iterates batch INNERMOST so each (t2, g2) table block is fetched once,
    not once per batch row.
    """
    n = plan.n
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    prec = _kernel_precision(precision)

    lead = xr.shape[:-1]
    b = math.prod(lead) if lead else 1
    x3r = xr.reshape(b, g1, g2)
    x3i = xi.reshape(b, g1, g2)

    fused1 = g1p.level != Level.DIRECT
    # widened-matmul sub-DFTs (default at x3-grade precision; measured
    # matmul-bound — see _lane_dft docstring)
    mm_ok = mm_enabled(prec)
    names1, use_mm1 = sub_tables(g1p, sign, bank_keys, mm_ok)
    names2, use_mm2 = sub_tables(g2p, sign, bank_keys, mm_ok)

    t1 = _pick_tile(g2, g1p, g1, config.vmem_bytes * 3 // 4, 512, 128)
    t2 = _pick_tile(g1, g2p, g2, config.vmem_bytes * 3 // 4, 512, 128)
    if not t1 or not t2:
        return None  # no viable tiling; caller falls back to the XLA chain
    in1 = pl.BlockSpec(
        (1, g1, t1), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    out1 = pl.BlockSpec(
        (1, t1, g1), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    qkey = zqkey = None
    if use_ftw and not fused1:
        qkey = bank_keys.get(("Q", g1, n, sign, t1))
    elif use_ftw:
        zqkey = bank_keys.get(("ZQ", g1, g2, sign, t1))
    if fused1 and zqkey is not None:
        tw_arrays = [
            bank[zqkey + s]
            for s in ("1r", "1i", "2r", "2i", "3r", "3i", "4r", "4i")
        ]
        tw_specs = [_const(t) for t in tw_arrays]
    elif fused1:
        zkey = bank_keys[("Z", g1, g2, sign)]
        tw_arrays = [bank[zkey + s] for s in ("1r", "1i", "2r", "2i")]
        zspec = pl.BlockSpec(
            (t1, 128), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
        )
        tw_specs = [zspec] * 4
    elif qkey is not None:
        tw_arrays = [
            bank[qkey + s]
            for s in ("1r", "1i", "2r", "2i", "3r", "3i", "4r", "4i")
        ]
        tw_specs = [_const(t) for t in tw_arrays]
    else:
        tw = bank_keys[("T", g1, g2, sign)]
        tw_arrays = [bank[tw + "r"], bank[tw + "i"]]
        tw_spec = pl.BlockSpec(
            (t1, g1), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
        )
        tw_specs = [tw_spec, tw_spec]
    nt1 = len(names1)
    ntw = len(tw_arrays)
    gb1 = g1 // 128

    def p1(xr_ref, xi_ref, *rest):
        tabs = rest[:nt1]
        tws = rest[nt1 : nt1 + ntw]
        or_ref, oi_ref = rest[nt1 + ntw], rest[nt1 + ntw + 1]
        fold = rest[nt1 + ntw + 2 :]
        if fused1:
            if zqkey is not None:
                gtw_vals = _factored_ztw(tws, pl.program_id(1))
            else:
                gtw_vals = tws
            ar, ai = _lane_dft(
                xr_ref[0].T, xi_ref[0].T, g1p, tabs, prec, fold,
                gtw=gtw_vals, mm=use_mm1,
            )
        elif qkey is not None:
            ar, ai = _lane_dft(
                xr_ref[0].T, xi_ref[0].T, g1p, tabs, prec, fold, mm=use_mm1
            )
            ar, ai = _apply_factored_q(ar, ai, tws, pl.program_id(1), t1, gb1)
        else:
            ar, ai = _lane_dft(
                xr_ref[0].T, xi_ref[0].T, g1p, tabs, prec, fold, mm=use_mm1
            )
            ar, ai = xla_fft.complex_mul(ar, ai, tws[0][...], tws[1][...])
        _pf.dump("global2.p1", ar)
        or_ref[0] = ar
        oi_ref[0] = ai

    sr, si = pl.pallas_call(
        p1,
        grid=(b, g2 // t1),
        in_specs=[in1, in1]
        + [_const(bank[nm]) for nm in names1]
        + tw_specs,
        out_specs=[out1, out1],
        out_shape=[jax.ShapeDtypeStruct((b, g2, g1), xr.dtype)] * 2,
        scratch_shapes=_fold_scratches(g1p, t1, xr.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * (sum(g1p.factors) or g1),
            bytes_accessed=4 * 4 * b * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3r, x3i, *[bank[nm] for nm in names1], *tw_arrays)
    if post is None:
        in2 = pl.BlockSpec(
            (1, g2, t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
        )
        out2 = pl.BlockSpec(
            (1, g2, t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
        )
        grid2 = (b, g1 // t2)
        post_in, post_specs = [], []
    else:
        # batch innermost: the post-table block index is constant across
        # the inner sweep, so Pallas fetches each (t2, g2) slice once
        in2 = pl.BlockSpec(
            (1, g2, t2), lambda ji, bi: (bi, 0, ji), memory_space=pltpu.VMEM
        )
        out2 = pl.BlockSpec(
            (1, g2, t2), lambda ji, bi: (bi, 0, ji), memory_space=pltpu.VMEM
        )
        grid2 = (g1 // t2, b)
        pspec = pl.BlockSpec(
            (t2, g2), lambda ji, bi: (ji, 0), memory_space=pltpu.VMEM
        )
        post_in = [post[0], post[1]]
        post_specs = [pspec, pspec]
    nt2 = len(names2)
    npost = len(post_in)

    def p2(xr_ref, xi_ref, *rest):
        tabs = rest[:nt2]
        ptabs = rest[nt2 : nt2 + npost]
        or_ref, oi_ref = rest[nt2 + npost], rest[nt2 + npost + 1]
        fold = rest[nt2 + npost + 2 :]
        cr, ci = _lane_dft(
            xr_ref[0].T, xi_ref[0].T, g2p, tabs, prec, fold, mm=use_mm2
        )  # (t2, g2) = [k1-slice, k2]
        if npost:
            cr, ci = xla_fft.complex_mul(
                cr, ci, ptabs[0][...], ptabs[1][...]
            )
        if scale != 1.0:
            cr = cr * scale
            ci = ci * scale
        or_ref[0] = cr.T  # (g2, t2) = [k2, k1-slice]
        oi_ref[0] = ci.T

    yr, yi = pl.pallas_call(
        p2,
        grid=grid2,
        in_specs=[in2, in2] + [_const(bank[nm]) for nm in names2]
        + post_specs,
        out_specs=[out2, out2],
        out_shape=[jax.ShapeDtypeStruct((b, g2, g1), xr.dtype)] * 2,
        scratch_shapes=_fold_scratches(g2p, t2, xr.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * (sum(g2p.factors) or g2),
            bytes_accessed=4 * 4 * b * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(sr, si, *[bank[nm] for nm in names2], *post_in)

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


def _sq_tab_bytes(sub: Plan1D) -> int:
    """Resident table bytes for one sub in the single-pass kernel: DIRECT
    = six (n, n) bf16 Karatsuba presplits; FUSED = kstack + twiddle_fm +
    six (128, 128) presplits."""
    if sub.level == Level.DIRECT:
        return 12 * sub.n * sub.n
    a = sub.factors[0]
    return 24 * a * a + 8 * a * 128 + 12 * 128 * 128


def _sq_fold_bytes(sub: Plan1D, t: int) -> int:
    if sub.level == Level.DIRECT:
        return 0
    return 2 * 128 * sub.factors[0] * t * 4


def sq_est_bytes(plan: Plan1D, bt: int) -> int:
    """VMEM working-set estimate of the single-pass square kernel: in/out
    blocks double-buffered, two plane scratches, matmul split/term
    temporaries for both stages (~6 plane-sized tensors each live in
    turn), interleave scratches, fold scratches for FUSED subs, and the
    resident tables (per-sub matmul sets + the dense inter-factor
    twiddle)."""
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    dp = bt * g1 * g2 * 4
    tables = _sq_tab_bytes(g1p) + _sq_tab_bytes(g2p) + 2 * g1 * g2 * 4
    return (
        22 * dp
        + (2 * g1 + 2 * g2) * 128 * 4
        + _sq_fold_bytes(g1p, bt * g2)
        + _sq_fold_bytes(g2p, bt * g1)
        + tables
    )


def global_sq_supported(plan: Plan1D, config) -> bool:
    """Single-pass variant: the whole n = G1·G2 transform in one Pallas
    kernel — half the HBM traffic of the two-pass engine at the same total
    MXU work.  Worth it when the two passes are DMA-bound (the mm kernels
    made them so); reachable via the autotuner's {"eng": 5} variants.
    Needs lane-DFT-solvable subs (DIRECT ≤ 256 or the [a, 128] FUSED
    shape), 128-aligned for the in-kernel de/interleave, and the
    per-transform working set in VMEM."""
    if plan.level != Level.GLOBAL:
        return False
    md = getattr(config, "direct_threshold", 256)
    g1p, g2p = plan.sub
    if not (_sub_lane_ok(g1p, md) and _sub_lane_ok(g2p, md)):
        return False
    if g1p.n % 128 or g2p.n % 128:
        return False
    # the byte estimate is deliberately conservative (counts every stage
    # temporary as live); allow 2x — Mosaic enforces the true VMEM bound
    # at compile time and rejections are caught (autotune skips the
    # variant, committed._run falls back)
    return sq_est_bytes(plan, 1) <= 2 * config.vmem_bytes


def global_sq_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, bt_override: int = 0,
):
    """PACKED interleaved raw (2·batch·n,) -> transformed raw, ONE pass.

    Fuses the two engine passes through a VMEM transpose: deinterleave
    (pass-1 style), lane-DFT over n1 (one widened matmul for DIRECT subs,
    the two-stage kstack/Karatsuba pipeline for FUSED), dense twiddle
    multiply, last-two-dims transpose, lane-DFT over n2, reinterleave
    (pass-2 style, digit-reversal folded into the output rows).  Requires
    the widened-matmul bf16 tables (fp32/x3 grade); other precisions fall
    back to the two-pass engine."""
    prec = _kernel_precision(precision)
    if prec != "x3":
        return None
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    names1 = _sub_table_names_mm(g1p, sign, bank_keys)
    names2 = _sub_table_names_mm(g2p, sign, bank_keys)
    tw = bank_keys.get(("T", g1, g2, sign))
    if names1 is None or names2 is None or tw is None:
        return None

    cap = 2 * config.vmem_bytes  # see global_sq_supported
    bt = bt_override or 1
    while bt > 1 and (batch % bt or sq_est_bytes(plan, bt) > cap):
        bt //= 2
    if batch % bt or sq_est_bytes(plan, bt) > cap:
        return None

    x3 = raw.reshape(batch, g1, 2 * g2)
    in_spec = pl.BlockSpec(
        (bt, g1, 2 * g2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (bt, g2, 2 * g1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    shared = names2 == names1  # same sub: one resident table set
    nt1 = len(names1)
    nt2 = 0 if shared else len(names2)
    nf1 = 0 if g1p.level == Level.DIRECT else 2

    def kern(x_ref, *rest):
        tabs1 = rest[:nt1]
        tabs2 = tabs1 if shared else rest[nt1 : nt1 + nt2]
        tw_r, tw_i = rest[nt1 + nt2], rest[nt1 + nt2 + 1]
        o_ref = rest[nt1 + nt2 + 2]
        s3, pr, pi, s2 = rest[nt1 + nt2 + 3 : nt1 + nt2 + 7]
        fold1 = rest[nt1 + nt2 + 7 : nt1 + nt2 + 7 + nf1]
        fold2 = rest[nt1 + nt2 + 7 + nf1 :]
        for b in range(bt):
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[b, sl, :].T      # (2·g2, 128)
                pr[b, :, sl] = s3[0::2, :]       # (g2, 128) = [n2, n1-sl]
                pi[b, :, sl] = s3[1::2, :]
        # stage A: lane-DFT over n1 -> [n2, k1] (natural k1 order)
        ar, ai = _lane_dft(
            pr[...].reshape(bt * g2, g1), pi[...].reshape(bt * g2, g1),
            g1p, tabs1, prec, fold1, mm=True,
        )
        ar = ar.reshape(bt, g2, g1)
        ai = ai.reshape(bt, g2, g1)
        # inter-factor twiddle, bank layout (m=g2, f=g1) = [n2, k1]
        ar, ai = xla_fft.complex_mul(ar, ai, tw_r[...], tw_i[...])
        ar = jnp.swapaxes(ar, -2, -1)            # [k1, n2]
        ai = jnp.swapaxes(ai, -2, -1)
        # stage B: lane-DFT over n2 -> [k1, k2]
        cr, ci = _lane_dft(
            ar.reshape(bt * g1, g2), ai.reshape(bt * g1, g2),
            g2p, tabs2, prec, fold2, mm=True,
        )
        cr = cr.reshape(bt, g1, g2)
        ci = ci.reshape(bt, g1, g2)
        if scale != 1.0:
            cr = cr * scale
            ci = ci * scale
        _pf.dump("global_sq.out", cr)
        for b in range(bt):
            for j in range(g2 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s2[0::2, :] = cr[b][:, sl]       # (2·g1, 128)
                s2[1::2, :] = ci[b][:, sl]
                o_ref[b, sl, :] = s2[...].T      # (128, 2·g1) = [k2, 2k1+p]

    tw_arrays = [bank[tw + "r"], bank[tw + "i"]]
    tabs = [bank[nm] for nm in names1]
    if not shared:
        tabs += [bank[nm] for nm in names2]
    out = pl.pallas_call(
        kern,
        grid=(batch // bt,),
        in_specs=[in_spec] + [_const(t) for t in tabs + tw_arrays],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * g2, 128), raw.dtype),
            pltpu.VMEM((bt, g2, g1), raw.dtype),
            pltpu.VMEM((bt, g2, g1), raw.dtype),
            pltpu.VMEM((2 * g1, 128), raw.dtype),
        ]
        + _fold_scratches(g1p, bt * g2, raw.dtype)
        + _fold_scratches(g2p, bt * g1, raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * plan.n
            * ((sum(g1p.factors) or g1) + (sum(g2p.factors) or g2)),
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, *tabs, *tw_arrays)
    return out.reshape(raw.shape[0])


def global2_raw_supported(plan: Plan1D, max_direct: int = 256) -> bool:
    """Raw variant additionally needs 128 | G1 and 128 | G2 (the in-kernel
    de/interleave walks 128-lane tiles)."""
    if not global2_supported(plan, max_direct):
        return False
    g1, g2 = plan.sub
    return g1.n % 128 == 0 and g2.n % 128 == 0


def fused_eng_est_bytes(plan: Plan1D, t1: int, t2: int) -> int:
    """VMEM working-set estimate of the fused (persistent-scratch) engine:
    the per-transform intermediate planes live in VMEM for the whole batch
    row, plus the larger of the two phases' per-step working sets."""
    g1p, g2p = plan.sub
    planes = 2 * plan.n * 4
    return planes + max(
        pass_est_bytes(g1p, g1p.n, t1), pass_est_bytes(g2p, g2p.n, t2)
    )


def global_fused_supported(plan: Plan1D, config) -> bool:
    """Fused single-sweep engine (autotuner ``{"eng": 6}``): both engine
    passes in ONE Pallas kernel, the (g2, g1) intermediate planes held in
    persistent VMEM scratch across grid steps — per batch row the grid
    walks phase-A tiles (HBM input -> scratch) then phase-B tiles
    (scratch -> HBM output).  HBM traffic drops from the two-pass engine's
    4 sweeps (+ twiddle stream) to 2 sweeps (+ twiddle stream): the
    intermediate never touches HBM.  The per-transform planes are only
    8·n bytes (8 MB at n=2^20), so unlike the whole-transform single-pass
    square kernel (eng 5, working set ~22·n·4) this covers the full
    GLOBAL ladder on a 16 MiB-VMEM part."""
    if not global2_raw_supported(
        plan, getattr(config, "direct_threshold", 256)
    ):
        return False
    g1p, g2p = plan.sub
    t1 = _pick_tile(g2p.n, g1p, g1p.n, config.vmem_bytes * 3 // 4, 256, 64)
    t2 = _pick_tile(g1p.n, g2p, g2p.n, config.vmem_bytes * 3 // 4, 256, 128)
    if not t1 or not t2:
        return False
    # conservative estimate, 2x slack: Mosaic enforces the true VMEM bound
    # at compile time; rejections are caught (autotune skips the variant,
    # committed._run falls back to the two-pass engine)
    return fused_eng_est_bytes(plan, t1, t2) <= 2 * config.vmem_bytes


def global_fused_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
    t2_override: int = 0, use_ftw: bool = False,
):
    """PACKED interleaved raw (2·batch·n,) -> transformed raw, one fused
    kernel (see ``global_fused_supported``).

    Grid (batch, nA + nB), sequential: steps s < nA run phase A on input
    tile s (deinterleave, lane-DFT over g1, inter-factor twiddle, store
    (t1, g1) rows into the persistent scratch planes); steps s >= nA run
    phase B on scratch column slice s - nA (lane-DFT over g2, scale,
    reinterleave into the output block).  Block index maps clamp so phase-B
    steps revisit the last phase-A input block (Pallas skips the re-fetch
    when the block index is unchanged) and phase-A steps sit on the first
    output block (it is only flushed after phase B writes it).
    """
    n = plan.n
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    prec = _kernel_precision(precision)
    if not global2_raw_supported(plan, config.direct_threshold):
        return None
    fused1 = g1p.level != Level.DIRECT
    mm_ok = mm_enabled(prec)
    names1, use_mm1 = sub_tables(g1p, sign, bank_keys, mm_ok)
    names2, use_mm2 = sub_tables(g2p, sign, bank_keys, mm_ok)

    if t1_override and (g2 % t1_override or t1_override % 64):
        t1_override = 0
    if t2_override and (g1 % t2_override or t2_override % 128):
        t2_override = 0
    t1 = t1_override or _pick_tile(
        g2, g1p, g1, config.vmem_bytes * 3 // 4, 256, 64
    )
    t2 = t2_override or _pick_tile(
        g1, g2p, g2, config.vmem_bytes * 3 // 4, 256, 128
    )
    if not t1 or not t2:
        return None
    if fused_eng_est_bytes(plan, t1, t2) > 2 * config.vmem_bytes:
        return None
    nA = g2 // t1
    nB = g1 // t2

    x3 = raw.reshape(batch, g1, 2 * g2)
    in_spec = pl.BlockSpec(
        (1, g1, 2 * t1),
        lambda bi, s: (bi, 0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, g2, 2 * t2),
        lambda bi, s: (bi, 0, jnp.maximum(s - nA, 0)),
        memory_space=pltpu.VMEM,
    )

    qkey = zqkey = None
    if use_ftw and not fused1:
        qkey = bank_keys.get(("Q", g1, n, sign, t1))
    elif use_ftw:
        zqkey = bank_keys.get(("ZQ", g1, g2, sign, t1))
    if fused1 and zqkey is not None:
        tw_arrays = [
            bank[zqkey + s]
            for s in ("1r", "1i", "2r", "2i", "3r", "3i", "4r", "4i")
        ]
        tw_specs = [_const(t) for t in tw_arrays]
    elif fused1:
        zkey = bank_keys[("Z", g1, g2, sign)]
        tw_arrays = [bank[zkey + s] for s in ("1r", "1i", "2r", "2i")]
        zspec = pl.BlockSpec(
            (t1, 128),
            lambda bi, s: (jnp.minimum(s, nA - 1), 0),
            memory_space=pltpu.VMEM,
        )
        tw_specs = [zspec] * 4
    elif qkey is not None:
        tw_arrays = [
            bank[qkey + s]
            for s in ("1r", "1i", "2r", "2i", "3r", "3i", "4r", "4i")
        ]
        tw_specs = [_const(t) for t in tw_arrays]
    else:
        tw = bank_keys[("T", g1, g2, sign)]
        tw_arrays = [bank[tw + "r"], bank[tw + "i"]]
        tw_spec = pl.BlockSpec(
            (t1, g1),
            lambda bi, s: (jnp.minimum(s, nA - 1), 0),
            memory_space=pltpu.VMEM,
        )
        tw_specs = [tw_spec, tw_spec]

    shared = names2 == names1
    nt1 = len(names1)
    nt2 = 0 if shared else len(names2)
    ntw = len(tw_arrays)
    nf1 = 0 if g1p.level == Level.DIRECT else 2
    gb = g1 // 128

    def kern(x_ref, *rest):
        tabs1 = rest[:nt1]
        tabs2 = tabs1 if shared else rest[nt1 : nt1 + nt2]
        tws = rest[nt1 + nt2 : nt1 + nt2 + ntw]
        o_ref = rest[nt1 + nt2 + ntw]
        sc = rest[nt1 + nt2 + ntw + 1 :]
        s3, pr, pi, s2, Sr, Si = sc[:6]
        fold1 = sc[6 : 6 + nf1]
        fold2 = sc[6 + nf1 :]
        s = pl.program_id(1)
        ti_ix = jnp.minimum(s, nA - 1)

        @pl.when(s < nA)
        def _phase_a():
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[0, sl, :].T  # (2t1, 128)
                pr[:, sl] = s3[0::2, :]      # (t1, 128) = [n2, n1-slice]
                pi[:, sl] = s3[1::2, :]
            if fused1:
                if zqkey is not None:
                    gtw_vals = _factored_ztw(tws, ti_ix)
                else:
                    gtw_vals = tws
                ar, ai = _lane_dft(
                    pr[...], pi[...], g1p, tabs1, prec, fold1,
                    gtw=gtw_vals, mm=use_mm1,
                )
            elif qkey is not None:
                ar, ai = _lane_dft(
                    pr[...], pi[...], g1p, tabs1, prec, fold1, mm=use_mm1
                )
                ar, ai = _apply_factored_q(ar, ai, tws, ti_ix, t1, gb)
            else:
                ar, ai = _lane_dft(
                    pr[...], pi[...], g1p, tabs1, prec, fold1, mm=use_mm1
                )
                ar, ai = xla_fft.complex_mul(ar, ai, tws[0][...], tws[1][...])
            _pf.dump("global_fused.p1", ar)
            Sr[pl.ds(s * t1, t1), :] = ar
            Si[pl.ds(s * t1, t1), :] = ai

        @pl.when(s >= nA)
        def _phase_b():
            j = jnp.maximum(s - nA, 0)
            col = pl.multiple_of(j * t2, t2)
            br = Sr[:, pl.ds(col, t2)]  # (g2, t2) = [n2, k1-slice]
            bi_ = Si[:, pl.ds(col, t2)]
            cr, ci = _lane_dft(
                br.T, bi_.T, g2p, tabs2, prec, fold2, mm=use_mm2
            )  # (t2, g2) = [k1-slice, k2]
            if scale != 1.0:
                cr = cr * scale
                ci = ci * scale
            for jj in range(g2 // 128):
                sl = slice(jj * 128, (jj + 1) * 128)
                s2[0::2, :] = cr[:, sl]  # (2t2, 128)
                s2[1::2, :] = ci[:, sl]
                o_ref[0, sl, :] = s2[...].T  # (128, 2t2) = [k2-slice, 2k1+p]

    tabs = [bank[nm] for nm in names1]
    if not shared:
        tabs += [bank[nm] for nm in names2]
    out = pl.pallas_call(
        kern,
        grid=(batch, nA + nB),
        in_specs=[in_spec] + [_const(t) for t in tabs] + tw_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * t1, 128), raw.dtype),
            pltpu.VMEM((t1, g1), raw.dtype),
            pltpu.VMEM((t1, g1), raw.dtype),
            pltpu.VMEM((2 * t2, 128), raw.dtype),
            pltpu.VMEM((g2, g1), raw.dtype),
            pltpu.VMEM((g2, g1), raw.dtype),
        ]
        + _fold_scratches(g1p, t1, raw.dtype)
        + _fold_scratches(g2p, t2, raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n
            * ((sum(g1p.factors) or g1) + (sum(g2p.factors) or g2)),
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, *tabs, *tw_arrays)
    return out.reshape(raw.shape[0])


def global2_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
    t2_override: int = 0, use_ftw: bool = False,
    use_mm: bool | None = None, use_ds: bool = False,
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

    if not global2_raw_supported(plan, config.direct_threshold):
        return None  # v3-only plan shapes (e.g. 128 % a != 0 fused G1)
    fused1 = g1p.level != Level.DIRECT
    if use_mm is None:
        mm_ok = mm_enabled(prec)
    else:
        mm_ok = bool(use_mm) and prec == "x3"
    names1, use_mm1 = sub_tables(g1p, sign, bank_keys, mm_ok)
    names2, use_mm2 = sub_tables(g2p, sign, bank_keys, mm_ok)

    # pass-1 lane tile is 2·t1 interleaved scalars -> t1 multiple of 64;
    # pass-2 reads t2 plane lanes -> multiple of 128.  Tuned overrides are
    # validated like every other override consumer — a stale cache entry
    # must not leave tail tiles unwritten (grid floors g2 // t1).
    if t1_override and (g2 % t1_override or t1_override % 64):
        t1_override = 0
    if t2_override and (g1 % t2_override or t2_override % 128):
        t2_override = 0
    t1 = t1_override or _pick_tile(
        g2, g1p, g1, config.vmem_bytes * 3 // 4, 256, 64
    )
    t2 = t2_override or _pick_tile(
        g1, g2p, g2, config.vmem_bytes * 3 // 4, 256, 128
    )
    if not t1 or not t2:
        return None  # no viable tiling; caller falls back
    in1 = pl.BlockSpec(
        (1, g1, 2 * t1), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
    )
    out1 = pl.BlockSpec(
        (1, t1, g1), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    qkey = zqkey = None
    # opt-in (tuning override "ftw"): the factored-resident twiddles
    # measured SLOWER than the dense streamed slices on v5e (direct G1:
    # 87 vs 106 GB/s at N=65536; fused G1: 60.5 vs 62.2 at 2^20) — the
    # engine is VPU-bound, the dense stream overlaps with compute, and
    # the replacement broadcast views waste sublanes at small gb.  Kept
    # as an autotuner variant for bandwidth-starved devices.
    if use_ftw and not fused1:
        qkey = bank_keys.get(("Q", g1, n, sign, t1))
    elif use_ftw:
        zqkey = bank_keys.get(("ZQ", g1, g2, sign, t1))
    if fused1 and zqkey is not None:
        # factored resident Z tables (global_fused_twiddles_factored):
        # nothing streamed per block
        tw_arrays = [
            bank[zqkey + s]
            for s in ("1r", "1i", "2r", "2i", "3r", "3i", "4r", "4i")
        ]
        tw_specs = [_const(t) for t in tw_arrays]
    elif fused1:
        zkey = bank_keys[("Z", g1, g2, sign)]
        tw_arrays = [bank[zkey + s] for s in ("1r", "1i", "2r", "2i")]
        zspec = pl.BlockSpec(
            (t1, 128), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
        )
        tw_specs = [zspec] * 4
    elif qkey is not None:
        # factored resident twiddle (TwiddleBank.btw_planes): nothing is
        # streamed per block — the dense (t1, g1) twiddle slices were one
        # third of pass-1 HBM traffic
        tw_arrays = [
            bank[qkey + s]
            for s in ("1r", "1i", "2r", "2i", "3r", "3i", "4r", "4i")
        ]
        tw_specs = [_const(t) for t in tw_arrays]
    else:
        tw = bank_keys[("T", g1, g2, sign)]
        tw_arrays = [bank[tw + "r"], bank[tw + "i"]]
        tw_spec = pl.BlockSpec(
            (t1, g1), lambda bi, ti: (ti, 0), memory_space=pltpu.VMEM
        )
        tw_specs = [tw_spec, tw_spec]
    nt1 = len(names1)
    ntw = len(tw_arrays)
    gb = g1 // 128

    def p1(x_ref, *rest):
        tabs = rest[:nt1]
        tws = rest[nt1 : nt1 + ntw]
        or_ref, oi_ref = rest[nt1 + ntw], rest[nt1 + ntw + 1]
        s3, pr, pi = rest[nt1 + ntw + 2 : nt1 + ntw + 5]
        fold = rest[nt1 + ntw + 5 :]
        # deinterleave per 128-column tile of the (g1, 2t1) block; the
        # strided sublane reads require a 128-lane scratch base
        for j in range(g1 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s3[...] = x_ref[0, sl, :].T  # (2t1, 128)
            pr[:, sl] = s3[0::2, :]  # (t1, 128) = [n2, n1-slice]
            pi[:, sl] = s3[1::2, :]
        if fused1:
            if zqkey is not None:
                gtw_vals = _factored_ztw(tws, pl.program_id(1))
            else:
                gtw_vals = tws
            ar, ai = _lane_dft(
                pr[...], pi[...], g1p, tabs, prec, fold, gtw=gtw_vals,
                mm=use_mm1,
            )
        elif qkey is not None:
            ar, ai = _lane_dft(pr[...], pi[...], g1p, tabs, prec, fold,
                               mm=use_mm1)
            ar, ai = _apply_factored_q(ar, ai, tws, pl.program_id(1), t1, gb)
        else:
            ar, ai = _lane_dft(pr[...], pi[...], g1p, tabs, prec, fold,
                               mm=use_mm1)
            ar, ai = xla_fft.complex_mul(ar, ai, tws[0][...], tws[1][...])
        _pf.dump("global2.p1", ar)
        or_ref[0] = ar
        oi_ref[0] = ai

    sr, si = pl.pallas_call(
        p1,
        grid=(batch, g2 // t1),
        in_specs=[in1]
        + [_const(bank[nm]) for nm in names1]
        + tw_specs,
        out_specs=[out1, out1],
        out_shape=[jax.ShapeDtypeStruct((batch, g2, g1), raw.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * t1, 128), raw.dtype),
            pltpu.VMEM((t1, g1), raw.dtype),
            pltpu.VMEM((t1, g1), raw.dtype),
        ]
        + _fold_scratches(g1p, t1, raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * (sum(g1p.factors) or g1),
            bytes_accessed=4 * 4 * batch * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
        # {"ds": 1} autotuner variant: batch grid dim declared parallel
        **(_pf.ds_params("parallel", "arbitrary") if use_ds else {}),
    )(x3, *[bank[nm] for nm in names1], *tw_arrays)
    in2 = pl.BlockSpec(
        (1, g2, t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )
    out2 = pl.BlockSpec(
        (1, g2, 2 * t2), lambda bi, ji: (bi, 0, ji), memory_space=pltpu.VMEM
    )
    nt2 = len(names2)

    def p2(xr_ref, xi_ref, *rest):
        tabs = rest[:nt2]
        o_ref = rest[nt2]
        s2 = rest[nt2 + 1]
        fold = rest[nt2 + 2 :]
        cr, ci = _lane_dft(
            xr_ref[0].T, xi_ref[0].T, g2p, tabs, prec, fold, mm=use_mm2
        )  # (t2, g2) = [k1-slice, k2]
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
        in_specs=[in2, in2] + [_const(bank[nm]) for nm in names2],
        out_specs=out2,
        out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
        scratch_shapes=[pltpu.VMEM((2 * t2, 128), raw.dtype)]
        + _fold_scratches(g2p, t2, raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * (sum(g2p.factors) or g2),
            bytes_accessed=4 * 4 * batch * n,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
        **(_pf.ds_params("parallel", "arbitrary") if use_ds else {}),
    )(sr, si, *[bank[nm] for nm in names2])

    return out.reshape(raw.shape[0])
