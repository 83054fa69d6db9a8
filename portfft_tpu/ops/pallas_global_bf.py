"""Butterfly-factored single-sweep GLOBAL engine (autotuner ``{"eng": 7}``).

Why it exists: the round-4 attribution probe (scripts/probe_eng6.py,
logs/r4d_probe_eng6.log) showed the fused eng-6 engine at n=2^17 is
COMPUTE-bound — its data movement alone streams at 271 GB/s (7.9 ms) but
the dense lane-DFT matmuls add ~12 ms on top.  A dense g-point DFT matmul
costs g complex MACs per point; at the ladder's 512x256..512x2048 splits
that is 768-1024 cMAC/point, an order of magnitude above the
O(sum of radices) a factored FFT needs.

This engine factors every sub-DFT as g = A·128 (A a power of two ≤ 16):

* a radix-A BUTTERFLY over the contiguous 128-lane input slabs — pure VPU
  adds (plus a handful of exact ±1/±i/√2-scalar multiplies), no tables,
  no MXU work;
* the (A, 128) digit twiddle ω_g^{kA·iB} (the banked U table);
* ONE 128-point Karatsuba matmul (the banked WK128 presplit tables).

cMAC/point drops to 128 + 128 = 256 for BOTH passes combined — flat
across the whole GLOBAL ladder — while HBM traffic keeps eng-6's
single-sweep shape (read 8n + twiddle stream 8n/A1 + write 8n).

The classic obstacle is digit order: the two-stage form emits frequency
k = kA + A·kB with kA on the slab axis and kB on the matmul lanes, i.e.
lane-storage order L = 128·kA + kB — a permutation σ of the natural
order.  Every relayout that would fix it in-kernel (lane gathers,
sub-128-lane merges) is exactly the Mosaic-hostile work this engine
exists to avoid, so σ is absorbed structurally instead:

* pass 1 (g1): the persistent scratch is laid out 3-D as
  ``(128, A1, g2)`` = [kB1, kA1, n2], whose leading-axes flatten is the
  NATURAL k1 = A1·kB1 + kA1 — each output slab kA1 lands with one
  (t1, 128) transpose and a unit-middle-index store, no strided lanes;
* the inter-factor twiddle W_n^{k1·n2} splits along the same digits into
  a resident (A1, g2) table and a streamed (128, g2) table
  (ω_n^{kA1·n2} · ω_{n/A1}^{kB1·n2}), applied per-slab post-transpose as
  legal row/block broadcasts — the dense (g2, g1) stream shrinks by A1×;
* pass 2 (g2): an in-place DIF butterfly over the A2 lane-slabs of the
  scratch (bit-reversed slab positions are a free Python-side index
  mapping), then one substep per output digit kA2 whose result block
  lands through a 4-D view of the output — (batch, kB2:128, kA2:A2,
  2·g1) row-major flattens to the natural 2·(k1 + g1·k2)+p — so even the
  σ of pass 2 costs only an index map, never a strided DMA.

Reference counterpart being replaced: the multi-kernel factor chain of
the global engine (/root/reference/src/portfft/dispatcher/
global_dispatcher.hpp:312-412) — one Pallas kernel instead of
2 factors × batch-chunk kernels + transposes.
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
from .pallas_fft import _kernel_precision, kara_matmul_last


def bf_factor(g: int) -> int:
    """Butterfly factor A for g = A·128: a power of two in [1, 16]
    (A=1 degenerates to the plain 128-point matmul), else 0."""
    if g % 128:
        return 0
    a = g // 128
    if a < 1 or a > 16 or (a & (a - 1)):
        return 0
    return a


def _snap(v: float) -> float:
    """Snap host-computed roots of unity to exact 0/±1 so the butterfly
    emits negations instead of multiplies-by-epsilon."""
    for t in (0.0, 1.0, -1.0):
        if abs(v - t) < 1e-12:
            return t
    return v


def _cmul_const(xr, xi, wr: float, wi: float):
    """(xr + i·xi)·(wr + i·wi) with exact shortcuts for ±1 / ±i."""
    if wi == 0.0:
        if wr == 1.0:
            return xr, xi
        if wr == -1.0:
            return -xr, -xi
        return xr * wr, xi * wr
    if wr == 0.0:
        if wi == 1.0:
            return -xi, xr
        if wi == -1.0:
            return xi, -xr
        return -xi * wi, xr * wi
    return xr * wr - xi * wi, xr * wi + xi * wr


def _bf_slabs(slabs: list, sign: int) -> list:
    """Radix-2 DIT butterfly over a list of complex slab pairs: input slab
    index = the HIGH input digit iA (i = 128·iA + iB), output slab index =
    the LOW frequency digit kA (k = kA + A·kB), NATURAL order."""
    a = len(slabs)
    if a == 1:
        return slabs
    ev = _bf_slabs(slabs[0::2], sign)
    od = _bf_slabs(slabs[1::2], sign)
    out = [None] * a
    for q in range(a // 2):
        ang = sign * 2.0 * math.pi * q / a
        wr, wi = _snap(math.cos(ang)), _snap(math.sin(ang))
        tr, ti = _cmul_const(od[q][0], od[q][1], wr, wi)
        er, ei = ev[q]
        out[q] = (er + tr, ei + ti)
        out[q + a // 2] = (er - tr, ei - ti)
    return out


def _dif_slab_layers(p2r, p2i, a: int, sign: int) -> None:
    """In-place DIF butterfly over the ``a`` 128-lane slabs of the
    (128, A1, g2) scratch refs: after the layers, frequency digit kA sits
    at slab position bitrev(kA).  Liveness stays at two slab tensors —
    the recursive SSA form would hold all ``a`` at once."""
    span = a
    while span >= 2:
        for b0 in range(0, a, span):
            for i in range(span // 2):
                u, v = b0 + i, b0 + i + span // 2
                # static slices: u/v are Python ints (pl.ds here traces
                # to dynamic-slice ops that cost 20x+ in interpret mode)
                su = slice(u * 128, (u + 1) * 128)
                sv = slice(v * 128, (v + 1) * 128)
                ur, ui = p2r[:, :, su], p2i[:, :, su]
                vr, vi = p2r[:, :, sv], p2i[:, :, sv]
                ang = sign * 2.0 * math.pi * i / span
                wr, wi = _snap(math.cos(ang)), _snap(math.sin(ang))
                dr, di = ur - vr, ui - vi
                p2r[:, :, su] = ur + vr
                p2i[:, :, su] = ui + vi
                tr, ti = _cmul_const(dr, di, wr, wi)
                p2r[:, :, sv] = tr
                p2i[:, :, sv] = ti
        span //= 2


def _bitrev(x, nbits: int):
    """Bit-reversal of a traced index (nbits ≤ 4)."""
    if nbits == 0:
        return x
    r = x - x  # 0 of x's dtype
    for b in range(nbits):
        r = r | (((x >> b) & 1) << (nbits - 1 - b))
    return r


def bf_est_bytes(plan: Plan1D, t1: int) -> int:
    """VMEM working-set estimate: persistent scratch + io blocks
    (double-buffered) + phase temporaries + resident tables."""
    g1, g2 = plan.sub[0].n, plan.sub[1].n
    a1 = max(1, g1 // 128)
    a2 = max(1, g2 // 128)
    n = g1 * g2
    p2 = 8 * n
    io = 2 * (g1 * 2 * t1 * 4) + 2 * (128 * 2 * g1 * 4)
    ph_a = 12 * a1 * t1 * 128 * 4
    ph_b = 12 * g1 * 128 * 4 + 8 * 128 * a1 * 128 * 4
    gbs = 2 * 2 * 128 * t1 * 4
    tabs = 12 * 128 * 128 + 8 * (a1 + a2) * 128 + 8 * a1 * g2
    return p2 + io + ph_a + ph_b + gbs + tabs


def global_bf_supported(plan: Plan1D, config) -> bool:
    if plan.level != Level.GLOBAL:
        return False
    g1p, g2p = plan.sub
    if not bf_factor(g1p.n) or not bf_factor(g2p.n):
        return False
    return bf_est_bytes(plan, 128) <= 2 * config.vmem_bytes


def bf2_est_bytes(plan: Plan1D, t1: int) -> int:
    """VMEM working-set estimate for the bf2 variant: persistent scratch +
    double-buffered io blocks + phase-A SSA temporaries (one big transpose,
    butterfly slabs, Karatsuba splits) + resident tables."""
    g1, g2 = plan.sub[0].n, plan.sub[1].n
    a1 = max(1, g1 // 128)
    n = g1 * g2
    p2 = 8 * n
    io = 2 * (g1 * 2 * t1 * 4) + 2 * (128 * 2 * g1 * 4)
    ph_a = 18 * t1 * g1 * 4
    ph_b = 12 * g1 * 128 * 4 + 8 * 128 * a1 * 128 * 4
    tabs = 12 * 128 * 128 + 8 * (a1 + max(1, g2 // 128)) * 128 + 400_000
    return p2 + io + ph_a + ph_b + tabs


def global_bf2_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
    st3: int = 1, ta: int = 0,
):
    """bf engine, relayout-lean variant (autotuner ``{"eng": 7, "bf2": 1}``).

    Same math and scratch layout as :func:`global_bf_raw_call`; the
    differences are pure data-movement restructurings measured against the
    round-4 engine (see docs/ROUND5.md):

    * phase A transposes the WHOLE (g1, 2t1) input block once and takes the
      butterfly slabs as free 128-lane-block views, instead of A1 separate
      (128, 2t1) transposes through a scratch ref;
    * the streamed (128, g2) GB twiddle table is replaced by the resident
      factored B1/B2 pair (TwiddleBank.bf_lo_factored) — the engine's HBM
      traffic drops from (2 + 2/A1)·8n to 2·8n bytes per transform;
    * with ``st3`` (default), the store side runs ONE (A1·t1, 128) →
      (128, A1, t1) transpose and ONE contiguous scratch store per tile,
      instead of A1 separate (t1, 128) transposes + middle-axis stores;
    * phase B flattens the (128, A1, 128) scratch slab to (g1, 128) BEFORE
      the Karatsuba matmul so the MXU sees one M = g1 contraction rather
      than a batched M = A1 form.

    Reference counterpart (as for bf): the global factor chain,
    /root/reference/src/portfft/dispatcher/global_dispatcher.hpp:312-412.
    """
    prec = _kernel_precision(precision)
    if prec != "x3":
        return None
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    n = plan.n
    a1, a2 = bf_factor(g1), bf_factor(g2)
    if not a1 or not a2:
        return None
    wk = bank_keys.get(("WK", 128, sign))
    u1 = bank_keys.get(("U", a1, 128, sign))
    u2 = bank_keys.get(("U", a2, 128, sign))
    ga = bank_keys.get(("GA", g1, g2, sign))
    if None in (wk, u1, u2, ga):
        return None

    if t1_override and (g2 % t1_override or t1_override % 128):
        t1_override = 0
    t1 = 0
    for cand in ((t1_override,) if t1_override else (256, 128)):
        if (
            cand
            and g2 % cand == 0
            and bank_keys.get(("G2L", g2, cand, sign)) is not None
            and bf2_est_bytes(plan, cand) <= 2 * config.vmem_bytes
        ):
            t1 = cand
            break
    if not t1:
        return None
    lo = bank_keys[("G2L", g2, t1, sign)]
    nA = g2 // t1
    nbits = a2.bit_length() - 1

    x3 = raw.reshape(batch, g1, 2 * g2)
    in_spec = pl.BlockSpec(
        (1, g1, 2 * t1),
        lambda bi, s: (bi, 0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    ga_spec = pl.BlockSpec(
        (a1, t1),
        lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    # factored-GB tables: B1 resident whole (orientation per store path);
    # B2 resident whole (nA, 128) with the per-tile row sliced in-kernel —
    # a (1, 128) BlockSpec would break the TPU sublane block rule
    b2_arrays = [bank[lo + "2r"], bank[lo + "2i"]]
    if st3:
        b1_arrays = [bank[lo + "1r"], bank[lo + "1i"]]
    else:
        b1_arrays = [bank[lo + "1tr"], bank[lo + "1ti"]]
    out_spec = pl.BlockSpec(
        (1, 128, 2 * g1),
        lambda bi, s: (bi, 0, _bitrev(jnp.maximum(s - nA, 0), nbits)),
        memory_space=pltpu.VMEM,
    )

    consts = (
        [bank[wk + str(j)] for j in range(1, 7)]
        + [bank[u1 + "r"], bank[u1 + "i"], bank[u2 + "r"], bank[u2 + "i"]]
        + b1_arrays
        + b2_arrays
    )

    def kern(x_ref, *rest):
        wkt = rest[:6]
        u1r, u1i, u2r, u2i = rest[6:10]
        b1r, b1i, b2r_t, b2i_t = rest[10:14]
        gar, gai = rest[14:16]
        o_ref = rest[16]
        s3, p2r, p2i, s2 = rest[17:21]
        s = pl.program_id(1)
        ti = jnp.minimum(s, nA - 1)
        col = pl.multiple_of(ti * t1, t1)
        b2r = b2r_t[pl.ds(ti, 1), :]  # (1, 128) tile row of B2
        b2i = b2i_t[pl.ds(ti, 1), :]

        @pl.when(s < nA)
        def _phase_a():
            # deinterleave scratch is 3-D (2t1, A1, 128): Mosaic only
            # strided-reads memrefs whose minor dim is exactly 128, so the
            # lane axis g1 is pre-split into (A1, 128).  ``ta`` fills it
            # with ONE whole-block transpose + lane-split value reshape;
            # default is A1 narrow (128, 2t1) transposes (the proven form).
            if ta:
                s3[...] = x_ref[0, :, :].T.reshape(2 * t1, a1, 128)
            else:
                for j in range(a1):
                    s3[:, j, :] = x_ref[0, j * 128 : (j + 1) * 128, :].T
            slabs = [
                (s3[0::2, j, :], s3[1::2, j, :]) for j in range(a1)
            ]
            y = _bf_slabs(slabs, sign)
            tw = [
                xla_fft.complex_mul(
                    yr, yi, u1r[k : k + 1, :], u1i[k : k + 1, :]
                )
                for k, (yr, yi) in enumerate(y)
            ]
            zr, zi = kara_matmul_last(
                jnp.concatenate([t[0] for t in tw], axis=0),
                jnp.concatenate([t[1] for t in tw], axis=0),
                wkt,
            )  # (A1·t1, 128) rows [kA1-block, n2-slice], lanes kB1
            if st3:
                # factored-GB tile twiddle, (1, t1, 128) broadcast
                gwr, gwi = xla_fft.complex_mul(
                    b1r[...], b1i[...], b2r, b2i
                )
                z3r = zr.reshape(a1, t1, 128)
                z3i = zi.reshape(a1, t1, 128)
                z3r, z3i = xla_fft.complex_mul(
                    z3r, z3i, gwr[None, :, :], gwi[None, :, :]
                )
                z3r, z3i = xla_fft.complex_mul(
                    z3r, z3i,
                    gar[...].reshape(a1, t1, 1),
                    gai[...].reshape(a1, t1, 1),
                )
                p2r[:, :, pl.ds(col, t1)] = jnp.transpose(z3r, (2, 0, 1))
                p2i[:, :, pl.ds(col, t1)] = jnp.transpose(z3i, (2, 0, 1))
            else:
                gwr, gwi = xla_fft.complex_mul(
                    b1r[...], b1i[...], b2r.T, b2i.T
                )  # (128, t1)
                for k in range(a1):
                    zs_r = zr[k * t1 : (k + 1) * t1].T  # (128, t1)
                    zs_i = zi[k * t1 : (k + 1) * t1].T
                    zs_r, zs_i = xla_fft.complex_mul(zs_r, zs_i, gwr, gwi)
                    zs_r, zs_i = xla_fft.complex_mul(
                        zs_r, zs_i, gar[k : k + 1, :], gai[k : k + 1, :]
                    )
                    p2r[:, k, pl.ds(col, t1)] = zs_r
                    p2i[:, k, pl.ds(col, t1)] = zs_i
            _pf.dump("global_bf2.p1", zr)

        @pl.when(s == nA)
        def _slab_dft():
            _dif_slab_layers(p2r, p2i, a2, sign)

        @pl.when(s >= nA)
        def _phase_b():
            j2 = jnp.maximum(s - nA, 0)
            ka2 = _bitrev(j2, nbits)
            # flatten the slab to (g1, 128) rows k1 = A1·kB1 + kA1 BEFORE
            # the matmul — one M = g1 contraction instead of batched M = A1
            br = p2r[:, :, pl.ds(j2 * 128, 128)].reshape(g1, 128)
            bi_ = p2i[:, :, pl.ds(j2 * 128, 128)].reshape(g1, 128)
            t2r = u2r[pl.ds(ka2, 1), :]  # (1, 128) digit twiddle row
            t2i = u2i[pl.ds(ka2, 1), :]
            br, bi_ = xla_fft.complex_mul(br, bi_, t2r, t2i)
            cr, ci = kara_matmul_last(br, bi_, wkt)  # (g1, 128) lanes kB2
            if scale != 1.0:
                cr = cr * scale
                ci = ci * scale
            s2[0::2, :] = cr
            s2[1::2, :] = ci
            o_ref[0, :, :] = s2[...].T
            _pf.dump("global_bf2.p2", cr)

    out = pl.pallas_call(
        kern,
        grid=(batch, nA + a2),
        in_specs=[in_spec]
        + [
            pl.BlockSpec(
                t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
            )
            for t in consts
        ]
        + [ga_spec, ga_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 128, a2 * 2 * g1), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * t1, a1, 128), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((2 * g1, 128), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * 256,
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, *consts, bank[ga + "r"], bank[ga + "i"])
    return out.reshape(raw.shape[0])


def bf_ov_est_bytes(plan: Plan1D, t1: int) -> int:
    """VMEM estimate for the overlay variant: bf working set + the second
    (parity-dual) persistent scratch."""
    return bf_est_bytes(plan, t1) + 8 * plan.n


def global_bf_ov_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
):
    """Phase-OVERLAY bf engine (autotuner ``{"eng": 7, "ov": 1}``).

    Same math, tables and layouts as :func:`global_bf_raw_call`; the
    grid is restructured so phase A of batch ``i`` and phase B of batch
    ``i-1`` run in the SAME grid step over parity-dual persistent
    scratch.  Why: the round-5 attribution probe (scripts/probe_attr.py)
    showed the round-4 engine runs at movement + exposed-compute, not
    max(movement, compute) — per batch, the input block lands in the
    phase-A steps and the output blocks leave in the phase-B steps, so
    the heavy phase-A compute window has no DMA of its own to hide and
    every batch boundary stalls on a ~1 MB fetch behind a ~1.5 µs
    compute window.  Overlaying the phases gives every grid step one
    input tile, one output block, and comparable compute; measured
    15.7 → 12.9 ms at n=2^17 (scripts/probe_ov.py, docs/ROUND5.md).

    grid (batch+1, max(nA, a2)); the slab DFT folds into phase-B's first
    substep.  Costs one extra 8n-byte scratch, so the largest ladder
    shapes may decline (runtime fallback to the base bf engine).

    Reference counterpart (as for bf): the global factor chain,
    /root/reference/src/portfft/dispatcher/global_dispatcher.hpp:312-412.
    """
    prec = _kernel_precision(precision)
    if prec != "x3":
        return None
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    n = plan.n
    a1, a2 = bf_factor(g1), bf_factor(g2)
    if not a1 or not a2:
        return None
    wk = bank_keys.get(("WK", 128, sign))
    u1 = bank_keys.get(("U", a1, 128, sign))
    u2 = bank_keys.get(("U", a2, 128, sign))
    ga = bank_keys.get(("GA", g1, g2, sign))
    gb = bank_keys.get(("GB", g1, g2, sign))
    if None in (wk, u1, u2, ga, gb):
        return None

    if t1_override and (g2 % t1_override or t1_override % 128):
        t1_override = 0
    t1 = t1_override or 0
    if not t1:
        for cand in (256, 128):
            if g2 % cand == 0 and bf_ov_est_bytes(plan, cand) <= 2 * config.vmem_bytes:
                t1 = cand
                break
    if not t1 or bf_ov_est_bytes(plan, t1) > 2 * config.vmem_bytes:
        return None
    nA = g2 // t1
    S = max(nA, a2)
    nbits = a2.bit_length() - 1

    x3 = raw.reshape(batch, g1, 2 * g2)
    in_spec = pl.BlockSpec(
        (1, g1, 2 * t1),
        lambda bi, s: (
            jnp.minimum(bi, batch - 1),
            0,
            jnp.where(bi < batch, jnp.minimum(s, nA - 1), nA - 1),
        ),
        memory_space=pltpu.VMEM,
    )
    gb_spec = pl.BlockSpec(
        (128, t1), lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    ga_spec = pl.BlockSpec(
        (a1, t1), lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 128, 2 * g1),
        lambda bi, s: (
            jnp.maximum(bi, 1) - 1,
            0,
            _bitrev(jnp.minimum(s, a2 - 1), nbits),
        ),
        memory_space=pltpu.VMEM,
    )
    consts = [
        bank[wk + str(j)] for j in range(1, 7)
    ] + [bank[u1 + "r"], bank[u1 + "i"], bank[u2 + "r"], bank[u2 + "i"]]
    gb_arrays = [bank[ga + "r"], bank[ga + "i"],
                 bank[gb + "r"], bank[gb + "i"]]

    def kern(x_ref, *rest):
        wkt = rest[:6]
        u1r, u1i, u2r, u2i = rest[6:10]
        gar, gai, gbr, gbi = rest[10:14]
        o_ref = rest[14]
        s3, p2r0, p2i0, p2r1, p2i1, s2 = rest[15:21]
        bi = pl.program_id(0)
        s = pl.program_id(1)
        par = bi % 2
        col = pl.multiple_of(jnp.minimum(s, nA - 1) * t1, t1)

        def phase_a(p2r, p2i):
            slabs = []
            for j in range(a1):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[0, sl, :].T
                slabs.append((s3[0::2, :], s3[1::2, :]))
            y = _bf_slabs(slabs, sign)
            tw = [
                xla_fft.complex_mul(
                    yr, yi, u1r[k : k + 1, :], u1i[k : k + 1, :]
                )
                for k, (yr, yi) in enumerate(y)
            ]
            zr, zi = kara_matmul_last(
                jnp.concatenate([t[0] for t in tw], axis=0),
                jnp.concatenate([t[1] for t in tw], axis=0),
                wkt,
            )
            gbr_, gbi_ = gbr[...], gbi[...]
            for k in range(a1):
                zs_r = zr[k * t1 : (k + 1) * t1].T
                zs_i = zi[k * t1 : (k + 1) * t1].T
                zs_r, zs_i = xla_fft.complex_mul(zs_r, zs_i, gbr_, gbi_)
                zs_r, zs_i = xla_fft.complex_mul(
                    zs_r, zs_i, gar[k : k + 1, :], gai[k : k + 1, :]
                )
                p2r[:, k, pl.ds(col, t1)] = zs_r
                p2i[:, k, pl.ds(col, t1)] = zs_i
            _pf.dump("global_bf_ov.p1", zr)

        def phase_b(p2r, p2i):
            @pl.when(s == 0)
            def _():
                _dif_slab_layers(p2r, p2i, a2, sign)

            j2 = jnp.minimum(s, a2 - 1)
            ka2 = _bitrev(j2, nbits)
            br = p2r[:, :, pl.ds(j2 * 128, 128)]
            bi_ = p2i[:, :, pl.ds(j2 * 128, 128)]
            t2r = u2r[pl.ds(ka2, 1), :].reshape(1, 1, 128)
            t2i = u2i[pl.ds(ka2, 1), :].reshape(1, 1, 128)
            br, bi_ = xla_fft.complex_mul(br, bi_, t2r, t2i)
            cr, ci = kara_matmul_last(br, bi_, wkt)
            cr = cr.reshape(g1, 128)
            ci = ci.reshape(g1, 128)
            if scale != 1.0:
                cr = cr * scale
                ci = ci * scale
            s2[0::2, :] = cr
            s2[1::2, :] = ci
            o_ref[0, :, :] = s2[...].T
            _pf.dump("global_bf_ov.p2", cr)

        @pl.when((bi < batch) & (s < nA) & (par == 0))
        def _a0():
            phase_a(p2r0, p2i0)

        @pl.when((bi < batch) & (s < nA) & (par == 1))
        def _a1():
            phase_a(p2r1, p2i1)

        @pl.when((bi >= 1) & (s < a2) & (par == 1))
        def _b0():
            phase_b(p2r0, p2i0)

        @pl.when((bi >= 1) & (s < a2) & (par == 0))
        def _b1():
            phase_b(p2r1, p2i1)

    out = pl.pallas_call(
        kern,
        grid=(batch + 1, S),
        in_specs=[in_spec]
        + [
            pl.BlockSpec(
                t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
            )
            for t in consts
        ]
        + [ga_spec, ga_spec, gb_spec, gb_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 128, a2 * 2 * g1), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * t1, 128), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((2 * g1, 128), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * 256,
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, *consts, *gb_arrays)
    return out.reshape(raw.shape[0])


def global_bf_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
):
    """PACKED interleaved raw (2·batch·n,) -> transformed raw, one fused
    butterfly-factored kernel (see module docstring).  Returns None when
    the required bf tables are not banked or no tiling fits."""
    prec = _kernel_precision(precision)
    if prec != "x3":
        return None
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    n = plan.n
    a1, a2 = bf_factor(g1), bf_factor(g2)
    if not a1 or not a2:
        return None
    wk = bank_keys.get(("WK", 128, sign))
    u1 = bank_keys.get(("U", a1, 128, sign))
    u2 = bank_keys.get(("U", a2, 128, sign))
    ga = bank_keys.get(("GA", g1, g2, sign))
    gb = bank_keys.get(("GB", g1, g2, sign))
    if None in (wk, u1, u2, ga, gb):
        return None

    if t1_override and (g2 % t1_override or t1_override % 128):
        t1_override = 0
    t1 = t1_override or 0
    if not t1:
        for cand in (256, 128):
            if g2 % cand == 0 and bf_est_bytes(plan, cand) <= 2 * config.vmem_bytes:
                t1 = cand
                break
    if not t1 or bf_est_bytes(plan, t1) > 2 * config.vmem_bytes:
        return None
    nA = g2 // t1
    nbits = a2.bit_length() - 1

    x3 = raw.reshape(batch, g1, 2 * g2)
    in_spec = pl.BlockSpec(
        (1, g1, 2 * t1),
        lambda bi, s: (bi, 0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    gb_spec = pl.BlockSpec(
        (128, t1),
        lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    ga_spec = pl.BlockSpec(
        (a1, t1),
        lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    # out viewed (batch, kB2:128, A2·2·g1): row-major flat index is
    # 2·(k1 + g1·(kA2 + A2·kB2)) + p — natural.  The substep for frequency
    # digit kA2 reads scratch slab bitrev(kA2) (where the DIF left it) and
    # writes block column kA2 (block units of 2·g1) via the index map;
    # Mosaic needs the trailing block dims (128, 2·g1) ≡ (array, ÷128).
    out_spec = pl.BlockSpec(
        (1, 128, 2 * g1),
        lambda bi, s: (bi, 0, _bitrev(jnp.maximum(s - nA, 0), nbits)),
        memory_space=pltpu.VMEM,
    )

    consts = [
        bank[wk + str(j)] for j in range(1, 7)
    ] + [bank[u1 + "r"], bank[u1 + "i"], bank[u2 + "r"], bank[u2 + "i"]]
    gb_arrays = [bank[ga + "r"], bank[ga + "i"],
                 bank[gb + "r"], bank[gb + "i"]]

    def kern(x_ref, *rest):
        wkt = rest[:6]
        u1r, u1i, u2r, u2i = rest[6:10]
        gar, gai, gbr, gbi = rest[10:14]
        o_ref = rest[14]
        s3, p2r, p2i, s2 = rest[15:19]
        s = pl.program_id(1)
        col = pl.multiple_of(jnp.minimum(s, nA - 1) * t1, t1)

        @pl.when(s < nA)
        def _phase_a():
            # deinterleave the (g1, 2·t1) input block into A1 slabs of
            # (t1, 128) = [n2-slice, iB1]
            slabs = []
            for j in range(a1):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[0, sl, :].T  # (2t1, 128)
                slabs.append((s3[0::2, :], s3[1::2, :]))
            y = _bf_slabs(slabs, sign)
            # digit twiddle ω_g1^{kA1·iB1}, then ONE stacked Karatsuba
            # matmul against W128 over iB1 -> kB1
            tw = [
                xla_fft.complex_mul(
                    yr, yi, u1r[k : k + 1, :], u1i[k : k + 1, :]
                )
                for k, (yr, yi) in enumerate(y)
            ]
            zr, zi = kara_matmul_last(
                jnp.concatenate([t[0] for t in tw], axis=0),
                jnp.concatenate([t[1] for t in tw], axis=0),
                wkt,
            )  # (A1·t1, 128) rows [kA1-block, n2-slice], lanes kB1
            gbr_, gbi_ = gbr[...], gbi[...]  # (128, t1) [kB1, n2-slice]
            for k in range(a1):
                zs_r = zr[k * t1 : (k + 1) * t1].T  # (128, t1) [kB1, n2]
                zs_i = zi[k * t1 : (k + 1) * t1].T
                # inter-factor twiddle W_n^{k1·n2} factored along the
                # digits: streamed ω_{n/A1}^{kB1·n2} block × resident
                # ω_n^{kA1·n2} row
                zs_r, zs_i = xla_fft.complex_mul(zs_r, zs_i, gbr_, gbi_)
                zs_r, zs_i = xla_fft.complex_mul(
                    zs_r, zs_i, gar[k : k + 1, :], gai[k : k + 1, :]
                )
                p2r[:, k, pl.ds(col, t1)] = zs_r
                p2i[:, k, pl.ds(col, t1)] = zs_i
            _pf.dump("global_bf.p1", zr)

        @pl.when(s == nA)
        def _slab_dft():
            # DFT over the A2 lane-slab digit of n2, in place on the
            # scratch (bit-reversed slab positions — free index mapping)
            _dif_slab_layers(p2r, p2i, a2, sign)

        @pl.when(s >= nA)
        def _phase_b():
            j2 = jnp.maximum(s - nA, 0)          # physical slab position
            ka2 = _bitrev(j2, nbits)             # frequency digit kA2
            br = p2r[:, :, pl.ds(j2 * 128, 128)]  # (128, A1, 128)
            bi_ = p2i[:, :, pl.ds(j2 * 128, 128)]  # [kB1, kA1, iB2]
            # digit twiddle ω_g2^{kA2·iB2} (dynamic row of the U2 table)
            t2r = u2r[pl.ds(ka2, 1), :].reshape(1, 1, 128)
            t2i = u2i[pl.ds(ka2, 1), :].reshape(1, 1, 128)
            br, bi_ = xla_fft.complex_mul(br, bi_, t2r, t2i)
            cr, ci = kara_matmul_last(br, bi_, wkt)  # [kB1, kA1, kB2]
            cr = cr.reshape(g1, 128)  # rows k1 = A1·kB1 + kA1 — natural
            ci = ci.reshape(g1, 128)
            if scale != 1.0:
                cr = cr * scale
                ci = ci * scale
            s2[0::2, :] = cr
            s2[1::2, :] = ci
            o_ref[0, :, :] = s2[...].T  # (128, 2·g1) = [kB2, 2k1+p]
            _pf.dump("global_bf.p2", cr)

    out = pl.pallas_call(
        kern,
        grid=(batch, nA + a2),
        in_specs=[in_spec]
        + [
            pl.BlockSpec(
                t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
            )
            for t in consts
        ]
        + [ga_spec, ga_spec, gb_spec, gb_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 128, a2 * 2 * g1), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * t1, 128), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((128, a1, g2), raw.dtype),
            pltpu.VMEM((2 * g1, 128), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * 256,
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, *consts, *gb_arrays)
    return out.reshape(raw.shape[0])
