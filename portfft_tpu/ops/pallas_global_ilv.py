"""Interleaved-native single-sweep GLOBAL engine (autotuner ``{"eng": 8}``).

Why it exists: round-5 measurement showed the butterfly-factored eng-7
delivering 160-195 GB/s device on the 2^17-2^20 ladder against eng-6's
271 GB/s pure-data-movement rate, and the bf2 relayout experiments
(pallas_global_bf.global_bf2_raw_call) proved the residual gap is NOT the
streamed twiddle table or the store pattern: it is the deinterleave /
interleave RELAYOUT itself — every (re, im) separation costs a pass
through the transpose unit, and eng-7 pays it on the way in (A1 narrow
transposes per tile), between phases (A1 store transposes) and on the way
out (the s2 interleave + transpose).

This engine never separates re from im.  Data stays in the raw
interleaved lane order end-to-end; complex arithmetic runs directly on
(re, im) lane pairs:

* elementwise twiddle: ``t·x = D⊙x + C⊙sps(x)`` where ``sps`` is
  multiply-by-i (one lane pair-swap with even-lane negation — two
  ``pltpu.roll`` + select, pure VPU) and D/C are pair-duplicated re/im
  tables (TwiddleBank.ilv_dup_cross);
* butterfly radix stages: slab adds plus ``_cmul_const_ilv`` (exact
  shortcuts for ±1 / ±i);
* phase-A slab DFT (contraction over the sublane axis, which is NOT
  interleaved): ONE stacked left matmul against the (256, 384) ILL table
  — interleaved columns pass through the contraction untouched; output
  rows [A; B] recombine as ``z = A + sps(B)``;
* phase-B slab DFT (contraction over the interleaved lane axis): ONE
  stacked right matmul against the (768, 256) ILR table whose rows carry
  the interleaved structure and whose output columns are SEPARATED
  [yr | yi] — feeding the same single interleave-store + transpose
  epilogue eng-7 uses (the one relayout this engine keeps).

Per-point relayout cost drops from ~3 transpose passes to 1; MXU work is
the x3-stacked 12·128 real MAC/point of the kstack forms (1.33× eng-7's
Karatsuba 9·128, which probe_overlap showed is not the binding cost).

The digit-order bookkeeping (σ-absorbing scratch layout, bit-reversed
slab positions, 3-D output view) is identical to eng-7 — see
ops/pallas_global_bf.py's module docstring.

Reference counterpart being replaced: the multi-kernel factor chain of
the global engine (/root/reference/src/portfft/dispatcher/
global_dispatcher.hpp:312-412).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..planner import Plan1D
from . import pallas_fft as _pf
from .pallas_fft import _kernel_precision, _mm_f32
from .pallas_global_bf import _snap
from ..enums import Level


def _sps(v):
    """Multiply-by-i on an interleaved minor axis: lane pairs (r, i) ->
    (-i, r).  Two circular shifts + a parity select — pure VPU."""
    ax = v.ndim - 1
    # pltpu.roll requires non-negative shifts: size-1 ≡ -1 circularly
    left = pltpu.roll(v, v.shape[ax] - 1, axis=ax)   # out[c] = v[c+1]
    right = pltpu.roll(v, 1, axis=ax)                # out[c] = v[c-1]
    par = jax.lax.broadcasted_iota(jnp.int32, v.shape, ax) % 2
    return jnp.where(par == 0, -left, right)


def _cmul_const_ilv(x, wr: float, wi: float):
    """(wr + i·wi)·x on interleaved lanes, exact shortcuts for ±1/±i."""
    if wi == 0.0:
        if wr == 1.0:
            return x
        if wr == -1.0:
            return -x
        return x * wr
    if wr == 0.0:
        s = _sps(x)
        if wi == 1.0:
            return s
        if wi == -1.0:
            return -s
        return s * wi
    return x * wr + _sps(x) * wi


def ilv_factor(g: int) -> int:
    """Slab-butterfly factor A for g = A·128: any A = 2^a·3^b in [1, 16]
    (mixed radix — unlike eng-7's power-of-two bf_factor, so 3·2^k and
    9·2^k sub-lengths like 384 and 1152 qualify), else 0."""
    if g % 128:
        return 0
    a = g // 128
    if a < 1 or a > 16:
        return 0
    r = a
    while r % 2 == 0:
        r //= 2
    while r % 3 == 0:
        r //= 3
    return a if r == 1 else 0


def _radices(a: int) -> list:
    """Mixed-radix factor sequence of a (2s first, then 3s)."""
    out = []
    while a % 2 == 0:
        out.append(2)
        a //= 2
    while a % 3 == 0:
        out.append(3)
        a //= 3
    return out


def dif_perm(a: int) -> list:
    """order[p] = frequency digit held at physical slab position p after
    the in-place mixed-radix DIF of :func:`_dif_slab_layers_ilv` (the
    generalized digit reversal; equals bit reversal for a = 2^k)."""
    rads = _radices(a)

    def rec(m, rs):
        if m == 1:
            return [0]
        r = rs[0]
        sub = rec(m // r, rs[1:])
        out = []
        for t in range(r):
            out += [r * k + t for k in sub]
        return out

    return rec(a, rads)


def digit_rev_traced(p, a: int):
    """Traced arithmetic form of :func:`dif_perm`: frequency digit k for
    physical position p (index maps must not capture constant arrays)."""
    rads = _radices(a)
    ts = []
    m = a
    rem = p
    for r in rads:
        m //= r
        ts.append((rem // m, r))
        rem = rem - (rem // m) * m
    k = p - p  # 0 of p's dtype
    for t, r in reversed(ts):
        k = k * r + t
    return k


def _bf_slabs_ilv(slabs: list, sign: int) -> list:
    """Mixed-radix DIT butterfly over interleaved slabs (single tensors):
    input slab index = HIGH input digit iA, output = LOW frequency digit
    kA, natural order (radix-2/3 recursion; generalizes
    pallas_global_bf._bf_slabs)."""
    a = len(slabs)
    if a == 1:
        return slabs
    r = 2 if a % 2 == 0 else 3
    m = a // r
    sub = [_bf_slabs_ilv(slabs[i::r], sign) for i in range(r)]
    out = [None] * a
    for q in range(m):
        parts = [sub[0][q]]
        for i in range(1, r):
            ang = sign * 2.0 * math.pi * i * q / a
            parts.append(
                _cmul_const_ilv(
                    sub[i][q], _snap(math.cos(ang)), _snap(math.sin(ang))
                )
            )
        for t in range(r):
            acc = parts[0]
            for i in range(1, r):
                ang = sign * 2.0 * math.pi * i * t / r
                acc = acc + _cmul_const_ilv(
                    parts[i], _snap(math.cos(ang)), _snap(math.sin(ang))
                )
            out[q + t * m] = acc
    return out


def _dif_slab_layers_ilv(p2, a: int, sign: int) -> None:
    """In-place mixed-radix DIF over the ``a`` 256-float lane slabs of
    the interleaved (128, A1, 2·g2) scratch ref.  Output slab positions
    hold frequency digits in :func:`dif_perm` order (= bit reversal when
    a is a power of two)."""
    span = a
    for r in _radices(a):
        m = span // r
        for b0 in range(0, a, span):
            for j in range(m):
                sls = [
                    slice((b0 + j + i * m) * 256, (b0 + j + i * m + 1) * 256)
                    for i in range(r)
                ]
                us = [p2[:, :, s] for s in sls]
                for t in range(r):
                    acc = us[0]
                    for i in range(1, r):
                        ang = sign * 2.0 * math.pi * i * t / r
                        acc = acc + _cmul_const_ilv(
                            us[i], _snap(math.cos(ang)), _snap(math.sin(ang))
                        )
                    if t:
                        ang = sign * 2.0 * math.pi * j * t / span
                        acc = _cmul_const_ilv(
                            acc, _snap(math.cos(ang)), _snap(math.sin(ang))
                        )
                    p2[:, :, sls[t]] = acc
        span = m


def ilv_est_bytes(plan: Plan1D, t1: int) -> int:
    """VMEM working-set estimate: persistent interleaved scratch +
    double-buffered io blocks + phase SSA temporaries + resident tables."""
    g1, g2 = plan.sub[0].n, plan.sub[1].n
    a1 = max(1, g1 // 128)
    n = g1 * g2
    p2 = 8 * n
    io = 2 * (g1 * 2 * t1 * 4) + 2 * (128 * 2 * g1 * 4)
    ph_a = 16 * a1 * t1 * 128 * 4 + 2 * (384 * a1 * 2 * t1 * 2)
    ph_b = 16 * g1 * 128 * 4 + 2 * (g1 * 768 * 2)
    gbs = 2 * 2 * 128 * 2 * t1 * 4
    tabs = (256 * 384 + 768 * 256) * 2 + 8 * (a1 * g2 * 2) + 300_000
    return p2 + io + ph_a + ph_b + gbs + tabs


def global_ilv_supported(plan: Plan1D, config) -> bool:
    if plan.level != Level.GLOBAL:
        return False
    g1p, g2p = plan.sub
    if not ilv_factor(g1p.n) or not ilv_factor(g2p.n):
        return False
    return ilv_est_bytes(plan, 128) <= 2 * config.vmem_bytes


def global_ilv_raw_call(
    raw, batch, plan: Plan1D, sign: int, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
):
    """PACKED interleaved raw (2·batch·n,) -> transformed raw, one fused
    interleaved-native kernel (module docstring).  Returns None when the
    required tables are not banked or no tiling fits."""
    prec = _kernel_precision(precision)
    if prec != "x3":
        return None
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    n = plan.n
    a1, a2 = ilv_factor(g1), ilv_factor(g2)
    if not a1 or not a2:
        return None
    ill = bank_keys.get(("ILL", sign))
    ilr = bank_keys.get(("ILR", sign))
    u1t = bank_keys.get(("UT", a1, 128, sign))
    u2i = bank_keys.get(("UI", a2, 128, sign))
    gai = bank_keys.get(("GAI", g1, g2, sign))
    gbi = bank_keys.get(("GBI", g1, g2, sign))
    if None in (ill, ilr, u1t, u2i, gai, gbi):
        return None

    if t1_override and (g2 % t1_override or t1_override % 128):
        t1_override = 0
    t1 = t1_override or 0
    if not t1:
        for cand in (256, 128):
            if g2 % cand == 0 and ilv_est_bytes(plan, cand) <= 2 * config.vmem_bytes:
                t1 = cand
                break
    if not t1 or ilv_est_bytes(plan, t1) > 2 * config.vmem_bytes:
        return None
    nA = g2 // t1


    x3 = raw.reshape(batch, g1, 2 * g2)
    in_spec = pl.BlockSpec(
        (1, g1, 2 * t1),
        lambda bi, s: (bi, 0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    gb_spec = pl.BlockSpec(
        (128, 2 * t1),
        lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    ga_spec = pl.BlockSpec(
        (a1, 2 * t1),
        lambda bi, s: (0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 128, 2 * g1),
        lambda bi, s: (bi, 0, digit_rev_traced(jnp.maximum(s - nA, 0), a2)),
        memory_space=pltpu.VMEM,
    )

    consts = [
        bank[ill + "k"], bank[ilr + "k"],
        bank[u1t + "r"], bank[u1t + "i"],
        bank[u2i + "d"], bank[u2i + "c"],
    ]
    tw_arrays = [
        bank[gai + "d"], bank[gai + "c"],
        bank[gbi + "d"], bank[gbi + "c"],
    ]

    def kern(x_ref, *rest):
        ill_t, ilr_t, u1r, u1i, u2d, u2c = rest[:6]
        gad, gac, gbd, gbc = rest[6:10]
        o_ref = rest[10]
        p2, s2 = rest[11:13]
        s = pl.program_id(1)
        col = pl.multiple_of(jnp.minimum(s, nA - 1) * 2 * t1, 2 * t1)

        @pl.when(s < nA)
        def _phase_a():
            blk = x_ref[0]  # (g1, 2·t1) interleaved
            slabs = [blk[j * 128 : (j + 1) * 128, :] for j in range(a1)]
            y = _bf_slabs_ilv(slabs, sign)
            # digit twiddle ω_g1^{kA1·iB1} as per-slab column broadcasts
            tw = [
                u1r[:, k : k + 1] * yk + u1i[:, k : k + 1] * _sps(yk)
                for k, yk in enumerate(y)
            ]
            zc = jnp.concatenate(tw, axis=1)  # (128, A1·2t1)
            zh = zc.astype(jnp.bfloat16)
            zl = (zc - zh.astype(jnp.float32)).astype(jnp.bfloat16)
            st = jnp.concatenate([zh, zl, zh], axis=0)  # (384, A1·2t1)
            ab = _mm_f32(ill_t[...], st)  # (256, A1·2t1) rows [A; B]
            # recombine in the 3-D view: _sps at >= 2048 flat lanes sends
            # Mosaic into a pathological compile (verify skill notes)
            z3 = ab[:128].reshape(128, a1, 2 * t1) + _sps(
                ab[128:].reshape(128, a1, 2 * t1)
            )
            # inter-factor twiddle W_n^{k1·n2}, factored along the digits
            z3 = gbd[...][:, None, :] * z3 + gbc[...][:, None, :] * _sps(z3)
            z3 = gad[...][None, :, :] * z3 + gac[...][None, :, :] * _sps(z3)
            p2[:, :, pl.ds(col, 2 * t1)] = z3
            _pf.dump("global_ilv.p1", z3)

        @pl.when(s == nA)
        def _slab_dft():
            _dif_slab_layers_ilv(p2, a2, sign)

        @pl.when(s >= nA)
        def _phase_b():
            j2 = jnp.maximum(s - nA, 0)          # physical slab position
            ka2 = digit_rev_traced(j2, a2)       # frequency digit kA2
            b3 = p2[:, :, pl.ds(j2 * 256, 256)]  # (128, A1, 256)
            d = u2d[pl.ds(ka2, 1), :].reshape(1, 1, 256)
            c = u2c[pl.ds(ka2, 1), :].reshape(1, 1, 256)
            b3 = d * b3 + c * _sps(b3)
            bm = b3.reshape(g1, 256)
            bh = bm.astype(jnp.bfloat16)
            bl = (bm - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            x6 = jnp.concatenate([bh, bl, bh], axis=1)  # (g1, 768)
            y = _mm_f32(x6, ilr_t[...])  # (g1, 256) cols [yr | yi]
            if scale != 1.0:
                y = y * scale
            s2[0::2, :] = y[:, :128]
            s2[1::2, :] = y[:, 128:]
            o_ref[0, :, :] = s2[...].T  # (128, 2·g1) = [kB2, 2k1+p]
            _pf.dump("global_ilv.p2", y)

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
            pltpu.VMEM((128, a1, 2 * g2), raw.dtype),
            pltpu.VMEM((2 * g1, 128), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * batch * n * 128 * 2,
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, *consts, *tw_arrays)
    return out.reshape(raw.shape[0])
