"""Raw-I/O multi-dimensional pipeline: one Pallas pass per axis.

The reference handles multi-dim by running the contiguous axis as one
batched kernel and launching per-slice kernels on BATCH_INTERLEAVED views
for every outer axis (committed_descriptor_impl.hpp:899-950).  The TPU raw
pipeline instead keeps the buffer PACKED interleaved end to end:

* last axis — the existing 1D raw kernels (``direct_raw_call`` /
  ``fused2_raw_v2_call``) with batch = B·prod(lengths[:-1]);
* every other axis — the column kernel here: the transform runs over the
  SUBLANE dimension via left matmuls with the re/im lane pairs untouched
  (the pairswap trick), so there is
  no de/interleave and, unlike the lane-major case, no digit-reversal
  restack: sublane digit merges are plain leading-dim reshapes.

Column data flow for a fused axis L = a·128 on a (L, ct) interleaved tile
(ct = lane tile of 2·prod(trailing lengths)):

    x   (L, ct) -> (a, 128·ct)            row n = n1a·128 + n1b
    A   = W_a ⊛ x                          left interleaved matmul (MXU)
    A  *= T[k1a, n1b]                      pairswap complex mul (VPU)
    B   (128, a·ct)                        (1,0,2) permute + leading merge
    C   = W_128 ⊛ B                        rows come out k2-natural
    out (128·a, ct) = C                    row k2·a + k1a = k1a + a·k2 ✓

Each element is read from HBM once and written once per axis — a 2D
transform is exactly two HBM round trips (the previous plane path paid
separate de/interleave passes on top: 12-18 GB/s at 1024²; this pipeline
removes them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Level
from ..planner import Plan1D
from .pallas_fft import (
    _const_spec, _interpret_mode, _kernel_precision, _mm, ds_params,
)


def _pairswap_last(u):
    """Swap adjacent lane pairs (re↔im) along the last axis."""
    axis = u.ndim - 1
    minus = pltpu.roll(u, u.shape[axis] - 1, axis)  # roll by -1
    plus = pltpu.roll(u, 1, axis)
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, axis)
    return jnp.where(lane % 2 == 0, minus, plus)


def _cmm_left_raw(wr, wi, u, prec):
    """Left complex matmul on lane-interleaved data:
    y = W_re @ u + salt ⊙ (W_im @ pairswap(u)), salt[2k]=-1, [2k+1]=+1."""
    e1 = _mm(wr, u, prec)
    e2 = _mm(wi, _pairswap_last(u), prec)
    lane = jax.lax.broadcasted_iota(jnp.int32, e1.shape, e1.ndim - 1)
    return jnp.where(lane % 2 == 0, e1 - e2, e1 + e2)


def _ctw_raw(u, tr, ti):
    """Elementwise complex multiply of lane-interleaved ``u`` by a twiddle
    given as broadcastable re/im planes (one value per re/im lane pair)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, u.ndim - 1)
    e2 = ti * _pairswap_last(u)
    return jnp.where(lane % 2 == 0, tr * u - e2, tr * u + e2)


def col_axis_supported(plan: Plan1D, max_direct: int = 512) -> bool:
    """Column-kernel capability: DIRECT any size ≤ max_direct, or the
    Mosaic-native FUSED shape [a, 128] with a | 128."""
    if plan.level == Level.DIRECT:
        return plan.n <= max_direct
    return (
        plan.level == Level.FUSED
        and len(plan.factors) == 2
        and plan.factors[1] == 128
        and 128 % plan.factors[0] == 0
    )


def col_table_names(plan: Plan1D, sign: int, bank) -> list[str]:
    """Register (idempotently) and return the bank names the column kernel
    needs for this axis plan."""
    if plan.level == Level.DIRECT:
        w = bank.dft(plan.n, sign)
        return [w + "r", w + "i"]
    a = plan.factors[0]
    wa = bank.dft(a, sign)
    u = bank.twiddle_fm(a, 128, sign)
    wb = bank.dft(128, sign)
    return [wa + "r", wa + "i", u + "r", u + "i", wb + "r", wb + "i"]


def _col_direct_kernel(prec, scale):
    def kernel(x_ref, wr, wi, o_ref):
        y = _cmm_left_raw(wr[...], wi[...], x_ref[0], prec)
        if scale != 1.0:
            y = y * scale
        o_ref[0] = y

    return kernel


def _col_fused_kernel(a: int, prec, scale):
    def kernel(x_ref, war, wai, ur, ui, wbr, wbi, o_ref):
        x = x_ref[0]  # (L, ct), L = a·128, rows n = n1a·128 + n1b
        ct = x.shape[1]
        x2 = x.reshape(a, 128, ct).reshape(a, 128 * ct)
        # stage A: contract the a-digit
        ar = _cmm_left_raw(war[...], wai[...], x2, prec)
        # inter-factor twiddle W_L^{k1a·n1b}, tables (a, 128) -> (a, 128, 1)
        a3 = ar.reshape(a, 128, ct)
        a3 = _ctw_raw(
            a3, ur[...].reshape(a, 128, 1), ui[...].reshape(a, 128, 1)
        )
        # stage B: contract the 128-digit; result rows are k2-natural
        b2 = jnp.transpose(a3, (1, 0, 2)).reshape(128, a * ct)
        c = _cmm_left_raw(wbr[...], wbi[...], b2, prec)
        if scale != 1.0:
            c = c * scale
        # rows (128_k2, a_k1a) merge to k2·a + k1a = the natural axis index
        o_ref[0] = c.reshape(128, a, ct).reshape(128 * a, ct)

    return kernel


def _ct_bytes(L: int, ct: int, fused: bool) -> int:
    """VMEM working-set estimate for one (L, ct) column tile."""
    return (10 if fused else 6) * L * ct * 4


def _pick_ct(rest2: int, L: int, fused: bool, vmem: int) -> int:
    """Lane tile over the trailing (interleaved) extent: a 128-multiple
    dividing rest2, or rest2 itself (full-dim blocks are always legal)."""
    for ct in (2048, 1024, 512, 384, 256, 128):
        if rest2 % ct == 0 and _ct_bytes(L, ct, fused) <= vmem:
            return ct
    if _ct_bytes(L, rest2, fused) <= vmem:
        return rest2
    return 0


def col_mm_table_names(plan: Plan1D, sign: int, bank) -> list[str] | None:
    """Register (idempotently) and return the widened-matmul table set for
    the mm column kernel, or None when the plan has no mm shape (odd
    DIRECT sizes, fp64 banks)."""
    import numpy as np

    if bank.dtype != np.float32:
        return None
    if plan.level == Level.DIRECT:
        if plan.n % 128:
            return None
        wk = bank.mat_kara(bank.dft(plan.n, sign))
        return [wk + str(j) for j in range(1, 7)]
    a = plan.factors[0]
    g = 128 // a
    ks = bank.dft_kstack(a, sign)
    u = bank.twiddle_fm(a, 128, sign)
    pk = bank.mat_kara(bank.dft_permuted(128, sign, g))
    return [ks + "k", u + "r", u + "i"] + [pk + str(j) for j in range(1, 7)]


def _col_mm_est_bytes(plan: Plan1D, tc: int) -> int:
    from .pallas_global import pass_est_bytes

    return pass_est_bytes(plan, plan.n, tc)


def col_raw_mm_call(
    raw, bpre: int, plan: Plan1D, rest2: int, sign: int, names: list[str],
    bank, config, precision=None, scale: float = 1.0,
    ct_override: int = 0, ds: bool = False,
):
    """Widened-matmul column variant (autotuner ``{"cm": 1}``): instead of
    the pairswap/roll interleaved matmuls, each (L, 2·tc) tile is
    deinterleaved into planes through the scratch transposes proven by the
    GLOBAL raw engine, transformed by the Karatsuba/kstack lane-DFT
    (``pallas_global._lane_dft`` with bf16 presplit tables — the round-3
    fused2 measurement: the family is MATMUL-bound and the mm stages gained
    +20%), and reinterleaved on store.  Needs 128 | L and fp32/x3 grade."""
    from .pallas_global import _fold_scratches, _lane_dft

    L = plan.n
    if L % 128:
        return None
    prec = _kernel_precision(precision)
    if prec != "x3":
        return None
    fused = plan.level != Level.DIRECT
    # lane tile in complex elements: the interleaved block is 2·tc wide
    tc = 0
    cap = config.vmem_bytes * 3 // 4
    cands = [ct_override // 2] if ct_override else [512, 256, 128, 64]
    for c in cands:
        if (
            c > 0
            and c % 64 == 0
            and rest2 % (2 * c) == 0
            and _col_mm_est_bytes(plan, c) <= cap
        ):
            tc = c
            break
    if not tc:
        return None
    x3 = raw.reshape(bpre, L, rest2)
    spec = pl.BlockSpec(
        (1, L, 2 * tc), lambda bi, ci: (bi, 0, ci), memory_space=pltpu.VMEM
    )
    tables = [bank[nm] for nm in names]
    nt = len(tables)
    fl = sum(plan.factors) if fused else L

    def kern(x_ref, *rest):
        tabs = rest[:nt]
        o_ref = rest[nt]
        s3, pr, pi, s2 = rest[nt + 1 : nt + 5]
        fold = rest[nt + 5 :]
        for j in range(L // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s3[...] = x_ref[0, sl, :].T  # (2tc, 128)
            pr[:, sl] = s3[0::2, :]      # (tc, 128) = [trail, n-slice]
            pi[:, sl] = s3[1::2, :]
        ar, ai = _lane_dft(
            pr[...], pi[...], plan, tabs, prec, fold, mm=True
        )  # (tc, L) = [trail, k] natural
        if scale != 1.0:
            ar = ar * scale
            ai = ai * scale
        for j in range(L // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = ar[:, sl]  # (2tc, 128)
            s2[1::2, :] = ai[:, sl]
            o_ref[0, sl, :] = s2[...].T  # (128, 2tc) = [k-slice, trail]

    out = pl.pallas_call(
        kern,
        grid=(bpre, rest2 // (2 * tc)),
        in_specs=[spec] + [_const_spec(t) for t in tables],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bpre, L, rest2), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * tc, 128), raw.dtype),
            pltpu.VMEM((tc, L), raw.dtype),
            pltpu.VMEM((tc, L), raw.dtype),
            pltpu.VMEM((2 * tc, 128), raw.dtype),
        ]
        + _fold_scratches(plan, tc, raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bpre * L * rest2 * fl,
            bytes_accessed=2 * bpre * L * rest2 * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
        **(ds_params("parallel", "parallel") if ds else {}),
    )(x3, *tables)
    return out.reshape(raw.shape)


def col_raw_call(
    raw, bpre: int, plan: Plan1D, rest2: int, sign: int, names: list[str],
    bank, config, precision=None, scale: float = 1.0,
    ct_override: int = 0, ds: bool = False,
):
    """Transform axis of length ``plan.n`` over the sublane dimension of the
    PACKED interleaved buffer viewed (bpre, L, rest2).  Returns the
    transformed buffer in the same raw layout, or None when no legal tiling
    exists.  ``ct_override`` (autotuner {"ct": …}) replaces the static lane
    tile when it legally divides the trailing extent; ``ds`` ({"ds": 1})
    declares both grid dimensions parallel (the output blocks are disjoint)
    so Mosaic may reorder/overlap iterations."""
    L = plan.n
    fused = plan.level != Level.DIRECT
    prec = _kernel_precision(precision, L)
    vmem = config.vmem_bytes * 3 // 4
    ct = _pick_ct(rest2, L, fused, vmem)
    if (
        ct_override
        and rest2 % ct_override == 0
        and (ct_override % 128 == 0 or ct_override == rest2)
        # a stale/foreign cache entry must not push the block past VMEM
        and _ct_bytes(L, ct_override, fused) <= vmem
    ):
        ct = ct_override
    if not ct:
        return None
    x3 = raw.reshape(bpre, L, rest2)
    spec = pl.BlockSpec(
        (1, L, ct), lambda bi, ci: (bi, 0, ci), memory_space=pltpu.VMEM
    )
    tables = [bank[nm] for nm in names]
    if fused:
        kern = _col_fused_kernel(plan.factors[0], prec, scale)
        fl = sum(plan.factors)
    else:
        kern = _col_direct_kernel(prec, scale)
        fl = L
    out = pl.pallas_call(
        kern,
        grid=(bpre, rest2 // ct),
        in_specs=[spec] + [_const_spec(t) for t in tables],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bpre, L, rest2), raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bpre * L * rest2 * fl,
            bytes_accessed=2 * bpre * L * rest2 * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
        **(ds_params("parallel", "parallel") if ds else {}),
    )(x3, *tables)
    return out.reshape(raw.shape)


def md2_supported(
    plan1: Plan1D, plan2: Plan1D, config, slack: float = 1.0
) -> bool:
    """Fused trailing-2D kernel gate (``md2_fused_raw_call``): both axis
    plans must have lane-DFT shapes (DIRECT, or FUSED [a, 128]) with
    128-multiple lengths, and the persistent (n2, n1) scratch planes plus
    the larger phase working set must fit the VMEM estimate.

    ``slack``: VMEM multiplier.  The DEFAULT path keeps 1.0 — a Mosaic
    rejection of a default kernel pins the whole entry to the XLA
    executor (committed._run), far worse than the per-axis pipeline, so
    borderline shapes must decline at build time.  The autotuner probes
    with 2.0 (its variants are compile-checked and parity-gated on the
    device before they can be recorded)."""
    from . import pallas_global as pg

    for pln in (plan1, plan2):
        if pln.level == Level.DIRECT:
            pass
        elif (
            pln.level == Level.FUSED
            and len(pln.factors) == 2
            and pln.factors[1] == 128
            and 128 % pln.factors[0] == 0
        ):
            pass
        else:
            return False
        if pln.n % 128:
            return False
    return md2_pick_tiles(plan1, plan2, config, slack) is not None


def md2_pick_tiles(
    plan1: Plan1D, plan2: Plan1D, config, slack: float = 1.0,
    min_tile: int = 128,
):
    """Largest (t1, t2) pair whose COMBINED estimate (persistent planes +
    larger phase set) fits ``slack``×VMEM, or None.  The pair is searched
    jointly — instead of picking each tile against a fixed 3/4 budget and
    then failing the total (round-4 VERDICT weak #4 declined 1024² that
    way at t=256).

    ``min_tile``: DEFAULT-path floor on the tile caps.  1024×1024 does
    fit at slack 1.0 with (64, 64), but that config measured 35.7 ms on
    chip vs 15.0 for the per-axis pipeline it would displace (BENCH r5
    first run, 2026-08-21) — sub-128 lane tiles starve the matmuls, so
    un-tuned defaults stay ≥ 128 and tiny tiles are reachable only via
    the autotuner's device-verified mt1/mt2 overrides."""
    n1, n2 = plan1.n, plan2.n
    vmem = int(slack * config.vmem_bytes)
    for cap1, cap2 in ((256, 128), (128, 128), (128, 64), (64, 64)):
        if min(cap1, cap2) < min_tile:
            continue
        t1 = pg_pick(n2, plan1, n1, vmem, cap1)
        t2 = pg_pick(n1, plan2, n2, vmem, cap2)
        if (
            t1
            and t2
            and md2_est_bytes(plan1, plan2, t1, t2) <= vmem
        ):
            return t1, t2
    return None


def pg_pick(g_other: int, sub_lane: Plan1D, n_lane: int, vmem: int,
            cap: int) -> int:
    from . import pallas_global as pg

    return pg._pick_tile(g_other, sub_lane, n_lane, vmem, cap, 64)


def md2_est_bytes(plan1: Plan1D, plan2: Plan1D, t1: int, t2: int) -> int:
    """VMEM working-set estimate of the fused trailing-2D kernel: the
    per-transform (n2, n1) scratch planes plus the larger phase set."""
    from . import pallas_global as pg

    planes = 2 * plan1.n * plan2.n * 4
    return planes + max(
        pg.pass_est_bytes(plan1, plan1.n, t1),
        pg.pass_est_bytes(plan2, plan2.n, t2),
    )


def md2_fused_raw_call(
    raw, batch, plan1: Plan1D, plan2: Plan1D, sign: int, bank_keys, bank,
    config, precision=None, scale: float = 1.0, t1_override: int = 0,
    t2_override: int = 0,
):
    """PACKED interleaved raw (2*batch*n1*n2,) -> trailing-2D-transformed
    raw, ONE fused kernel — both axes in a single HBM round trip.

    The per-axis pipeline pays one read+write sweep per axis (a 2D
    transform = 4 sweeps); this kernel reuses the GLOBAL fused engine's
    persistent-scratch structure (pallas_global.global_fused_raw_call)
    with the inter-factor twiddle dropped (the 2D DFT has none) and a
    row-major store (the 2D output is NOT digit-transposed):

    * grid (batch, nA + nB), sequential;
    * phase A (s < nA): input lane tile (1, n1, 2*t1) ->
      transpose-deinterleave -> lane-DFT over n1 (the axis-0 DFT) ->
      persistent scratch planes (n2, n1) = [a2, k1];
    * phase B (s >= nA): scratch column slice (n2, t2) = [a2, k1-slice]
      -> transpose -> lane-DFT over n2 (the axis-1 DFT) -> (t2, n2) =
      [k1-slice, k2] -> per-128-lane sublane-interleave + transpose ->
      output rows k1-slice, lanes 2*k2+p (t2 <= 128: Mosaic's
      strided-sublane rule bounds the (256, t2) interleave scratch).

    Reference counterpart: dispatch_dimensions' per-axis kernel chain
    (committed_descriptor_impl.hpp:899-950) — which cannot fuse axes;
    on TPU the fusion halves HBM traffic, the md bottleneck.
    """
    from . import pallas_global as pg

    n1, n2 = plan1.n, plan2.n
    prec = _kernel_precision(precision)
    if n1 % 128 or n2 % 128:
        return None
    mm_ok = pg.mm_enabled(prec)
    names1, use_mm1 = pg.sub_tables(plan1, sign, bank_keys, mm_ok)
    names2, use_mm2 = pg.sub_tables(plan2, sign, bank_keys, mm_ok)

    if t1_override and (n2 % t1_override or t1_override % 64):
        t1_override = 0
    if t2_override and (
        n1 % t2_override or t2_override % 64 or t2_override > 128
    ):
        t2_override = 0
    # default tiles keep the strict bound (a Mosaic rejection would pin
    # the entry to the XLA executor); explicit overrides came through the
    # autotuner's device-verified race and may use the 2x slack
    if t1_override or t2_override:
        t1 = t1_override or pg._pick_tile(
            n2, plan1, n1, config.vmem_bytes * 3 // 4, 256, 64
        )
        t2 = t2_override or pg._pick_tile(
            n1, plan2, n2, config.vmem_bytes * 3 // 4, 128, 64
        )
        if not t1 or not t2:
            return None
        if md2_est_bytes(plan1, plan2, t1, t2) > 2 * config.vmem_bytes:
            return None
    else:
        pair = md2_pick_tiles(plan1, plan2, config, slack=1.0)
        if pair is None:
            return None
        t1, t2 = pair
    nA = n2 // t1
    nB = n1 // t2

    x3 = raw.reshape(batch, n1, 2 * n2)
    in_spec = pl.BlockSpec(
        (1, n1, 2 * t1),
        lambda bi, s: (bi, 0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, t2, 2 * n2),
        lambda bi, s: (bi, jnp.maximum(s - nA, 0), 0),
        memory_space=pltpu.VMEM,
    )

    shared = names2 == names1
    nt1 = len(names1)
    nt2 = 0 if shared else len(names2)
    nf1 = 0 if plan1.level == Level.DIRECT else 2

    def kern(x_ref, *rest):
        tabs1 = rest[:nt1]
        tabs2 = tabs1 if shared else rest[nt1 : nt1 + nt2]
        o_ref = rest[nt1 + nt2]
        sc = rest[nt1 + nt2 + 1 :]
        s3, pr, pi, s2, Sr, Si = sc[:6]
        fold1 = sc[6 : 6 + nf1]
        fold2 = sc[6 + nf1 :]
        s = pl.program_id(1)

        @pl.when(s < nA)
        def _phase_a():
            for j in range(n1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[0, sl, :].T  # (2t1, 128)
                pr[:, sl] = s3[0::2, :]      # (t1, n1) = [a2-slice, a1]
                pi[:, sl] = s3[1::2, :]
            ar, ai = pg._lane_dft(
                pr[...], pi[...], plan1, tabs1, prec, fold1, mm=use_mm1
            )  # (t1, n1) = [a2-slice, k1]
            Sr[pl.ds(s * t1, t1), :] = ar
            Si[pl.ds(s * t1, t1), :] = ai

        @pl.when(s >= nA)
        def _phase_b():
            j = jnp.maximum(s - nA, 0)
            row = pl.multiple_of(j * t2, t2)
            br = Sr[:, pl.ds(row, t2)]   # (n2, t2) = [a2, k1-slice]
            bi_ = Si[:, pl.ds(row, t2)]
            cr, ci = pg._lane_dft(
                br.T, bi_.T, plan2, tabs2, prec, fold2, mm=use_mm2
            )  # (t2, n2) = [k1-slice, k2]
            if scale != 1.0:
                cr = cr * scale
                ci = ci * scale
            for jj in range(n2 // 128):
                sl = slice(jj * 128, (jj + 1) * 128)
                s2[0::2, :] = cr[:, sl].T  # (256, t2): sublane interleave
                s2[1::2, :] = ci[:, sl].T
                o_ref[0, :, 2 * jj * 128 : 2 * (jj + 1) * 128] = s2[...].T

    tabs = [bank[nm] for nm in names1]
    if not shared:
        tabs += [bank[nm] for nm in names2]
    n = n1 * n2
    out = pl.pallas_call(
        kern,
        grid=(batch, nA + nB),
        in_specs=[in_spec] + [_const_spec(t) for t in tabs],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n1, 2 * n2), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * t1, 128), raw.dtype),
            pltpu.VMEM((t1, n1), raw.dtype),
            pltpu.VMEM((t1, n1), raw.dtype),
            pltpu.VMEM((256, t2), raw.dtype),
            pltpu.VMEM((n2, n1), raw.dtype),
            pltpu.VMEM((n2, n1), raw.dtype),
        ]
        + pg._fold_scratches(plan1, t1, raw.dtype)
        + pg._fold_scratches(plan2, t2, raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n
            * ((sum(plan1.factors) or n1) + (sum(plan2.factors) or n2)),
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(x3, *tabs)
    return out.reshape(raw.shape[0])
