"""Pallas TPU kernels for DIRECT and FUSED plan leaves.

The TPU analogue of the reference's specialized per-level device kernels
(workitem_dispatcher.hpp:99-350, subgroup_dispatcher.hpp:85-664,
workgroup_dispatcher.hpp:94-281): one Pallas kernel runs the whole transform
of a leaf plan inside VMEM, so each element is read from HBM once and
written once, with factor matmuls on the MXU, twiddle multiplies on the VPU
and the inter-stage transpose staying on-chip — where the pure-XLA chain
materializes every stage in HBM.

Mosaic (the TPU kernel compiler) only lowers a restricted op set; the
kernels here are built exclusively from empirically-verified primitives:
2D/3D last-two-dims transposes, 3D dot_general contracting the last axis,
elementwise ops, and reshapes whose lane dimension is a multiple of 128.
That constrains the fused form to the two-stage split n = a·128 (planner
emits factors [a, 128] whenever 128 | n), with the digit-reversal flatten
expressed as a 3D output block instead of an in-kernel reshape:

    x  (bt, a, 128)            reshape, lane = 128
    xT (bt, 128, a)            swapaxes(-2, -1)
    A  = xT @ W_a              MXU, contract a
    A *= T[n2, k1]             twiddle, bank layout (128, a)
    B  (bt, a, 128)            swapaxes
    C  = B @ W_128             MXU
    out(bt, 128, a) = C^T      block written [k2, k1] = natural order

DFT matrices are symmetric (W = W^T), so the contraction never needs a
transposed table.  Tables enter as pallas inputs with constant grid index —
DMA'd to VMEM once, resident across the batch grid (the analogue of the
reference's twiddle USM buffers).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Level
from ..planner import Plan1D, stage_shapes
from . import xla_fft


def _leaf_table_keys(plan: Plan1D, sign: int, bank_keys: dict) -> list[str]:
    """Ordered bank array names the chain of this leaf needs."""
    names = []
    seen = set()
    for f, m in stage_shapes(plan.factors):
        wkey = bank_keys[("W", f, sign)]
        for suffix in ("r", "i"):
            if wkey + suffix not in seen:
                seen.add(wkey + suffix)
                names.append(wkey + suffix)
        if m > 1:
            tkey = bank_keys[("T", f, m, sign)]
            for suffix in ("r", "i"):
                names.append(tkey + suffix)
                seen.add(tkey + suffix)
    return names



def _kernel_precision(p, n: int = 1 << 30):
    """Pallas kernels default to the manual bf16x3 scheme (~1e-5 relative
    error at ~2x the speed of HIGHEST, Mosaic's only other accurate mode).
    Tiny transforms keep HIGHEST: the parity tolerance 2·eps·N·log2N leaves
    no headroom over the two-term bf16 split's ~1e-5 floor at N ≤ 16
    (measured: worst-element diff 1.7e-5 vs tol 1.5e-5 at N=16, b=1024)."""
    if p is None:
        return "x3" if n >= 32 else jax.lax.Precision.HIGHEST
    return xla_fft.resolve_precision(p)


def _mm(a, b, precision):
    if precision == "x3":
        return xla_fft.matmul_x3(a, b)
    if precision == "x4":
        return xla_fft.matmul_x4(a, b)
    return jnp.matmul(a, b, precision=precision)


@functools.lru_cache(maxsize=None)
def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def ds_params(*semantics: str) -> dict:
    """``compiler_params`` kwargs marking grid dimensions' scheduling
    semantics (Mosaic defaults every dimension to "arbitrary" = strictly
    sequential; "parallel" lets it reorder/overlap iterations).  Empty in
    interpret mode, where TPU compiler params are not understood."""
    if _interpret_mode():
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=tuple(semantics)
        )
    }


def dump(tag: str, val) -> None:
    """In-kernel data dump, gated by ``PORTFFT_LOG_DUMPS`` (the reference's
    log_dump_local/log_dump_private device streams, logging.hpp:169-213).

    The gate is evaluated at trace time: with the flag off no ops are
    emitted, so the facility is zero-cost in production kernels.  With it
    on, every kernel instance prints its grid position and a content
    summary (works compiled on TPU via Mosaic's debug_print, and in
    interpreter mode)."""
    from ..utils import logging as _plog

    if not _plog.DUMPS_ENABLED:
        return
    pl.debug_print(
        "[pfft dump] " + tag + " grid={} sum={} absmax={}",
        pl.program_id(0),
        jnp.sum(val),
        jnp.max(jnp.abs(val)),
    )


def _direct_kernel(precision):
    """n ≤ 128: one complex matmul over the last axis."""

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
        dump("direct.in", xr_ref[...])
        yr, yi = xla_fft.complex_matmul_last(
            xr_ref[...], xi_ref[...], wr_ref[...], wi_ref[...], precision
        )
        dump("direct.out", yr)
        or_ref[...] = yr
        oi_ref[...] = yi

    return kernel


def _fused2_kernel(a: int, precision):
    """n = a·128 two-stage Stockham, Mosaic-safe op set only."""

    def kernel(
        xr_ref, xi_ref, war, wai, tr, ti, wbr, wbi, or_ref, oi_ref
    ):
        bt = xr_ref.shape[0]
        n = xr_ref.shape[1]
        dump("fused2.in", xr_ref[...])
        xr = xr_ref[...].reshape(bt, a, 128)
        xi = xi_ref[...].reshape(bt, a, 128)
        # [n1, n2] -> [n2, n1]
        xr = jnp.swapaxes(xr, 1, 2)
        xi = jnp.swapaxes(xi, 1, 2)
        # factor-a DFT (contract last axis)
        ar, ai = xla_fft.complex_matmul_last(
            xr, xi, war[...], wai[...], precision
        )
        # inter-factor twiddle, bank layout (m=128, f=a) = [n2, k1]
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
        # [n2, k1] -> [k1, n2]
        ar = jnp.swapaxes(ar, 1, 2)
        ai = jnp.swapaxes(ai, 1, 2)
        # 128-point DFT
        cr, ci = xla_fft.complex_matmul_last(
            ar, ai, wbr[...], wbi[...], precision
        )
        dump("fused2.stageB", cr)
        # X[k1 + a·k2] = C[k1, k2]: write the (bt, 128, a) block = [k2, k1]
        or_ref[...] = jnp.swapaxes(cr, 1, 2)
        oi_ref[...] = jnp.swapaxes(ci, 1, 2)

    return kernel


def _pick_tile(b: int, plan: Plan1D, config) -> int:
    bt = min(plan.batch_tile, config.batch_tile)
    while bt > config.sublane and b % bt:
        bt //= 2
    return bt


def _const_spec(t):
    return pl.BlockSpec(
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )


def fused_chain(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config, precision=None
):
    """Run a DIRECT/FUSED leaf as one Pallas kernel over the batch grid.

    xr/xi: (..., n) planes.  Returns transformed planes of the same shape.
    Returns None when the plan's shape has no Mosaic-safe kernel (caller
    falls back to the XLA chain).
    """
    n = plan.n
    factors = plan.factors
    # Plane-path two-stage kernels need a >= 8: tiny split factors produce
    # (bt, 128, a) blocks that Mosaic compiles pathologically slowly (the
    # raw-I/O v2 kernel handles small a fine and is preferred upstream).
    two_stage = (
        len(factors) == 2 and factors[1] == 128 and factors[0] >= 8
    )
    if not (len(factors) == 1 or two_stage) and not _interpret_mode():
        return None

    lead = xr.shape[:-1]
    b = math.prod(lead) if lead else 1
    if two_stage and not _interpret_mode():
        # the (b, 128, a) output arrays are lane-padded to 128 in HBM;
        # bound the padded allocation (see fused2_raw_supported)
        if 2 * b * 128 * 128 * xr.dtype.itemsize > (4 << 30):
            return None
    xr2 = xr.reshape(b, n)
    xi2 = xi.reshape(b, n)

    if two_stage:
        # Fixed 6-slot layout [Wa_r, Wa_i, T_r, T_i, W128_r, W128_i];
        # when a == 128 the two W tables alias the same bank array.
        a0 = factors[0]
        wa = bank_keys[("W", a0, sign)]
        tk = bank_keys[("T", a0, 128, sign)]
        wb = bank_keys[("W", 128, sign)]
        table_names = [
            wa + "r", wa + "i", tk + "r", tk + "i", wb + "r", wb + "i"
        ]
    else:
        table_names = _leaf_table_keys(plan, sign, bank_keys)
    tables = [bank[name] for name in table_names]
    prec = _kernel_precision(precision, n)

    bt = _pick_tile(b, plan, config)
    if two_stage:
        # The digit-reversal output block (bt, 128, a) is lane-padded to
        # (bt, 128, 128) in VMEM regardless of a; budget for it (×2 planes,
        # ×2 pipeline buffers) plus inputs and intermediates.
        table_bytes = sum(4 * t.size for t in tables)

        def f2_bytes(bt_):
            io = 2 * 2 * bt_ * n * 4
            out_padded = 2 * 2 * bt_ * 128 * 128 * 4
            scratch = 2 * 2 * bt_ * 128 * 128 * 4
            return io + out_padded + scratch + table_bytes

        while bt > config.sublane and f2_bytes(bt) > config.vmem_budget:
            bt //= 2
    pad = (-b) % bt
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    bp = b + pad

    data_spec = pl.BlockSpec(
        (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    flops = 8 * bp * n * sum(factors)
    bytes_accessed = 2 * 2 * bp * n * xr2.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
    )

    if len(factors) == 1:
        yr, yi = pl.pallas_call(
            _direct_kernel(prec),
            grid=(bp // bt,),
            in_specs=[data_spec, data_spec] + [_const_spec(t) for t in tables],
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((bp, n), xr2.dtype)] * 2,
            cost_estimate=cost,
            interpret=_interpret_mode(),
        )(xr2, xi2, *tables)
    elif two_stage:
        a = factors[0]
        out_spec = pl.BlockSpec(
            (bt, 128, a), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        yr, yi = pl.pallas_call(
            _fused2_kernel(a, prec),
            grid=(bp // bt,),
            in_specs=[data_spec, data_spec] + [_const_spec(t) for t in tables],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((bp, 128, a), xr2.dtype)] * 2,
            cost_estimate=cost,
            interpret=_interpret_mode(),
        )(xr2, xi2, *tables)
        # (bp, 128, a) row-major == flat index k2·a + k1 == the transform
        # index k1 + a·k2: the flatten is a free bitcast.
        yr = yr.reshape(bp, n)
        yi = yi.reshape(bp, n)
    else:  # interpreter-only generic chain (correctness testing off-TPU)
        yr, yi = _generic_chain_call(
            xr2, xi2, plan, sign, bank_keys, tables, table_names, bt, cost,
            prec,
        )

    if pad:
        yr = yr[:b]
        yi = yi[:b]
    return yr.reshape(*lead, n), yi.reshape(*lead, n)


def _generic_chain_call(
    xr2, xi2, plan, sign, bank_keys, tables, table_names, bt, cost, prec
):
    """Arbitrary factor chains — interpreter mode only (Mosaic rejects the
    small-lane reshapes the generic recursion produces)."""
    bp, n = xr2.shape

    def kernel(xr_ref, xi_ref, *rest):
        table_refs = rest[: len(tables)]
        or_ref, oi_ref = rest[len(tables)], rest[len(tables) + 1]
        kbank = {
            name: ref[...] for name, ref in zip(table_names, table_refs)
        }
        yr, yi = xla_fft.exec_chain_xla(
            xr_ref[...], xi_ref[...], plan.factors, sign, bank_keys, kbank,
            prec,
        )
        or_ref[...] = yr
        oi_ref[...] = yi

    data_spec = pl.BlockSpec(
        (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[data_spec, data_spec] + [_const_spec(t) for t in tables],
        out_specs=[data_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((bp, n), xr2.dtype)] * 2,
        cost_estimate=cost,
        interpret=True,
    )(xr2, xi2, *tables)


def _direct_raw_kernel(rt: int, chunk: int, precision):
    """PACKED interleaved direct FFT: one real matmul per block against the
    interleaved block-diagonal DFT matrix — deinterleave, DFT, scale and
    reinterleave in a single MXU pass.

    The block arrives as a (rt·chunk/128, 128) tile of the flat buffer's
    native (X, 128) view — the only 2D view that shares the flat array's
    tiled HBM layout, so no relayout pass is paid at the kernel boundary
    (a jnp.reshape of a flat array to (rows, c>128) materializes a full
    extra HBM round trip on TPU; measured +35% end-to-end).  The lane
    merge/split reshapes below stay inside VMEM and are free."""

    def kernel(x_ref, v_ref, o_ref):
        blk = x_ref.shape[0]
        u = x_ref[...].reshape(rt, chunk)
        dump("direct_raw.in", u)
        o_ref[...] = _mm(u, v_ref[...], precision).reshape(blk, 128)

    return kernel


def direct_raw_supported(
    n: int, total_complex: int, vmem_budget: int = 9 << 20
) -> tuple[int, int] | None:
    """If the raw fast path applies, return (chunk_lanes, row_tile); else
    None.

    Requires the block-diagonal period lcm(2n, 256) to stay MXU-sized, the
    flat buffer to tile into (row_tile, chunk) matmul blocks, and the V
    table plus double-buffered in/out blocks to fit the VMEM budget.
    """
    two_n = 2 * n
    chunk = two_n
    while chunk % 256 and chunk < 1024:
        chunk += two_n
    if chunk % 256 or chunk > 1024:
        return None
    total = 2 * total_complex
    table_bytes = chunk * chunk * 4
    # pick the matmul row tile: in/out blocks double-buffered by the Pallas
    # pipeline, plus ~3 block-sized x3-scheme temporaries
    for rt in (1024, 512, 256, 128, 64, 32, 16, 8):
        block_bytes = 7 * rt * chunk * 4
        if total % (chunk * rt) == 0 and table_bytes + block_bytes <= vmem_budget:
            return chunk, rt
    return None


def direct_raw_call(raw, n, v_table, chunk, rt, config, precision=None):
    """raw (2M,) PACKED interleaved -> transformed raw (2M,)."""
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)  # layout-free view of the flat buffer
    blk = rt * chunk // 128
    prec = _kernel_precision(precision, n)
    data_spec = pl.BlockSpec(
        (blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    flops = 2 * total * chunk
    out = pl.pallas_call(
        _direct_raw_kernel(rt, chunk, prec),
        grid=(total // (rt * chunk),),
        in_specs=[data_spec, _const_spec(v_table)],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((total // 128, 128), raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * total * 4, transcendentals=0
        ),
        interpret=_interpret_mode(),
    )(x2, v_table)
    return out.reshape(total)


def _fused2_raw_kernel(a: int, bt: int, precision, scale=1.0):
    """PACKED interleaved two-stage FFT, raw in / raw out, one HBM pass.

    The per-batch (256, a) scratch transpose doubles as the deinterleave
    (producing planes already in the [n2, n1] swapped orientation), and the
    per-batch (2a, 128) output transpose doubles as both the digit-reversal
    and the reinterleave — no separate I/O kernels, no extra HBM traffic.
    """

    def kernel(
        x_ref, war, wai, tr, ti, wbr, wbi, o_ref, xr_s, xi_s, s3, s2
    ):
        # deinterleave: x_ref (bt, a, 256) -> plane scratches (bt, 128, a)
        for b in range(bt):
            s3[...] = x_ref[b].T  # (256, a)
            xr_s[b] = s3[0::2, :]  # (128, a) = [n2, n1]
            xi_s[b] = s3[1::2, :]
        xr = xr_s[...]
        xi = xi_s[...]
        # factor-a DFT
        ar, ai = xla_fft.complex_matmul_last(
            xr, xi, war[...], wai[...], precision
        )
        # twiddle, bank layout (m=128, f=a) = [n2, k1]
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
        ar = jnp.swapaxes(ar, 1, 2)  # (bt, a, 128) = [k1, n2]
        ai = jnp.swapaxes(ai, 1, 2)
        # 128-point DFT
        cr, ci = xla_fft.complex_matmul_last(
            ar, ai, wbr[...], wbi[...], precision
        )
        if scale != 1.0:
            cr = cr * scale
            ci = ci * scale
        # C (bt, a, 128) = [k1, k2]; out scalar idx = 2a·k2 + 2k1 + p:
        # interleave + digit-reverse via one transpose per batch row
        for b in range(bt):
            s2[0::2, :] = cr[b]  # (2a, 128)
            s2[1::2, :] = ci[b]
            o_ref[b] = s2[...].T  # (128, 2a) = [k2, 2k1+p]

    return kernel


def fused2_raw_supported(n: int, plan: Plan1D, batch: int = 1) -> bool:
    """True if either fused2 raw kernel (flat v2 preferred, padded v1
    fallback) can run this plan."""
    if not (
        len(plan.factors) == 2
        and plan.factors[1] == 128
        and plan.factors[0] >= 3
    ):
        return False
    a = plan.factors[0]
    if fold_factor(a) > 0:
        return True
    # v1 fallback: its HBM output array (batch, 128, 2a) is lane-padded to
    # 128 when 2a < 128 — at 2a=8 that is a 16x allocation blowup that OOMs
    # the compile at large batch.  Bound the padded footprint.
    padded_out = batch * 128 * max(2 * a, 128) * 4
    return padded_out <= (4 << 30)


def fused2_raw_call(raw, batch, plan, v_tables, config, precision=None, scale=1.0):
    """raw (2·batch·n,) PACKED interleaved -> transformed, one kernel."""
    n = plan.n
    a = plan.factors[0]
    prec = _kernel_precision(precision, n)

    bt = _pick_tile(batch, plan, config)
    # padded VMEM: planes + out all pad their a-sized lane dim to 128
    def bytes_est(bt_):
        return (
            2 * bt_ * 2 * n * 4          # in (×2 pipeline buffers)
            + 4 * bt_ * 128 * 128 * 4    # plane scratches (padded)
            + 4 * bt_ * 128 * 128 * 4    # intermediates
            + 2 * 2 * bt_ * 128 * 256 * 4  # out (padded, ×2 buffers)
        )

    while bt > config.sublane and bytes_est(bt) > config.vmem_budget:
        bt //= 2
    if batch % bt:
        return None

    x3 = raw.reshape(batch, a, 256)
    in_spec = pl.BlockSpec(
        (bt, a, 256), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (bt, 128, 2 * a), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    flops = 8 * batch * n * (a + 128)
    out = pl.pallas_call(
        _fused2_raw_kernel(a, bt, prec, scale),
        grid=(batch // bt,),
        in_specs=[in_spec] + [_const_spec(t) for t in v_tables],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 128, 2 * a), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, 128, a), raw.dtype),
            pltpu.VMEM((bt, 128, a), raw.dtype),
            pltpu.VMEM((256, a), raw.dtype),
            pltpu.VMEM((2 * a, 128), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * raw.shape[0] * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(x3, *v_tables)
    return out.reshape(raw.shape[0])


def _fused2_raw_v2_kernel(a: int, bt: int, precision, scale, g: int):
    """Layout-L two-stage kernel, flat-view I/O: every tensor keeps ≥128
    lanes, transposes are large, and the HBM-side blocks are tiles of the
    flat buffer's native (X, 128) view — no relayout pass at either kernel
    boundary (see _direct_raw_kernel).

    Data flow (per grid step, rows R = bt·a, lanes L = bt·128):
      in block (2R, 128) --lane-merge--> x (R, 256)          [(b,n1), 2n2+p]
      (128, 256) tile transposes -> planes (R, 128)          [(b,n1), n2]
      sub-block scatter -> (a, bt, 128)                      [n1, b, n2]
      view (a, L); stage A = W_a @ X (left matmul)           [k1, (b,n2)]
      view (a, bt, 128); twiddle T'(a,1,128); dot3d W_128    [k1, b, k2]
      pair-stack scratch s2 (2a·g, bt, 128/g) with the k2-fold (g = 128/2a
      dense output rows, stage-B table columns pre-permuted so lane slices
      land in natural order); two permutes -> (bt, 128/g, 2ag); lane
      merge/split to the (2R, 128) out block: natural PACKED interleaved.
    """

    def kernel(x_ref, war, wai, tr, ti, wbr, wbi, o_ref, pr, pi, s3, s2):
        rows = bt * a
        x = x_ref[...].reshape(rows, 256)
        # deinterleave via (128, 256) tile transposes
        for t in range(rows // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = x[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T
        dump("fused2_raw.planes", pr[...])
        # rows (b, n1) -> (a, bt, 128) via per-batch sub-block moves
        xr3 = jnp.transpose(pr[...].reshape(bt, a, 128), (1, 0, 2))
        xi3 = jnp.transpose(pi[...].reshape(bt, a, 128), (1, 0, 2))
        # stage A: left matmul over n1 (DFT matrices are symmetric)
        L = bt * 128
        xr2 = xr3.reshape(a, L)
        xi2 = xi3.reshape(a, L)
        war_, wai_ = war[...], wai[...]
        ar2 = _mm(war_, xr2, precision) - _mm(wai_, xi2, precision)
        ai2 = _mm(wai_, xr2, precision) + _mm(war_, xi2, precision)
        # twiddle W_n^{k1·n2}: tables (a, 128) broadcast over the batch dim
        ar3 = ar2.reshape(a, bt, 128)
        ai3 = ai2.reshape(a, bt, 128)
        twr = tr[...].reshape(a, 1, 128)
        twi = ti[...].reshape(a, 1, 128)
        ar3, ai3 = xla_fft.complex_mul(ar3, ai3, twr, twi)
        # stage B: 128-point DFT over n2
        cr, ci = xla_fft.complex_matmul_last(
            ar3, ai3, wbr[...], wbi[...], precision
        )
        if scale != 1.0:
            cr = cr * scale
            ci = ci * scale
        # interleave + digit reversal: pair-stack along dim 0 of a 3D
        # scratch (strided stores require the base memref's minor dim to be
        # 128), then two supported permutes
        if g == 1:
            s2[0::2] = cr  # s2: (2a, bt, 128)
            s2[1::2] = ci
        else:
            Lg = 128 // g
            for j in range(g):
                lane = slice(j * Lg, (j + 1) * Lg)
                s2[j * 2 * a : (j + 1) * 2 * a : 2] = cr[:, :, lane]
                s2[j * 2 * a + 1 : (j + 1) * 2 * a : 2] = ci[:, :, lane]
        v = jnp.transpose(s2[...], (1, 0, 2))  # (bt, 2ag, 128/g)
        v = jnp.swapaxes(v, 1, 2)  # (bt, 128/g, 2ag) = natural scalar order
        dump("fused2_raw.out", v)
        o_ref[...] = v.reshape(2 * rows, 128)

    return kernel


def fold_factor(a: int) -> int:
    """k2-fold count g for the flat-output block: pack g output rows of 2a
    scalars into one dense 128-lane row (with a column-permuted stage-B
    table) so the out block is a tile of the flat buffer's (X, 128) view.
    2a·g must equal a multiple of 128 exactly; g=1 when 2a already is."""
    if (2 * a) % 128 == 0:
        return 1
    if 128 % (2 * a) == 0:
        return 128 // (2 * a)
    return 0


def fused2_raw_v2_call(
    raw, batch, plan, tables_v2, config, precision=None, scale: float = 1.0,
    bt_override: int | None = None,
):
    """tables_v2 = [Wa_r, Wa_i, T'_r, T'_i, W128_r, W128_i] with T' in
    (f, m) = (a, 128) orientation and the W128 columns permuted for the
    k2-fold when fold_factor(a) > 1."""
    n = plan.n
    a = plan.factors[0]
    g = fold_factor(a)
    if g == 0:
        return None
    prec = _kernel_precision(precision, n)

    def viable(bt_):
        return batch % bt_ == 0 and (bt_ * a) % 128 == 0

    from ..planner import two_stage_vmem_bytes

    def bytes_est(bt_):
        return two_stage_vmem_bytes(a, bt_)

    bt = bt_override or min(plan.batch_tile, config.batch_tile)
    if not bt_override:
        while bt > 1 and (bytes_est(bt) > config.vmem_budget or not viable(bt)):
            bt //= 2
    if not viable(bt):
        return None
    return _fused2_v2_launch(raw, batch, plan, tables_v2, a, n, bt, prec,
                             scale, g)


def _fused2_v2_launch(raw, batch, plan, tables_v2, a, n, bt, prec, scale, g):
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)  # layout-free view
    blk = 2 * bt * a  # rows of the (X, 128) view per grid step
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    flops = 8 * batch * n * (a + 128)
    out = pl.pallas_call(
        _fused2_raw_v2_kernel(a, bt, prec, scale, g),
        grid=(batch // bt,),
        in_specs=[spec] + [_const_spec(t) for t in tables_v2],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total // 128, 128), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * a, 128), raw.dtype),
            pltpu.VMEM((bt * a, 128), raw.dtype),
            pltpu.VMEM((256, 128), raw.dtype),
            pltpu.VMEM((2 * a * g, bt, 128 // g), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * total * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(x2, *tables_v2)
    return out.reshape(total)


def _split2(x):
    """Two-term bf16 operand split (the x3 scheme's runtime half)."""
    h = x.astype(jnp.bfloat16)
    return h, (x - h.astype(jnp.float32)).astype(jnp.bfloat16)


def _mm_f32(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def kara_matmul_last(ar, ai, refs):
    """Karatsuba complex right-matmul against presplit bf16 tables
    (TwiddleBank.mat_kara): nine bf16 MXU matmuls instead of the x3
    scheme's twelve, same ~1e-5 error floor (measured rel 6e-6 at
    N=4096 vs 4e-6 for x3; tolerance 2·eps·N·log2N ≈ 1e-2)."""
    q1, q2, q3, q4, q5, q6 = refs

    def mm3(xh, xl, wh, wl):
        out = _mm_f32(xh, wh[...])
        out = out + _mm_f32(xl, wh[...])
        return out + _mm_f32(xh, wl[...])

    arh, arl = _split2(ar)
    aih, ail = _split2(ai)
    ash, asl = _split2(ar + ai)
    t1 = mm3(arh, arl, q1, q2)
    t2 = mm3(aih, ail, q3, q4)
    t3 = mm3(ash, asl, q5, q6)
    return t1 - t2, t3 - t1 - t2


def kstackr_matmul_last(ar, ai, w6_ref):
    """Complex right-DFT over the lane axis as ONE stacked MXU matmul.

    ``w6_ref``: the (6n, 2n) bf16 table from TwiddleBank.mat_kstack_r.
    The x3 precision terms and all four complex products ride one
    K = 6n contraction against the lane stack [xrh xrl xrh xih xil xih];
    output lanes [0, n) = re, [n, 2n) = im.  vs the Karatsuba form:
    one matmul invocation instead of nine, no runtime xr+xi sum, four
    operand splits instead of six — 1.33x the MXU FLOPs, which
    probe_overlap showed are not the cost at these shapes."""
    xrh, xrl = _split2(ar)
    xih, xil = _split2(ai)
    x6 = jnp.concatenate([xrh, xrl, xrh, xih, xil, xih], axis=-1)
    y = _mm_f32(x6, w6_ref[...])
    n = ar.shape[-1]
    return y[..., :n], y[..., n:]


def kstack_dft_left(xr2, xi2, sa_ref, f: int):
    """Complex DFT over the sublane axis as ONE stacked MXU matmul.

    ``sa_ref``: the (2f, 6f) bf16 table from TwiddleBank.dft_kstack.
    xr2/xi2: (f, L) planes.  Returns (f, L) re / im planes.  The x3
    precision terms, complex products and both outputs ride in the one
    (2f, 6f) @ (6f, L) contraction — the MXU sees K = 6f and M = 2f
    instead of twelve K = M = f matmuls."""
    xrh, xrl = _split2(xr2)
    xih, xil = _split2(xi2)
    x6 = jnp.concatenate([xrh, xrl, xrh, xih, xil, xih], axis=0)
    y = _mm_f32(sa_ref[...], x6)
    return y[:f], y[f:]


def _fused2_raw_mm_kernel(a: int, bt: int, g: int, flat: bool = False):
    """The v2 layout-L kernel with the measured matmul-bound fix
    (probe_fused2_parts / probe_fused2_mm, 2026-08-17): stage A as the
    one-matmul K/M-stack, stage B as Karatsuba with presplit bf16
    tables.  Same I/O structure and restack as _fused2_raw_v2_kernel;
    scale is folded into the stage-B tables.  N=4096 b=32768 measured
    171-179 → 209 GB/s (bt=32).

    ``flat``: run stage B on the (a·bt, 128) 2D view instead of the
    (a, bt, 128) batched-3D contraction — a-many M=bt matmuls become one
    M=a·bt matmul per Karatsuba term, which the MXU pipelines without
    per-slice drain (autotuner variant {"flat": 1})."""

    def kernel(x_ref, sa, tr, ti, q1, q2, q3, q4, q5, q6,
               o_ref, pr, pi, s3, s2):
        rows = bt * a
        x = x_ref[...].reshape(rows, 256)
        for t in range(rows // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = x[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T
        dump("fused2_mm.planes", pr[...])
        xr3 = jnp.transpose(pr[...].reshape(bt, a, 128), (1, 0, 2))
        xi3 = jnp.transpose(pi[...].reshape(bt, a, 128), (1, 0, 2))
        L = bt * 128
        ar2, ai2 = kstack_dft_left(
            xr3.reshape(a, L), xi3.reshape(a, L), sa, a
        )
        ar3 = ar2.reshape(a, bt, 128)
        ai3 = ai2.reshape(a, bt, 128)
        ar3, ai3 = xla_fft.complex_mul(
            ar3, ai3, tr[...].reshape(a, 1, 128), ti[...].reshape(a, 1, 128)
        )
        if flat:
            cr, ci = kara_matmul_last(
                ar3.reshape(a * bt, 128), ai3.reshape(a * bt, 128),
                (q1, q2, q3, q4, q5, q6),
            )
            cr = cr.reshape(a, bt, 128)
            ci = ci.reshape(a, bt, 128)
        else:
            cr, ci = kara_matmul_last(ar3, ai3, (q1, q2, q3, q4, q5, q6))
        if g == 1:
            s2[0::2] = cr
            s2[1::2] = ci
        else:
            Lg = 128 // g
            for j in range(g):
                lane = slice(j * Lg, (j + 1) * Lg)
                s2[j * 2 * a : (j + 1) * 2 * a : 2] = cr[:, :, lane]
                s2[j * 2 * a + 1 : (j + 1) * 2 * a : 2] = ci[:, :, lane]
        v = jnp.transpose(s2[...], (1, 0, 2))
        v = jnp.swapaxes(v, 1, 2)
        dump("fused2_mm.out", v)
        o_ref[...] = v.reshape(2 * rows, 128)

    return kernel


def fused2_raw_mm_call(
    raw, batch, plan, tables_mm, config, precision=None,
    bt_override: int | None = None, flat: bool = False, ds: bool = False,
):
    """tables_mm = [SA, U_r, U_i, Q1..Q6] (dft_kstack + twiddle_fm +
    mat_kara of the fold-permuted W128, scale folded into Q).  Only valid
    for the default x3-grade precision — callers wanting HIGHEST (or
    fp64) fall back to the v2 kernel."""
    n = plan.n
    a = plan.factors[0]
    g = fold_factor(a)
    if g == 0 or _kernel_precision(precision, n) != "x3":
        return None

    def viable(bt_):
        return batch % bt_ == 0 and (bt_ * a) % 128 == 0

    from ..planner import two_stage_vmem_bytes

    bt = bt_override or max(32, min(plan.batch_tile, config.batch_tile))
    if not bt_override:
        while bt > 1 and (
            two_stage_vmem_bytes(a, bt) > config.vmem_budget
            or not viable(bt)
        ):
            bt //= 2
    if not viable(bt):
        return None
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)
    blk = 2 * bt * a
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fused2_raw_mm_kernel(a, bt, g, flat),
        grid=(batch // bt,),
        in_specs=[spec] + [_const_spec(t) for t in tables_mm],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total // 128, 128), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * a, 128), raw.dtype),
            pltpu.VMEM((bt * a, 128), raw.dtype),
            pltpu.VMEM((256, 128), raw.dtype),
            pltpu.VMEM((2 * a * g, bt, 128 // g), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * (a + 128),
            bytes_accessed=2 * total * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
        # {"ds": 1} autotuner variant: batch tiles are independent, so the
        # grid dimension is declared parallel (Mosaic may overlap them)
        **(ds_params("parallel") if ds else {}),
    )(x2, *tables_mm)
    return out.reshape(total)


def _fused2_raw_v3_kernel(a: int, bt: int, precision, g: int):
    """Interleaved-stage two-stage kernel: the input is never deinterleaved.

    Stage A runs as a left complex matmul directly on the lane-interleaved
    block (the column kernel's pairswap primitive, ops/pallas_multidim.py
    ``_cmm_left_raw``), the inter-factor twiddle applies via the roll-based
    ``_ctw_raw``, and stage B right-multiplies by split-output interleaved
    tables (256, 128) that produce the separate re/im planes the v2 output
    fold consumes unchanged.  Removes v2's per-128-row deinterleave
    (1×(128,256) transpose + 2 strided slices + 2×(128,128) transposes) and
    one (1,0,2) plane permute — the XPOSE work that capped the fused2 family
    at ~190-200 GB/s (round-2 measurement) — at the cost of ~3 extra
    lane-roll passes.  Same flop count (complex arithmetic rides inside the
    wider real matmuls).

    Tables: [Wa_r, Wa_i, E_r, E_i, Vs_r, Vs_i] — Wa the (a, a) DFT planes,
    E the (a, 256) pair-expanded inter-factor twiddle
    (TwiddleBank.twiddle_expanded), Vs the (256, 128) split-output stage-B
    tables with the k2-fold column permutation and scale folded in
    (TwiddleBank.vmat_split).
    """
    from .pallas_multidim import _pairswap_last, _ctw_raw

    def kernel(x_ref, war, wai, er, ei, vr, vi, o_ref, s2):
        rows = bt * a
        x = x_ref[...].reshape(rows, 256)
        x3 = x.reshape(bt, a, 256)
        x3 = jnp.transpose(x3, (1, 0, 2))  # (a, bt, 256) [n1, b, 2n2+q]
        dump("fused2_v3.in", x3)
        # Left complex matmul on interleaved lanes (_cmm_left_raw) with the
        # roll/iota-select ops kept on the NARROW 3D views — pairswap at
        # bt·256-wide 2D lanes sends the Mosaic compile into a known spiral.
        xs3 = _pairswap_last(x3)
        e1 = _mm(war[...], x3.reshape(a, bt * 256), precision)
        e2 = _mm(wai[...], xs3.reshape(a, bt * 256), precision)
        e13 = e1.reshape(a, bt, 256)
        e23 = e2.reshape(a, bt, 256)
        lane = jax.lax.broadcasted_iota(jnp.int32, e13.shape, 2)
        p3 = jnp.where(lane % 2 == 0, e13 - e23, e13 + e23)
        p3 = _ctw_raw(
            p3, er[...].reshape(a, 1, 256), ei[...].reshape(a, 1, 256)
        )
        cr = _mm(p3, vr[...], precision)  # (a, bt, 128) [k1, b, k2-storage]
        ci = _mm(p3, vi[...], precision)
        dump("fused2_v3.stageB", cr)
        # v2's natural-order k2-fold + interleave (see _fused2_raw_v2_kernel)
        if g == 1:
            s2[0::2] = cr
            s2[1::2] = ci
        else:
            Lg = 128 // g
            for j in range(g):
                lane = slice(j * Lg, (j + 1) * Lg)
                s2[j * 2 * a : (j + 1) * 2 * a : 2] = cr[:, :, lane]
                s2[j * 2 * a + 1 : (j + 1) * 2 * a : 2] = ci[:, :, lane]
        v = jnp.transpose(s2[...], (1, 0, 2))  # (bt, 2ag, 128/g)
        v = jnp.swapaxes(v, 1, 2)  # (bt, 128/g, 2ag) = natural scalar order
        o_ref[...] = v.reshape(2 * rows, 128)

    return kernel


def fused2_raw_v3_call(
    raw, batch, plan, tables_v3, config, precision=None,
    bt_override: int | None = None,
):
    """tables_v3 = [Wa_r, Wa_i, E_r, E_i, Vs_r, Vs_i] (see the kernel
    docstring).  Scale lives inside the Vs tables."""
    n = plan.n
    a = plan.factors[0]
    g = fold_factor(a)
    if g == 0:
        return None
    prec = _kernel_precision(precision, n)

    def viable(bt_):
        return batch % bt_ == 0 and (bt_ * a) % 8 == 0

    from ..planner import two_stage_vmem_bytes

    bt = bt_override or min(plan.batch_tile, config.batch_tile)
    if not bt_override:
        while bt > 1 and (
            two_stage_vmem_bytes(a, bt) > config.vmem_budget or not viable(bt)
        ):
            bt //= 2
    if not viable(bt):
        return None
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)  # layout-free view
    blk = 2 * bt * a
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fused2_raw_v3_kernel(a, bt, prec, g),
        grid=(batch // bt,),
        in_specs=[spec] + [_const_spec(t) for t in tables_v3],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total // 128, 128), raw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * a * g, bt, 128 // g), raw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n * (a + 128),
            bytes_accessed=2 * total * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(x2, *tables_v3)
    return out.reshape(total)


def leaf_dispatch(
    xr, xi, plan, sign, bank, *, bank_keys, config, precision=None,
    post=None,
):
    """Executor hook: run DIRECT/FUSED leaves as Pallas kernels.

    Returns None to fall back to the XLA chain (fp64, or factor shapes
    without a Mosaic-safe kernel).  ``post`` (GLOBAL only): (re, im)
    [k1, k2] tables complex-multiplied inside the engine's pass 2 — used
    by the Bluestein executor to fold its per-element spectra into the
    convolution passes."""
    if xr.dtype != jnp.float32:
        return None
    if plan.level == Level.BLUESTEIN:
        from . import pallas_bluestein

        if post is not None:
            return None
        return pallas_bluestein.bluestein_call(
            xr, xi, plan, sign, bank_keys, bank, config, precision
        )
    if plan.level == Level.GLOBAL:
        from . import pallas_global

        if pallas_global.global2_supported(plan, config.direct_threshold):
            return pallas_global.global2_call(
                xr, xi, plan, sign, bank_keys, bank, config, precision,
                post=post,
            )
        return None
    if post is not None:
        return None
    if plan.level not in (Level.DIRECT, Level.FUSED):
        return None
    return fused_chain(
        xr, xi, plan, sign, bank_keys, bank, config, precision
    )
