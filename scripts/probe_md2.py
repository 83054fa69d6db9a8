#!/usr/bin/env python
"""Prototype of the fused 2D multi-dim kernel (md2).

The multi-dim pipeline pays one HBM round trip per axis — a 2D transform
is 4 sweeps, so its single-pass-accounted GB/s caps at 50% of streaming
(bench md rates: 48-75 GB/s vs ~290 streaming).  This kernel runs BOTH
axes of the trailing 2D block in one Pallas kernel with the eng-6
persistent-scratch structure (ops/pallas_global.global_fused_raw_call)
minus the inter-factor twiddle, plus a row-major (non-transposed) store:

  phase A (steps s < nA): input lane tile (1, n1, 2*t1) ->
    transpose-deinterleave -> lane-DFT over n1 (the COLUMN DFT) ->
    scratch planes (n2, n1) = [a2, k1];
  phase B (steps s >= nA): scratch column slice (n2, t2) = [a2, k1-slice]
    -> transpose -> lane-DFT over n2 (the ROW DFT) -> c (t2, n2) =
    [k1-slice, k2] -> per-128-lane sublane-interleave + transpose ->
    output block (1, t2, 2*n2) rows k1-slice.

HBM traffic: read 8*n + write 8*n per transform (plus bf16 tables), vs
16*n + 16*n for the two-pass pipeline -> the single-pass-accounted rate
can reach streaming.  Run on CPU (interpret mode) to check parity before
the kernel moves into ops/pallas_multidim.py.

Usage: JAX_PLATFORMS=cpu python scripts/probe_md2.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu.enums import Level  # noqa: E402
from portfft_tpu.ops import pallas_global as pg  # noqa: E402


def md2_fused_raw_call(
    raw, batch, plan1, plan2, sign, bank_keys, bank, config,
    precision=None, scale: float = 1.0, t1_override: int = 0,
    t2_override: int = 0,
):
    """PACKED interleaved raw (2*batch*n1*n2,) -> 2D-transformed raw,
    one fused kernel (both axes, persistent VMEM scratch)."""
    n1, n2 = plan1.n, plan2.n
    prec = pg._kernel_precision(precision)
    if n1 % 128 or n2 % 128:
        return None
    mm_ok = pg.mm_enabled(prec)
    names1, use_mm1 = pg.sub_tables(plan1, sign, bank_keys, mm_ok)
    names2, use_mm2 = pg.sub_tables(plan2, sign, bank_keys, mm_ok)
    if names1 is None or names2 is None:
        return None

    if t1_override and (n2 % t1_override or t1_override % 64):
        t1_override = 0
    if t2_override and (n1 % t2_override or t2_override % 64
                        or t2_override > 128):
        t2_override = 0
    t1 = t1_override or pg._pick_tile(
        n2, plan1, n1, config.vmem_bytes * 3 // 4, 256, 64
    )
    # phase-B store interleaves on sublanes of a (256, t2) scratch:
    # Mosaic's strided-sublane rule needs the minor dim <= 128
    t2 = t2_override or pg._pick_tile(
        n1, plan2, n2, config.vmem_bytes * 3 // 4, 128, 64
    )
    if not t1 or not t2:
        return None
    planes = 2 * n1 * n2 * 4
    est = planes + max(
        pg.pass_est_bytes(plan1, n1, t1), pg.pass_est_bytes(plan2, n2, t2)
    )
    if est > 2 * config.vmem_bytes:
        return None
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
                s2[0::2, :] = cr[:, sl].T  # (256, t2): interleave sublanes
                s2[1::2, :] = ci[:, sl].T
                o_ref[0, :, 2 * jj * 128 : 2 * (jj + 1) * 128] = s2[...].T

    tabs = [bank[nm] for nm in names1]
    if not shared:
        tabs += [bank[nm] for nm in names2]
    n = n1 * n2
    out = pl.pallas_call(
        kern,
        grid=(batch, nA + nB),
        in_specs=[in_spec] + [pg._const(t) for t in tabs],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, t2 * nB, 2 * n2), raw.dtype),
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
        interpret=jax.default_backend() != "tpu",
    )(x3, *tabs)
    return out.reshape(raw.shape[0])


def check(lengths, batch, sign=-1, scale=1.0, t1=0, t2=0):
    n1, n2 = lengths[-2], lengths[-1]
    bpre = batch * int(np.prod(lengths[:-2], dtype=np.int64))
    desc = pfft.Descriptor(
        lengths=[n1, n2], number_of_transforms=max(bpre, 1)
    )
    com = desc.commit(use_pallas=True)
    plan1, plan2 = com.plans[n1], com.plans[n2]
    rng = np.random.default_rng(0)
    raw = rng.uniform(-1, 1, 2 * bpre * n1 * n2).astype(np.float32)
    xj = jnp.asarray(raw)
    out = md2_fused_raw_call(
        xj, bpre, plan1, plan2, sign, com._bank_keys, com._bank_arrays,
        com.config, com.matmul_precision, scale, t1, t2,
    )
    if out is None:
        print(f"md2 {n1}x{n2}: DECLINED")
        return False
    got = np.asarray(out).view(np.complex64).reshape(bpre, n1, n2)
    x = raw.view(np.complex64).reshape(bpre, n1, n2)
    if sign == -1:
        ref = np.fft.fft2(x, axes=(1, 2)) * scale
    else:
        ref = np.fft.ifft2(x, axes=(1, 2)) * (n1 * n2) * scale
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    tag = f"md2 {n1}x{n2} b={bpre} sign={sign} scale={scale} t1={t1} t2={t2}"
    print(f"{tag}: rel={rel:.2e}")
    return rel < 1e-4


if __name__ == "__main__":
    ok = True
    ok &= check((512, 512), 2)
    ok &= check((512, 512), 1, sign=+1, scale=1.0 / (512 * 512))
    ok &= check((1024, 1024), 1)
    ok &= check((128, 128), 3)
    ok &= check((256, 512), 2)
    ok &= check((512, 256), 2)
    ok &= check((512, 512), 1, t1=64, t2=64)
    ok &= check((1024, 128), 2)
    print("MD2_PROBE", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)
