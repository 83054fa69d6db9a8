#!/usr/bin/env python
"""Race eng-6 tile shapes and a row-pipelined fused-engine variant.

probe_eng6 (logs/r4d_probe_eng6.log, n=131072 g=512x256 b=1024) showed:
the fused engine's two-phase data movement alone streams at 271 GB/s
(no_dft), but the full kernel runs 108.8 — the lane-DFT matmuls add
~12 ms on top of 7.9 ms of movement, i.e. compute and DMA barely
overlap and the matmuls themselves run far below MXU rate (narrow
M = t1 rows per step).  Two candidate fixes, measured here:

  fat tiles   full kernel at t1 in {64,128,256} x t2 in {128,256} —
              bigger matmul M; pure tuning, no structural change.
  pipe        row-pipelined kernel: grid (batch+1, S); step (r, s) runs
              phase A of batch row r into scratch bank r%2 AND phase B
              of row r-1 from bank (r-1)%2.  Input DMA, output DMA,
              DFT-A and DFT-B are all active every step instead of
              alternating by phase.  Costs 2x persistent scratch
              (16n bytes vs 8n).

Numerics of `pipe` are verified against np.fft before timing.

Usage: python scripts/probe_pipe.py [n] [g1] [g2] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from portfft_tpu.config import DeviceConfig, enable_persistent_cache  # noqa: E402

enable_persistent_cache()
from portfft_tpu.enums import Level  # noqa: E402
from portfft_tpu.ops import pallas_global as pg  # noqa: E402
from portfft_tpu.ops import xla_fft  # noqa: E402
from portfft_tpu.planner import Plan1D, plan_1d  # noqa: E402

from probe_eng6 import build_variant, dev_time  # noqa: E402


def build_pipe(plan, batch, keys, arrs, cfg, t1, t2):
    """Row-pipelined fused engine (numerically correct)."""
    n = plan.n
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    prec = pg._kernel_precision(None)
    mm_ok = pg.mm_enabled(prec)
    names1, use_mm1 = pg.sub_tables(g1p, -1, keys, mm_ok)
    names2, use_mm2 = pg.sub_tables(g2p, -1, keys, mm_ok)
    nA, nB = g2 // t1, g1 // t2
    S = max(nA, nB)

    in_spec = pl.BlockSpec(
        (1, g1, 2 * t1),
        lambda r, s: (jnp.minimum(r, batch - 1), 0, jnp.minimum(s, nA - 1)),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, g2, 2 * t2),
        lambda r, s: (
            jnp.maximum(r, 1) - 1, 0, jnp.minimum(s, nB - 1),
        ),
        memory_space=pltpu.VMEM,
    )
    tw = keys[("T", g1, g2, -1)]
    tw_arrays = [arrs[tw + "r"], arrs[tw + "i"]]
    tw_spec = pl.BlockSpec(
        (t1, g1),
        lambda r, s: (jnp.minimum(s, nA - 1), 0),
        memory_space=pltpu.VMEM,
    )

    shared = names2 == names1
    nt1 = len(names1)
    nt2 = 0 if shared else len(names2)

    def kern(x_ref, *rest):
        tabs1 = rest[:nt1]
        tabs2 = tabs1 if shared else rest[nt1 : nt1 + nt2]
        tws = rest[nt1 + nt2 : nt1 + nt2 + 2]
        o_ref = rest[nt1 + nt2 + 2]
        s3, pr, pi, s2, Sr, Si = rest[nt1 + nt2 + 3 :]
        r = pl.program_id(0)
        s = pl.program_id(1)
        par = (r % 2) * g2           # this row's scratch bank offset
        alt = ((r + 1) % 2) * g2     # previous row's bank

        @pl.when((r < batch) & (s < nA))
        def _phase_a():
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[0, sl, :].T
                pr[:, sl] = s3[0::2, :]
                pi[:, sl] = s3[1::2, :]
            ar, ai = pg._lane_dft(
                pr[...], pi[...], g1p, tabs1, prec, (), mm=use_mm1
            )
            ar, ai = xla_fft.complex_mul(ar, ai, tws[0][...], tws[1][...])
            Sr[pl.ds(par + s * t1, t1), :] = ar
            Si[pl.ds(par + s * t1, t1), :] = ai

        @pl.when((r > 0) & (s < nB))
        def _phase_b():
            col = pl.multiple_of(s * t2, t2)
            br = Sr[pl.ds(alt, g2), pl.ds(col, t2)]
            bi_ = Si[pl.ds(alt, g2), pl.ds(col, t2)]
            cr, ci = pg._lane_dft(
                br.T, bi_.T, g2p, tabs2, prec, (), mm=use_mm2
            )
            for jj in range(g2 // 128):
                sl = slice(jj * 128, (jj + 1) * 128)
                s2[0::2, :] = cr[:, sl]
                s2[1::2, :] = ci[:, sl]
                o_ref[0, sl, :] = s2[...].T

    tabs = [arrs[nm] for nm in names1]
    if not shared:
        tabs += [arrs[nm] for nm in names2]

    def call(raw):
        x3 = raw.reshape(batch, g1, 2 * g2)
        out = pl.pallas_call(
            kern,
            grid=(batch + 1, S),
            in_specs=[in_spec] + [pg._const(t) for t in tabs]
            + [tw_spec, tw_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
            scratch_shapes=[
                pltpu.VMEM((2 * t1, 128), raw.dtype),
                pltpu.VMEM((t1, g1), raw.dtype),
                pltpu.VMEM((t1, g1), raw.dtype),
                pltpu.VMEM((2 * t2, 128), raw.dtype),
                pltpu.VMEM((2 * g2, g1), raw.dtype),
                pltpu.VMEM((2 * g2, g1), raw.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=8 * batch * n * (g1 + g2),
                bytes_accessed=2 * raw.shape[0] * 4,
                transcendentals=0,
            ),
            interpret=jax.default_backend() != "tpu",
        )(x3, *tabs, *tw_arrays)
        return out.reshape(raw.shape[0])

    return call


def main():
    argv = [int(a) for a in sys.argv[1:]]
    n = argv[0] if argv else 1 << 17
    g1 = argv[1] if len(argv) > 1 else 512
    g2 = argv[2] if len(argv) > 2 else n // g1
    batch = argv[3] if len(argv) > 3 else max(1, (1 << 27) // n)
    cfg = DeviceConfig()
    print(f"probe_pipe n={n} g={g1}x{g2} batch={batch}", flush=True)

    sub1, sub2 = plan_1d(g1, cfg, 4), plan_1d(g2, cfg, 4)
    plan = Plan1D(n=n, level=Level.GLOBAL, factors=[], sub=(sub1, sub2))
    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, -1, bank)
    arrs = bank.device_arrays()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    gb = 2 * batch * n * 4 * 2 / 1e9
    on_tpu = jax.default_backend() == "tpu"

    # --- tile race on the committed eng-6 kernel ---
    for t1 in (64, 128, 256) if on_tpu else ():
        if g2 % t1:
            continue
        for t2 in (128, 256):
            if g1 % t2:
                continue
            try:
                fn = build_variant(
                    plan, batch, keys, arrs, cfg, t1, t2,
                    dft_a=True, dft_b=True, twiddle=True,
                )
                t = dev_time(fn, x)
                print(
                    f"  full t1={t1:3d} t2={t2:3d} {t:8.3f} ms "
                    f"{gb/(t/1e3):7.1f} GB/s", flush=True,
                )
            except Exception as e:
                print(
                    f"  full t1={t1:3d} t2={t2:3d} FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}", flush=True,
                )

    # --- row-pipelined variant (verified) ---
    vb = min(2, batch)
    ref = np.fft.fft(
        np.asarray(x[: 2 * vb * n]).view(np.complex64).reshape(vb, n),
        axis=1,
    )
    for t1 in (64, 128, 256):
        if g2 % t1:
            continue
        for t2 in (128, 256):
            if g1 % t2:
                continue
            try:
                fn = build_pipe(plan, batch, keys, arrs, cfg, t1, t2)
                t0 = time.perf_counter()
                y = fn(x)
                got = (
                    np.asarray(y[: 2 * vb * n])
                    .view(np.complex64)
                    .reshape(vb, n)
                )
                rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
                ok = "ok " if rel < 1e-4 else f"BAD rel={rel:.1e} "
                if not on_tpu:
                    print(f"  pipe t1={t1:3d} t2={t2:3d} verify {ok}",
                          flush=True)
                    continue
                t = dev_time(fn, x)
                print(
                    f"  pipe t1={t1:3d} t2={t2:3d} {t:8.3f} ms "
                    f"{gb/(t/1e3):7.1f} GB/s  {ok}"
                    f"(compile+verify {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"  pipe t1={t1:3d} t2={t2:3d} FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}", flush=True,
                )


if __name__ == "__main__":
    main()
