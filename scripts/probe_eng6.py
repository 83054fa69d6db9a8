#!/usr/bin/env python
"""Attribute the fused GLOBAL engine's (eng 6) time at a ladder size.

Every variant moves the same HBM traffic through the same two-phase
persistent-scratch structure (grid (batch, nA+nB), clamped block maps),
with compute stages selectively disabled — the time deltas isolate what
binds the kernel (results are numerically wrong for ablated variants):

  full       deint + lane-DFT(G1) + twiddle -> scratch; scratch ->
             lane-DFT(G2) + reint
  no_tw      full without the twiddle multiply AND without streaming the
             dense (t1, g1) twiddle table (~ the ftw upper bound)
  no_dftA    phase A stores the deinterleaved planes unchanged
  no_dftB    phase B reinterleaves the scratch slice unchanged
  no_dft     both DFTs skipped: pure two-phase data movement
  stream     plain copy kernel, same block shapes, no scratch/phases
             (the I/O ceiling for this block pattern)

Timing: R-vs-2R chained executions (lax.fori_loop) — pure device time.

Usage: python scripts/probe_eng6.py [n] [g1] [g2] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

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


def build_variant(
    plan, batch, keys, arrs, cfg, t1, t2, *, dft_a=True, dft_b=True,
    twiddle=True,
):
    """The eng-6 kernel with stages toggled (DIRECT x DIRECT G1/G2)."""
    n = plan.n
    g1p, g2p = plan.sub
    g1, g2 = g1p.n, g2p.n
    prec = pg._kernel_precision(None)
    mm_ok = pg.mm_enabled(prec)
    names1, use_mm1 = pg.sub_tables(g1p, -1, keys, mm_ok)
    names2, use_mm2 = pg.sub_tables(g2p, -1, keys, mm_ok)
    nA, nB = g2 // t1, g1 // t2

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
    tw_arrays, tw_specs = [], []
    if twiddle:
        tw = keys[("T", g1, g2, -1)]
        tw_arrays = [arrs[tw + "r"], arrs[tw + "i"]]
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

    def kern(x_ref, *rest):
        tabs1 = rest[:nt1]
        tabs2 = tabs1 if shared else rest[nt1 : nt1 + nt2]
        tws = rest[nt1 + nt2 : nt1 + nt2 + ntw]
        o_ref = rest[nt1 + nt2 + ntw]
        sc = rest[nt1 + nt2 + ntw + 1 :]
        s3, pr, pi, s2, Sr, Si = sc[:6]
        s = pl.program_id(1)

        @pl.when(s < nA)
        def _phase_a():
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[0, sl, :].T
                pr[:, sl] = s3[0::2, :]
                pi[:, sl] = s3[1::2, :]
            if dft_a:
                ar, ai = pg._lane_dft(
                    pr[...], pi[...], g1p, tabs1, prec, (), mm=use_mm1
                )
            else:
                ar, ai = pr[...], pi[...]
            if twiddle:
                ar, ai = xla_fft.complex_mul(
                    ar, ai, tws[0][...], tws[1][...]
                )
            Sr[pl.ds(s * t1, t1), :] = ar
            Si[pl.ds(s * t1, t1), :] = ai

        @pl.when(s >= nA)
        def _phase_b():
            j = jnp.maximum(s - nA, 0)
            col = pl.multiple_of(j * t2, t2)
            br = Sr[:, pl.ds(col, t2)]
            bi_ = Si[:, pl.ds(col, t2)]
            if dft_b:
                cr, ci = pg._lane_dft(
                    br.T, bi_.T, g2p, tabs2, prec, (), mm=use_mm2
                )
            else:
                cr, ci = br.T, bi_.T
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
            grid=(batch, nA + nB),
            in_specs=[in_spec] + [pg._const(t) for t in tabs] + tw_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), raw.dtype),
            scratch_shapes=[
                pltpu.VMEM((2 * t1, 128), raw.dtype),
                pltpu.VMEM((t1, g1), raw.dtype),
                pltpu.VMEM((t1, g1), raw.dtype),
                pltpu.VMEM((2 * t2, 128), raw.dtype),
                pltpu.VMEM((g2, g1), raw.dtype),
                pltpu.VMEM((g2, g1), raw.dtype),
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


def build_stream(batch, g1, g2, t1):
    """Plain copy, same (1, g1, 2*t1) blocks over the same grid extent."""
    nA = g2 // t1

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def call(raw):
        x3 = raw.reshape(batch, g1, 2 * g2)
        out = pl.pallas_call(
            kern,
            grid=(batch, nA),
            in_specs=[
                pl.BlockSpec(
                    (1, g1, 2 * t1), lambda bi, s: (bi, 0, s),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, g1, 2 * t1), lambda bi, s: (bi, 0, s),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, g1, 2 * g2), raw.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x3)
        return out.reshape(raw.shape[0])

    return call


def dev_time(fn, x, iters=6):
    """R-vs-2R chained device time per application (ms)."""
    chain = jax.jit(
        lambda raw, k: jax.lax.fori_loop(0, k, lambda i, y: fn(y), raw)
    )
    jax.device_get(chain(x, 1).ravel()[0:1])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chain(x, iters).ravel()[0:1])
        t_1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(chain(x, 2 * iters).ravel()[0:1])
        t_2 = time.perf_counter() - t0
        d = (t_2 - t_1) / iters if t_2 > t_1 else t_2 / (2 * iters)
        best = d if best is None or d < best else best
    return best * 1e3


def main():
    argv = [int(a) for a in sys.argv[1:]]
    n = argv[0] if argv else 1 << 17
    g1 = argv[1] if len(argv) > 1 else 512
    g2 = argv[2] if len(argv) > 2 else n // (argv[1] if len(argv) > 1 else 512)
    batch = argv[3] if len(argv) > 3 else max(1, (1 << 27) // n)
    cfg = DeviceConfig()
    print(f"probe_eng6 n={n} g={g1}x{g2} batch={batch}", flush=True)

    sub1, sub2 = plan_1d(g1, cfg, 4), plan_1d(g2, cfg, 4)
    plan = Plan1D(n=n, level=Level.GLOBAL, factors=[], sub=(sub1, sub2))
    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, -1, bank)
    arrs = bank.device_arrays()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    gb = 2 * batch * n * 4 * 2 / 1e9  # in + out

    t1 = 64 if g2 % 64 == 0 else g2
    t2 = 128 if g1 % 128 == 0 else g1
    cases = {
        "full": dict(dft_a=True, dft_b=True, twiddle=True),
        "no_tw": dict(dft_a=True, dft_b=True, twiddle=False),
        "no_dftA": dict(dft_a=False, dft_b=True, twiddle=True),
        "no_dftB": dict(dft_a=True, dft_b=False, twiddle=True),
        "no_dft": dict(dft_a=False, dft_b=False, twiddle=False),
    }
    for name, kw in cases.items():
        try:
            fn = build_variant(
                plan, batch, keys, arrs, cfg, t1, t2, **kw
            )
            t = dev_time(fn, x)
            print(
                f"  {name:8s} t1={t1} t2={t2} {t:8.3f} ms "
                f"{gb/(t/1e3):7.1f} GB/s", flush=True,
            )
        except Exception as e:
            print(f"  {name:8s} FAILED {type(e).__name__}: {e}", flush=True)
    try:
        fn = build_stream(batch, g1, g2, t1)
        t = dev_time(fn, x)
        print(
            f"  stream   t1={t1}        {t:8.3f} ms {gb/(t/1e3):7.1f} GB/s",
            flush=True,
        )
    except Exception as e:
        print(f"  stream   FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
