"""Decompose the two-pass engine's time at N=65536: which stage costs.

Runs pass-1 and pass-2 in isolation and with individual stages disabled
(results are numerically wrong for the ablated variants — this measures
time, not values).  All variants move identical HBM traffic, so the GB/s
deltas isolate VPU/XPOSE/MXU costs:

  p1_full    deinterleave loop + G1 matmul + twiddle mul
  p1_no_tw   ... without the twiddle multiply (and its table stream)
  p1_no_dft  deinterleave + twiddle only (no matmul)
  p1_no_deint  matmul + twiddle on the raw block reinterpreted as planes
  p2_full    input transpose + G2 matmul + reinterleave loop
  p2_no_reint  ... writing the planes straight (no reinterleave)
  p2_no_dft  transpose + reinterleave only
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
from portfft_tpu.ops import xla_fft  # noqa: E402
from portfft_tpu.ops.pallas_fft import _kernel_precision  # noqa: E402


def measure(fn, *args, iters=10):
    r = fn(*args)
    jax.device_get(r[0].ravel()[0:1] if isinstance(r, (tuple, list)) else
                   r.ravel()[0:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.device_get(r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                       else r.ravel()[0:1])
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    n, batch = 65536, 2048
    g1 = g2 = 256
    t1 = t2 = 256
    prec = _kernel_precision(None)
    print("device:", jax.devices()[0].device_kind, flush=True)

    bank = xla_fft.TwiddleBank(np.float32)
    w = bank.dft(g1, -1)
    tw = bank.twiddle(g1, g2, -1)
    arrs = bank.device_arrays()
    wr_, wi_ = arrs[w + "r"], arrs[w + "i"]
    twr_, twi_ = arrs[tw + "r"], arrs[tw + "i"]

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    const = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )

    in1 = pl.BlockSpec((1, g1, 2 * t1), lambda bi, ti: (bi, 0, ti),
                       memory_space=pltpu.VMEM)
    out1 = pl.BlockSpec((1, t1, g1), lambda bi, ti: (bi, ti, 0),
                        memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((t1, g1), lambda bi, ti: (ti, 0),
                           memory_space=pltpu.VMEM)

    def p1_kernel(deint, dft, twm):
        def kern(x_ref, wr, wi, tr, ti, or_ref, oi_ref, s3, pr, pi):
            if deint:
                for j in range(g1 // 128):
                    sl = slice(j * 128, (j + 1) * 128)
                    s3[...] = x_ref[0, sl, :].T
                    pr[:, sl] = s3[0::2, :]
                    pi[:, sl] = s3[1::2, :]
                xr, xi = pr[...], pi[...]
            else:
                # reinterpret halves of the raw block as planes (wrong
                # values, right shapes/traffic)
                xr = x_ref[0, :, :t1].T
                xi = x_ref[0, :, t1:].T
            if dft:
                ar, ai = xla_fft.complex_matmul_last(
                    xr, xi, wr[...], wi[...], prec
                )
            else:
                ar, ai = xr, xi
            if twm:
                ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
            or_ref[0] = ar
            oi_ref[0] = ai

        return kern

    x3 = raw.reshape(batch, g1, 2 * g2)

    def build_p1(deint, dft, twm):
        def fn(v):
            return pl.pallas_call(
                p1_kernel(deint, dft, twm),
                grid=(batch, g2 // t1),
                in_specs=[in1, const(wr_), const(wi_), tw_spec, tw_spec],
                out_specs=[out1, out1],
                out_shape=[
                    jax.ShapeDtypeStruct((batch, g2, g1), jnp.float32)
                ] * 2,
                scratch_shapes=[
                    pltpu.VMEM((2 * t1, 128), jnp.float32),
                    pltpu.VMEM((t1, g1), jnp.float32),
                    pltpu.VMEM((t1, g1), jnp.float32),
                ],
            )(v.reshape(batch, g1, 2 * g2), wr_, wi_, twr_, twi_)

        return jax.jit(fn)

    in2 = pl.BlockSpec((1, g2, t2), lambda bi, ji: (bi, 0, ji),
                       memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((1, g2, 2 * t2), lambda bi, ji: (bi, 0, ji),
                        memory_space=pltpu.VMEM)

    def p2_kernel(dft, reint):
        def kern(xr_ref, xi_ref, wr, wi, o_ref, s2):
            xr = xr_ref[0].T
            xi = xi_ref[0].T
            if dft:
                cr, ci = xla_fft.complex_matmul_last(
                    xr, xi, wr[...], wi[...], prec
                )
            else:
                cr, ci = xr, xi
            if reint:
                for j in range(g2 // 128):
                    sl = slice(j * 128, (j + 1) * 128)
                    s2[0::2, :] = cr[:, sl]
                    s2[1::2, :] = ci[:, sl]
                    o_ref[0, sl, :] = s2[...].T
            else:
                o_ref[0, :, :t2] = cr.T
                o_ref[0, :, t2:] = ci.T

        return kern

    sr = jnp.zeros((batch, g2, g1), jnp.float32)
    si = jnp.zeros((batch, g2, g1), jnp.float32)

    def build_p2(dft, reint):
        def fn(a, b):
            return pl.pallas_call(
                p2_kernel(dft, reint),
                grid=(batch, g1 // t2),
                in_specs=[in2, in2, const(wr_), const(wi_)],
                out_specs=out2,
                out_shape=jax.ShapeDtypeStruct(
                    (batch, g2, 2 * g1), jnp.float32
                ),
                scratch_shapes=[pltpu.VMEM((2 * t2, 128), jnp.float32)],
            )(a, b, wr_, wi_)

        return jax.jit(fn)

    gb = 2 * batch * n * 4 * 2 / 1e9  # read+write GB per pass
    cases = [
        ("p1_full", build_p1(True, True, True), (raw,)),
        ("p1_no_tw", build_p1(True, True, False), (raw,)),
        ("p1_no_dft", build_p1(True, False, True), (raw,)),
        ("p1_no_deint", build_p1(False, True, True), (raw,)),
        ("p2_full", build_p2(True, True), (sr, si)),
        ("p2_no_reint", build_p2(True, False), (sr, si)),
        ("p2_no_dft", build_p2(False, True), (sr, si)),
    ]
    # compile+warm all, then round-robin bursts (rate drifts)
    warm = []
    for name, fn, args in cases:
        try:
            r = fn(*args)
            jax.device_get(
                r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                else r.ravel()[0:1]
            )
            warm.append((name, fn, args))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)
    best = {}
    for _ in range(3):
        for name, fn, args in warm:
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(*args)
            jax.device_get(
                r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                else r.ravel()[0:1]
            )
            t = (time.perf_counter() - t0) / 8
            best[name] = min(best.get(name, 1e9), t)
    for name, t in best.items():
        print(f"{name:14s} {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s(pass)",
              flush=True)


if __name__ == "__main__":
    main()
