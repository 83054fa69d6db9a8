"""Engine pass-1 optimization probe at N=65536: Karatsuba + ILP variants.

Builds on probe_engine_parts.py findings (p1 full 174 GB/s-pass, no_dft
204, DMA ceiling ~295): the matmul costs ~1.8 ms/pass and the non-matmul
floor is ~10.5 ms vs the 7.3 ms DMA bound — compute chains are serialized.

  p1_base      current 4-product x3 complex matmul (12 bf16 MXU ops)
  p1_kara      Karatsuba 3-product x3, shared input splits, pre-split
               bf16 tables (9 MXU ops, less VPU)
  p1_ilp2      current math, block split into 2 independent half-tiles
               (deint_B can overlap matmul_A)
  p1_kara_ilp2 both
  p1_copy      deint + store only, no compute at all (config DMA+XPOSE cap)
  p2_base      current pass 2
  p2_kara      Karatsuba pass 2
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

f32 = jnp.float32
bf = jnp.bfloat16


def split2(x):
    h = x.astype(bf)
    return h, (x - h.astype(f32)).astype(bf)


def mm3(ah, al, bh, bl):
    out = jnp.matmul(ah, bh, preferred_element_type=f32)
    out = out + jnp.matmul(ah, bl, preferred_element_type=f32)
    return out + jnp.matmul(al, bh, preferred_element_type=f32)


def kara_mm(xr, xi, tabs):
    """3-product complex matmul; tabs = (wrh, wrl, wih, wil, wsh, wsl)."""
    wrh, wrl, wih, wil, wsh, wsl = tabs
    xrh, xrl = split2(xr)
    xih, xil = split2(xi)
    xsh, xsl = split2(xr + xi)
    rr = mm3(xrh, xrl, wrh, wrl)
    ii = mm3(xih, xil, wih, wil)
    m = mm3(xsh, xsl, wsh, wsl)
    return rr - ii, m - rr - ii


def x3_mm(xr, xi, wr, wi):
    return xla_fft.complex_matmul_last(xr, xi, wr, wi, "x3")


def measure_all(cases, args_of, iters=8, rounds=3):
    warm = []
    for name, fn in cases:
        try:
            r = fn(*args_of(name))
            jax.device_get(r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                           else r.ravel()[0:1])
            warm.append((name, fn))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)
    best = {}
    for _ in range(rounds):
        for name, fn in warm:
            a = args_of(name)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*a)
            jax.device_get(r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                           else r.ravel()[0:1])
            best[name] = min(best.get(name, 1e9),
                             (time.perf_counter() - t0) / iters)
    return best


def main():
    n, batch = 65536, 2048
    g1 = g2 = 256
    t1 = t2 = 256
    print("device:", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    wc = np.exp(-2j * np.pi * np.outer(np.arange(g1), np.arange(g1)) / g1)
    wr = np.float32(wc.real)
    wi = np.float32(wc.imag)
    ws = wr + wi

    def presplit(m):
        h = m.astype(np.float32).astype(jnp.bfloat16)
        l = (m - np.asarray(h, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(h), jnp.asarray(l)

    wrh, wrl = presplit(wr)
    wih, wil = presplit(wi)
    wsh, wsl = presplit(ws)
    wr_, wi_ = jnp.asarray(wr), jnp.asarray(wi)
    twc = np.exp(
        -2j * np.pi * np.outer(np.arange(g2), np.arange(g1)) / n
    )
    twr_, twi_ = jnp.asarray(np.float32(twc.real)), jnp.asarray(
        np.float32(twc.imag))

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

    def deint(x_ref, s3, pr, pi, lanes=slice(None)):
        for j in range(g1 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s3[...] = x_ref[0, sl, lanes].T
            pr[:, sl] = s3[0::2, :]
            pi[:, sl] = s3[1::2, :]

    def p1_base_kern(x_ref, wr, wi, tr, ti, or_ref, oi_ref, s3, pr, pi):
        deint(x_ref, s3, pr, pi)
        ar, ai = x3_mm(pr[...], pi[...], wr[...], wi[...])
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
        or_ref[0] = ar
        oi_ref[0] = ai

    def p1_kara_kern(x_ref, *refs):
        tabs = refs[:6]
        tr, ti = refs[6], refs[7]
        or_ref, oi_ref = refs[8], refs[9]
        s3, pr, pi = refs[10], refs[11], refs[12]
        deint(x_ref, s3, pr, pi)
        ar, ai = kara_mm(pr[...], pi[...], [t[...] for t in tabs])
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
        or_ref[0] = ar
        oi_ref[0] = ai

    def p1_ilp2_kern(x_ref, wr, wi, tr, ti, or_ref, oi_ref, s3, pr, pi):
        h = t1 // 2
        for c in range(2):
            lanes = slice(c * 2 * h, (c + 1) * 2 * h)
            rows = slice(c * h, (c + 1) * h)
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[0 : 2 * h] = x_ref[0, sl, lanes].T
                pr[rows, sl] = s3[0 : 2 * h : 2, :]
                pi[rows, sl] = s3[1 : 2 * h : 2, :]
            ar, ai = x3_mm(pr[rows], pi[rows], wr[...], wi[...])
            ar, ai = xla_fft.complex_mul(
                ar, ai, tr[rows, :], ti[rows, :]
            )
            or_ref[0, rows] = ar
            oi_ref[0, rows] = ai

    def p1_kara_ilp2_kern(x_ref, *refs):
        tabs = refs[:6]
        tr, ti = refs[6], refs[7]
        or_ref, oi_ref = refs[8], refs[9]
        s3, pr, pi = refs[10], refs[11], refs[12]
        h = t1 // 2
        tv = [t[...] for t in tabs]
        for c in range(2):
            lanes = slice(c * 2 * h, (c + 1) * 2 * h)
            rows = slice(c * h, (c + 1) * h)
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[0 : 2 * h] = x_ref[0, sl, lanes].T
                pr[rows, sl] = s3[0 : 2 * h : 2, :]
                pi[rows, sl] = s3[1 : 2 * h : 2, :]
            ar, ai = kara_mm(pr[rows], pi[rows], tv)
            ar, ai = xla_fft.complex_mul(ar, ai, tr[rows, :], ti[rows, :])
            or_ref[0, rows] = ar
            oi_ref[0, rows] = ai

    def p1_copy_kern(x_ref, wr, wi, tr, ti, or_ref, oi_ref, s3, pr, pi):
        deint(x_ref, s3, pr, pi)
        or_ref[0] = pr[...]
        oi_ref[0] = pi[...]

    def build_p1(kern, kara):
        tabs = ([wrh, wrl, wih, wil, wsh, wsl] if kara else [wr_, wi_])

        def fn(v):
            return pl.pallas_call(
                kern,
                grid=(batch, g2 // t1),
                in_specs=[in1] + [const(t) for t in tabs]
                + [tw_spec, tw_spec],
                out_specs=[out1, out1],
                out_shape=[jax.ShapeDtypeStruct((batch, g2, g1), f32)] * 2,
                scratch_shapes=[
                    pltpu.VMEM((2 * t1, 128), f32),
                    pltpu.VMEM((t1, g1), f32),
                    pltpu.VMEM((t1, g1), f32),
                ],
            )(v.reshape(batch, g1, 2 * g2), *tabs, twr_, twi_)

        return jax.jit(fn)

    in2 = pl.BlockSpec((1, g2, t2), lambda bi, ji: (bi, 0, ji),
                       memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((1, g2, 2 * t2), lambda bi, ji: (bi, 0, ji),
                        memory_space=pltpu.VMEM)

    def p2_base_kern(xr_ref, xi_ref, wr, wi, o_ref, s2):
        cr, ci = x3_mm(xr_ref[0].T, xi_ref[0].T, wr[...], wi[...])
        for j in range(g2 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = cr[:, sl]
            s2[1::2, :] = ci[:, sl]
            o_ref[0, sl, :] = s2[...].T

    def p2_kara_kern(xr_ref, xi_ref, *refs):
        tabs = refs[:6]
        o_ref, s2 = refs[6], refs[7]
        cr, ci = kara_mm(xr_ref[0].T, xi_ref[0].T, [t[...] for t in tabs])
        for j in range(g2 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = cr[:, sl]
            s2[1::2, :] = ci[:, sl]
            o_ref[0, sl, :] = s2[...].T

    def build_p2(kern, kara):
        tabs = ([wrh, wrl, wih, wil, wsh, wsl] if kara else [wr_, wi_])

        def fn(a, b):
            return pl.pallas_call(
                kern,
                grid=(batch, g1 // t2),
                in_specs=[in2, in2] + [const(t) for t in tabs],
                out_specs=out2,
                out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), f32),
                scratch_shapes=[pltpu.VMEM((2 * t2, 128), f32)],
            )(a, b, *tabs)

        return jax.jit(fn)

    sr = jnp.zeros((batch, g2, g1), f32)
    si = jnp.zeros((batch, g2, g1), f32)
    cases = [
        ("p1_base", build_p1(p1_base_kern, False)),
        ("p1_kara", build_p1(p1_kara_kern, True)),
        ("p1_ilp2", build_p1(p1_ilp2_kern, False)),
        ("p1_kara_ilp2", build_p1(p1_kara_ilp2_kern, True)),
        ("p1_copy", build_p1(p1_copy_kern, False)),
        ("p2_base", build_p2(p2_base_kern, False)),
        ("p2_kara", build_p2(p2_kara_kern, True)),
    ]

    def args_of(name):
        return (sr, si) if name.startswith("p2") else (raw,)

    best = measure_all(cases, args_of)
    gb = 2 * batch * n * 4 * 2 / 1e9
    for name, t in best.items():
        print(f"{name:14s} {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s(pass)",
              flush=True)

    # numeric check of kara vs base (values should agree to ~1e-5)
    a = build_p1(p1_base_kern, False)(raw)
    b = build_p1(p1_kara_kern, True)(raw)
    d = float(jnp.max(jnp.abs(a[0] - b[0])))
    m = float(jnp.max(jnp.abs(a[0])))
    print(f"kara vs base max abs diff {d:.3e} (max {m:.3e})", flush=True)


if __name__ == "__main__":
    main()
