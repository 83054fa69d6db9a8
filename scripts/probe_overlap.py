"""Decompose the eng-5 single-pass kernel's time at N=65536 and probe
widened-Karatsuba matmul forms.

Round-4 question: the ladder plateaus at 43-74% of the session streaming
ceiling; probe_mxu_shapes showed the (256,256)@(256,256) Karatsuba
matmuls run at 16-21% MXU efficiency (per-invocation overhead dominates:
big_ref hits 512 TFLOP/s).  Two suspects and their tests:

  A. poor DMA/compute overlap in the real kernel (VMEM pressure killing
     double-buffering):
       dma_sq       copy-only kernel, eng-5's exact block specs
       sq_pin(bt)   the eng-5 body with in/out index maps PINNED to block
                    0 -> no per-step HBM streaming = compute-only time
       sq_vpu(bt)   de/interleave + transposes only, matmuls/twiddle cut
                    -> VPU + DMA time
       sq_full(bt)  the real kernel
     overlap quality = sq_full vs max(dma_sq, sq_pin).

  B. matmul invocation overhead (weight-load/drain per small matmul):
       kara9_mM     current form: 9 independent (M,256)@(256,256)
       kara3k_mM    K-stacked: 3 x (M,768)@(768,256) — the three x3
                    precision terms ride one contraction (same FLOPs)
       kara1_mM     fully stacked: 1 x (M,2304)@(2304,512) — Karatsuba
                    replaced by a sign-folded block weight producing
                    (yr|yi) in one matmul (2x FLOPs, 1 invocation)
     at M in {512, 2048}; each rep's matmuls are independent (models one
     grid step), a scalar carry links reps (defeats DCE).
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
from portfft_tpu.ops.pallas_fft import kara_matmul_last  # noqa: E402

REPS = 16
GRID = 32


def mm_case(name, mk_inputs, body, flops_per_rep):
    xs = mk_inputs()
    specs = [
        pl.BlockSpec(x.shape, (lambda *_, nd=x.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for x in xs
    ]

    def kern(*refs):
        ins = [r[...] for r in refs[:-1]]
        o_ref = refs[-1]
        acc = jnp.float32(0)
        for _ in range(REPS):
            y = body([ins[0] + acc.astype(ins[0].dtype)] + ins[1:])
            acc = y.reshape(-1)[0]
        o_ref[0, 0] = acc

    def fn():
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(*xs)

    return name, jax.jit(fn), flops_per_rep * REPS * GRID, None


def main():
    n, batch = 65536, 2048
    g1 = g2 = 256
    print("device:", jax.devices()[0].device_kind, flush=True)

    bank = xla_fft.TwiddleBank(np.float32)
    w = bank.dft(g1, -1)
    wk = bank.mat_kara(w)
    twk = bank.twiddle(g1, g2, -1)
    arrs = bank.device_arrays()
    kara = [arrs[wk + str(j)] for j in range(1, 7)]
    twr_, twi_ = arrs[twk + "r"], arrs[twk + "i"]

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    const = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )

    # ---------------- B: matmul forms (VMEM-resident) ----------------------
    def bf(*shape):
        return jnp.asarray(
            rng.uniform(-1, 1, shape).astype(np.float32)
        ).astype(jnp.bfloat16)

    cases = []
    for M in (512, 2048):
        cases.append(mm_case(
            f"kara9_m{M}",
            lambda M=M: [bf(M, 256)] + [bf(256, 256) for _ in range(9)],
            lambda xs: sum(
                jnp.matmul(xs[0], w_, preferred_element_type=jnp.float32)
                for w_ in xs[1:]
            ),
            9 * 2 * M * 256 * 256,
        ))
        cases.append(mm_case(
            f"kara3k_m{M}",
            lambda M=M: [bf(M, 768)] + [bf(768, 256) for _ in range(3)],
            lambda xs: sum(
                jnp.matmul(xs[0], w_, preferred_element_type=jnp.float32)
                for w_ in xs[1:]
            ),
            3 * 2 * M * 768 * 256,
        ))
        cases.append(mm_case(
            f"kara1_m{M}",
            lambda M=M: [bf(M, 2304), bf(2304, 512)],
            lambda xs: jnp.matmul(
                xs[0], xs[1], preferred_element_type=jnp.float32
            ),
            2 * M * 2304 * 512,
        ))

    # ---------------- A: kernel decomposition ------------------------------
    def sq_kernel(bt, pin=False, vpu_only=False, mm_only=False):
        def kern(x_ref, q1, q2, q3, q4, q5, q6, tr, ti,
                 o_ref, s3, pr, pi, s2):
            qs = (q1, q2, q3, q4, q5, q6)
            if not mm_only:
                for b in range(bt):
                    for j in range(g1 // 128):
                        sl = slice(j * 128, (j + 1) * 128)
                        s3[...] = x_ref[b, sl, :].T
                        pr[b, :, sl] = s3[0::2, :]
                        pi[b, :, sl] = s3[1::2, :]
            else:
                pr[...] = x_ref[...][:, :, :g1]
                pi[...] = x_ref[...][:, :, g1:]
            if vpu_only:
                cr = jnp.swapaxes(pr[...], -2, -1)
                ci = jnp.swapaxes(pi[...], -2, -1)
            else:
                p2r = pr[...].reshape(bt * g2, g1)
                p2i = pi[...].reshape(bt * g2, g1)
                ar, ai = kara_matmul_last(p2r, p2i, qs)
                ar = ar.reshape(bt, g2, g1)
                ai = ai.reshape(bt, g2, g1)
                ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
                ar = jnp.swapaxes(ar, -2, -1)
                ai = jnp.swapaxes(ai, -2, -1)
                cr, ci = kara_matmul_last(
                    ar.reshape(bt * g1, g2), ai.reshape(bt * g1, g2), qs
                )
                cr = cr.reshape(bt, g1, g2)
                ci = ci.reshape(bt, g1, g2)
            if not mm_only:
                for b in range(bt):
                    for j in range(g2 // 128):
                        sl = slice(j * 128, (j + 1) * 128)
                        s2[0::2, :] = cr[b][:, sl]
                        s2[1::2, :] = ci[b][:, sl]
                        o_ref[b, sl, :] = s2[...].T
            else:
                o_ref[...] = jnp.concatenate([cr, ci], axis=-1)

        if pin:
            spec_in = pl.BlockSpec((bt, g1, 2 * g2), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
            spec_out = pl.BlockSpec((bt, g2, 2 * g1), lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
        else:
            spec_in = pl.BlockSpec((bt, g1, 2 * g2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
            spec_out = pl.BlockSpec((bt, g2, 2 * g1), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)

        def fn(v):
            return pl.pallas_call(
                kern,
                grid=(batch // bt,),
                in_specs=[spec_in] + [const(t) for t in kara]
                + [const(twr_), const(twi_)],
                out_specs=spec_out,
                out_shape=jax.ShapeDtypeStruct(
                    (batch, g2, 2 * g1), jnp.float32
                ),
                scratch_shapes=[
                    pltpu.VMEM((2 * g2, 128), jnp.float32),
                    pltpu.VMEM((bt, g2, g1), jnp.float32),
                    pltpu.VMEM((bt, g2, g1), jnp.float32),
                    pltpu.VMEM((2 * g1, 128), jnp.float32),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=8 * batch * n * (g1 + g2),
                    bytes_accessed=2 * 2 * batch * n * 4,
                    transcendentals=0,
                ),
            )(v.reshape(batch, g1, 2 * g2), *kara, twr_, twi_)

        return fn

    in1 = pl.BlockSpec((1, g1, 2 * g2), lambda bi: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    out1 = pl.BlockSpec((1, g2, 2 * g1), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)

    def dma_kern(x_ref, or_ref):
        or_ref[...] = x_ref[...].reshape(or_ref.shape)

    def dma_sq(v):
        return pl.pallas_call(
            dma_kern,
            grid=(batch,),
            in_specs=[in1],
            out_specs=out1,
            out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), jnp.float32),
        )(v.reshape(batch, g1, 2 * g2))

    for bt in (1, 2, 4):
        cases.append((f"sq_full_bt{bt}", jax.jit(sq_kernel(bt)), None, raw))
        cases.append((
            f"sq_pin_bt{bt}", jax.jit(sq_kernel(bt, pin=True)), None, raw
        ))
    cases.append(("sq_vpu_bt2", jax.jit(sq_kernel(2, vpu_only=True)),
                  None, raw))
    cases.append(("dma_sq", jax.jit(dma_sq), None, raw))

    warm = []
    for name, fn, fl, arg in cases:
        try:
            t0 = time.perf_counter()
            r = fn(arg) if arg is not None else fn()
            jax.device_get(r.ravel()[0:1])
            warm.append((name, fn, fl, arg))
            print(f"warm {name:14s} {time.perf_counter() - t0:6.1f} s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)

    gb_eff = 2 * batch * n * 4 * 2 / 1e9
    best = {}
    for _ in range(3):
        for name, fn, fl, arg in warm:
            iters = 4 if arg is not None else 4
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(arg) if arg is not None else fn()
            jax.device_get(r.ravel()[0:1])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(2 * iters):
                r = fn(arg) if arg is not None else fn()
            jax.device_get(r.ravel()[0:1])
            t2 = time.perf_counter() - t0
            t = (t2 - t1) / iters if t2 > t1 else t2 / (2 * iters)
            if name not in best or t < best[name][0]:
                best[name] = (t, fl)
    for name, (t, fl) in best.items():
        tail = (f"{fl/t/1e12:7.2f} TFLOP/s" if fl
                else f"{gb_eff/t:7.1f} GB/s(effective)")
        print(f"{name:14s} {t*1e3:8.3f} ms  {tail}", flush=True)


if __name__ == "__main__":
    main()
