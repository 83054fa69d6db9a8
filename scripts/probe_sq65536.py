"""Single-pass square kernel vs the two-pass engine at N=65536 (mm era).

The round-2 square-kernel loss (95 vs 107 GB/s) was attributed to
serialized XPOSE work; the round-3 ablation overturned that diagnosis —
the family is MATMUL-bound and the mm kernels (kstack/Karatsuba) cut the
matmul cost ~25%.  At equal total MXU flops a single pass moves HALF the
HBM bytes of two passes, so the square kernel deserves a re-test with
Karatsuba stages.  Also measures:

  dma_p1      copy-only kernel with pass-1's exact BlockSpecs — the true
              DMA ceiling of the engine's access pattern (the bench's flat
              copy probe measures a different, friendlier pattern)
  two_pass    the shipped tuned engine path (eng 2 + mm lane-DFTs)
  sq1 / sq2   single-pass square kernel, batch tile 1 / 2
  sq1_ds      sq1 with dimension_semantics=("arbitrary",)
  two_pass_ds engine passes with dimension_semantics=("parallel","arbitrary")

Round-robin burst timing (chip rate drifts in-process; adjacent
measurements only).
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


def main():
    n, batch = 65536, 2048
    g1 = g2 = 256
    t1 = t2 = 256
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

    # ---------------- dma_p1: copy-only with pass-1's block specs ----------
    in1 = pl.BlockSpec((1, g1, 2 * t1), lambda bi, ti: (bi, 0, ti),
                       memory_space=pltpu.VMEM)
    out1 = pl.BlockSpec((1, t1, g1), lambda bi, ti: (bi, ti, 0),
                        memory_space=pltpu.VMEM)

    def dma_kern(x_ref, or_ref, oi_ref):
        or_ref[0] = x_ref[0, :, :t1]
        oi_ref[0] = x_ref[0, :, t1:]

    def dma_p1(v):
        return pl.pallas_call(
            dma_kern,
            grid=(batch, g2 // t1),
            in_specs=[in1],
            out_specs=[out1, out1],
            out_shape=[jax.ShapeDtypeStruct((batch, g2, g1), jnp.float32)] * 2,
        )(v.reshape(batch, g1, 2 * g2))

    # ---------------- single-pass square kernel ---------------------------
    def sq_kernel(bt, ds):
        def kern(x_ref, q1, q2, q3, q4, q5, q6, tr, ti, o_ref, s3, pr, pi, s2):
            for b in range(bt):
                # deinterleave (pass-1 style): planes land [n2, n1]
                for j in range(g1 // 128):
                    sl = slice(j * 128, (j + 1) * 128)
                    s3[...] = x_ref[b, sl, :].T  # (2g2, 128)
                    pr[b, :, sl] = s3[0::2, :]   # (g2, 128) = [n2, n1-sl]
                    pi[b, :, sl] = s3[1::2, :]
            # stage A: contract n1 -> A[n2, k1]
            ar, ai = kara_matmul_last(pr[...], pi[...], (q1, q2, q3, q4, q5, q6))
            # twiddle, bank layout (m=g2, f=g1) = [n2, k1]
            ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
            # stage B: contract n2 -> C[k1, k2]
            ar = jnp.swapaxes(ar, -2, -1)
            ai = jnp.swapaxes(ai, -2, -1)
            cr, ci = kara_matmul_last(ar, ai, (q1, q2, q3, q4, q5, q6))
            # reinterleave (pass-2 style): out rows k2, lanes 2k1+p
            for b in range(bt):
                for j in range(g2 // 128):
                    sl = slice(j * 128, (j + 1) * 128)
                    s2[0::2, :] = cr[b][:, sl]  # (2g1, 128)
                    s2[1::2, :] = ci[b][:, sl]
                    o_ref[b, sl, :] = s2[...].T  # (128, 2g1)

        spec_in = pl.BlockSpec((bt, g1, 2 * g2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((bt, g2, 2 * g1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        params = {}
        if ds:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            )

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
                **params,
            )(v.reshape(batch, g1, 2 * g2), *kara, twr_, twi_)

        return fn

    # ---------------- shipped two-pass engine ------------------------------
    from portfft_tpu.config import resolve_device_config
    from portfft_tpu.planner import plan_1d
    from portfft_tpu.ops import pallas_global

    cfg = resolve_device_config()
    plan = plan_1d(n, cfg, 4)
    print("plan:", plan.describe(), flush=True)
    keys = xla_fft.collect_bank_keys(plan, -1, bank)
    arrs = bank.device_arrays()

    def two_pass(v):
        return pallas_global.global2_raw_call(
            v, batch, plan, -1, keys, arrs, cfg,
            t1_override=t1, t2_override=t2,
        )

    # correctness spot check (first transform) for sq1
    sq1 = jax.jit(sq_kernel(1, False))
    out = sq1(raw)
    got = np.asarray(jax.device_get(out[0]))
    flat = got.reshape(-1)
    z = flat[0::2] + 1j * flat[1::2]
    ref = np.fft.fft(
        np.asarray(raw[: 2 * n :2]) + 1j * np.asarray(raw[1 : 2 * n : 2])
    )
    rel = np.linalg.norm(z[:n] - ref) / np.linalg.norm(ref)
    print(f"sq1 rel_err={rel:.2e}", flush=True)

    def sq_lib(v):
        return pallas_global.global_sq_raw_call(
            v, batch, plan, -1, keys, arrs, cfg, bt_override=1
        )

    cases = [
        ("dma_p1", jax.jit(dma_p1)),
        ("two_pass", jax.jit(two_pass)),
        ("sq1", sq1),
        ("sq2", jax.jit(sq_kernel(2, False))),
        ("sq1_ds", jax.jit(sq_kernel(1, True))),
        ("sq_lib", jax.jit(sq_lib)),
    ]
    warm = []
    for name, fn in cases:
        try:
            r = fn(raw)
            jax.device_get(
                r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                else r.ravel()[0:1]
            )
            warm.append((name, fn))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)
    gb_eff = 2 * batch * n * 4 * 2 / 1e9  # in+out effective bytes
    best = {}
    for _ in range(3):
        for name, fn in warm:
            t0 = time.perf_counter()
            for _ in range(6):
                r = fn(raw)
            jax.device_get(
                r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                else r.ravel()[0:1]
            )
            t = (time.perf_counter() - t0) / 6
            best[name] = min(best.get(name, 1e9), t)
    for name, t in best.items():
        print(f"{name:12s} {t*1e3:8.3f} ms  {gb_eff/t:7.1f} GB/s(effective)",
              flush=True)


if __name__ == "__main__":
    main()
