"""In-kernel A/B of stage-matmul forms for the single-pass square kernel.

probe_overlap established (N=65536, device-time subtraction): the kernel
is pure compute-bound — sq_pin == sq_full ~10 ms vs a 6.2 ms DMA floor
(347 GB/s effective), and the stage matmuls themselves run near MXU peak
when invoked at M>=512.  So the win is cutting the NON-matmul compute:
operand splits, the Karatsuba sum term, the inter-stage swapaxes.

Variants (all bt-batched, one Pallas kernel, same I/O as eng-5):

  sq_base   current form: kara_matmul_last both stages (9 matmuls each,
            xs=ar+ai sum + 6 operand splits), swapaxes between stages
  sq_ks     both stages as ONE (M, 6n) @ (6n, 2n) stacked matmul
            (x3 complex stack, no Karatsuba sum, 4 splits), swapaxes kept
  sq_ksL    stage A stacked-right; stage B LEFT stacked matmul
            (kstack_dft_left) — contracts n2 over sublanes directly, NO
            inter-stage swapaxes; output path transposes per 128-lane
            tile exactly like the current reinterleave
  dma_sq    copy-only floor

Each variant is checked against np.fft on transform 0 before timing.
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
import ml_dtypes  # noqa: E402

from portfft_tpu.ops import xla_fft  # noqa: E402
from portfft_tpu.ops.pallas_fft import (  # noqa: E402
    _split2,
    kara_matmul_last,
    kstack_dft_left,
)


def _mm_f32(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def kstackr_matmul_last(ar, ai, w6):
    """One-matmul complex right-DFT at x3 precision: lane-stack the
    operand splits, block-stack the table (see build_w6)."""
    xrh, xrl = _split2(ar)
    xih, xil = _split2(ai)
    x6 = jnp.concatenate([xrh, xrl, xrh, xih, xil, xih], axis=-1)
    y = _mm_f32(x6, w6[...])
    n = ar.shape[-1]
    return y[..., :n], y[..., n:]


def build_w6(wr, wi):
    """(6n, 2n) bf16 block table: columns [yr | yi], row blocks matching
    the [xrh, xrl, xrh, xih, xil, xih] lane stack under the x3 scheme
    (xh@wh + xl@wh + xh@wl)."""

    def hl(m):
        m = np.asarray(m, np.float32)
        h = m.astype(ml_dtypes.bfloat16)
        return h, (m - h.astype(np.float32)).astype(ml_dtypes.bfloat16)

    wrh, wrl = hl(wr)
    wih, wil = hl(wi)
    nih, nil = hl(-wi)
    rows = [
        np.concatenate([wrh, wih], axis=1),
        np.concatenate([wrh, wih], axis=1),
        np.concatenate([wrl, wil], axis=1),
        np.concatenate([nih, wrh], axis=1),
        np.concatenate([nih, wrh], axis=1),
        np.concatenate([nil, wrl], axis=1),
    ]
    return np.concatenate(rows, axis=0)


def main():
    n, batch = 65536, 2048
    g1 = g2 = 256
    print("device:", jax.devices()[0].device_kind, flush=True)

    bank = xla_fft.TwiddleBank(np.float32)
    w = bank.dft(g1, -1)
    wk = bank.mat_kara(w)
    twk = bank.twiddle(g1, g2, -1)
    ksk = bank.dft_kstack(g2, -1)
    arrs = bank.device_arrays()
    kara = [arrs[wk + str(j)] for j in range(1, 7)]
    twr_, twi_ = arrs[twk + "r"], arrs[twk + "i"]
    ks_left = arrs[ksk + "k"]
    wr_h = bank.host[w + "r"]
    wi_h = bank.host[w + "i"]
    w6 = jnp.asarray(build_w6(wr_h, wi_h))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    const = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )

    def deinterleave(x_ref, pr, pi, s3, bt):
        for b in range(bt):
            for j in range(g1 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s3[...] = x_ref[b, sl, :].T
                pr[b, :, sl] = s3[0::2, :]
                pi[b, :, sl] = s3[1::2, :]

    def reinterleave_k1rows(cr, ci, o_ref, s2, bt):
        # cr/ci (bt, g1, g2) [k1, k2] -> o_ref[b, k2, 2k1+p]
        for b in range(bt):
            for j in range(g2 // 128):
                sl = slice(j * 128, (j + 1) * 128)
                s2[0::2, :] = cr[b][:, sl]
                s2[1::2, :] = ci[b][:, sl]
                o_ref[b, sl, :] = s2[...].T

    def sq_base(bt):
        def kern(x_ref, q1, q2, q3, q4, q5, q6, tr, ti,
                 o_ref, s3, pr, pi, s2):
            deinterleave(x_ref, pr, pi, s3, bt)
            p2r = pr[...].reshape(bt * g2, g1)
            p2i = pi[...].reshape(bt * g2, g1)
            ar, ai = kara_matmul_last(p2r, p2i, (q1, q2, q3, q4, q5, q6))
            ar = ar.reshape(bt, g2, g1)
            ai = ai.reshape(bt, g2, g1)
            ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
            ar = jnp.swapaxes(ar, -2, -1)
            ai = jnp.swapaxes(ai, -2, -1)
            cr, ci = kara_matmul_last(
                ar.reshape(bt * g1, g2), ai.reshape(bt * g1, g2),
                (q1, q2, q3, q4, q5, q6),
            )
            cr = cr.reshape(bt, g1, g2)
            ci = ci.reshape(bt, g1, g2)
            reinterleave_k1rows(cr, ci, o_ref, s2, bt)

        return kern, kara + [twr_, twi_], None

    def sq_ks(bt):
        def kern(x_ref, w6r, tr, ti, o_ref, s3, pr, pi, s2):
            deinterleave(x_ref, pr, pi, s3, bt)
            p2r = pr[...].reshape(bt * g2, g1)
            p2i = pi[...].reshape(bt * g2, g1)
            ar, ai = kstackr_matmul_last(p2r, p2i, w6r)
            ar = ar.reshape(bt, g2, g1)
            ai = ai.reshape(bt, g2, g1)
            ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
            ar = jnp.swapaxes(ar, -2, -1)
            ai = jnp.swapaxes(ai, -2, -1)
            cr, ci = kstackr_matmul_last(
                ar.reshape(bt * g1, g2), ai.reshape(bt * g1, g2), w6r
            )
            cr = cr.reshape(bt, g1, g2)
            ci = ci.reshape(bt, g1, g2)
            reinterleave_k1rows(cr, ci, o_ref, s2, bt)

        return kern, [w6, twr_, twi_], None

    def sq_ksL(bt):
        def kern(x_ref, w6r, ksl, tr, ti, o_ref, s3, pr, pi, s4):
            deinterleave(x_ref, pr, pi, s3, bt)
            p2r = pr[...].reshape(bt * g2, g1)
            p2i = pi[...].reshape(bt * g2, g1)
            ar, ai = kstackr_matmul_last(p2r, p2i, w6r)
            ar = ar.reshape(bt, g2, g1)
            ai = ai.reshape(bt, g2, g1)
            ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
            # stage B: LEFT stacked matmul contracts n2 (sublanes) — the
            # result rows are k2, no inter-stage transpose
            for b in range(bt):
                yr, yi = kstack_dft_left(ar[b], ai[b], ksl, g2)
                # yr/yi (g2, g1) [k2, k1] -> o_ref[b, k2, 2k1+p]; s4 is
                # (256, g2): rows 2*k1local+p, cols k2
                for j in range(g1 // 128):
                    sl = slice(j * 128, (j + 1) * 128)
                    s4[0::2, :] = yr[:, sl].T
                    s4[1::2, :] = yi[:, sl].T
                    o_ref[b, :, 2 * j * 128 : 2 * (j + 1) * 128] = s4[...].T

        return kern, [w6, ks_left, twr_, twi_], pltpu.VMEM(
            (256, g2), jnp.float32
        )

    def make(kern_tabs, bt):
        kern, tabs, last_scratch = kern_tabs
        if last_scratch is None:
            last_scratch = pltpu.VMEM((2 * g1, 128), jnp.float32)
        spec_in = pl.BlockSpec((bt, g1, 2 * g2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((bt, g2, 2 * g1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def fn(v):
            return pl.pallas_call(
                kern,
                grid=(batch // bt,),
                in_specs=[spec_in] + [const(t) for t in tabs],
                out_specs=spec_out,
                out_shape=jax.ShapeDtypeStruct(
                    (batch, g2, 2 * g1), jnp.float32
                ),
                scratch_shapes=[
                    pltpu.VMEM((2 * g2, 128), jnp.float32),
                    pltpu.VMEM((bt, g2, g1), jnp.float32),
                    pltpu.VMEM((bt, g2, g1), jnp.float32),
                    last_scratch,
                ],
                cost_estimate=pl.CostEstimate(
                    flops=8 * batch * n * (g1 + g2),
                    bytes_accessed=2 * 2 * batch * n * 4,
                    transcendentals=0,
                ),
            )(v.reshape(batch, g1, 2 * g2), *tabs)

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

    ref0 = np.fft.fft(
        np.asarray(raw[: 2 * n : 2]) + 1j * np.asarray(raw[1 : 2 * n : 2])
    )

    cases = [
        ("sq_base_bt2", jax.jit(make(sq_base(2), 2))),
        ("sq_ks_bt2", jax.jit(make(sq_ks(2), 2))),
        ("sq_ks_bt4", jax.jit(make(sq_ks(4), 4))),
        ("sq_ksL_bt2", jax.jit(make(sq_ksL(2), 2))),
        ("sq_ksL_bt4", jax.jit(make(sq_ksL(4), 4))),
        ("dma_sq", jax.jit(dma_sq)),
    ]
    warm = []
    for name, fn in cases:
        try:
            t0 = time.perf_counter()
            r = fn(raw)
            if name != "dma_sq":
                flat = np.asarray(jax.device_get(r[0])).reshape(-1)
                z = flat[0::2] + 1j * flat[1::2]
                rel = np.linalg.norm(z[:n] - ref0) / np.linalg.norm(ref0)
                print(f"{name}: rel={rel:.2e}", flush=True)
                if not rel < 1e-4:
                    print(f"{name}: PARITY FAIL", flush=True)
                    continue
            else:
                jax.device_get(r.ravel()[0:1])
            warm.append((name, fn))
            print(f"warm {name:12s} {time.perf_counter() - t0:6.1f} s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    gb_eff = 2 * batch * n * 4 * 2 / 1e9
    best = {}
    for _ in range(3):
        for name, fn in warm:
            t0 = time.perf_counter()
            for _ in range(4):
                r = fn(raw)
            jax.device_get(r.ravel()[0:1])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(raw)
            jax.device_get(r.ravel()[0:1])
            t2 = time.perf_counter() - t0
            t = (t2 - t1) / 4 if t2 > t1 else t2 / 8
            if name not in best or t < best[name]:
                best[name] = t
    for name, t in best.items():
        print(f"{name:12s} {t*1e3:8.3f} ms  {gb_eff/t:7.1f} GB/s(effective)",
              flush=True)


if __name__ == "__main__":
    main()
