"""fused2 N=4096 probe: widen the stage matmuls (the measured bottleneck).

probe_fused2_parts (2026-08-17, this session): full 12.25 ms, mm_only
10.49, no_dftA 9.11, no_dftB 10.60 — the kernel is MATMUL-bound (deint,
twiddle and the (1,0,2) permute are fully overlapped; the fold costs ~1.2
ms).  Stage A runs twelve (32,32)@(32,2048) matmuls whose K=M=32 wastes
the 128-wide MXU; stage B twelve (512,128)@(128,128).

Variants (all numerically CORRECT, checked vs np.fft):

  base      current fused2_raw_v2 structure
  akstack   stage A as ONE matmul: x3 precision terms, complex products
            AND both outputs stacked — W (2a, 6a) @ X6 (6a, L) with
            X6 = [xrh; xrl; xrh; xih; xil; xih]; rows [ar; ai].
  akara     stage A as three Karatsuba products, each one x3-stacked
            (a, 3a) @ (3a, L) matmul: t1=Wr@xr, t2=Wi@xi, t3=Ws@xs.
  bkara     stage B via Karatsuba: 9 (512,128)@(128,128) matmuls
            instead of 12 (x3 of t1/t2/t3 with presplit tables).
  stackall  akstack + bkara.
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

f32 = jnp.float32
bf = jnp.bfloat16


def presplit_np(m):
    m = np.asarray(m, np.float32)
    h = m.astype(jnp.bfloat16)
    l = (m - np.asarray(h, np.float32)).astype(jnp.bfloat16)
    return np.asarray(h), np.asarray(l)


def split2(x):
    h = x.astype(bf)
    return h, (x - h.astype(f32)).astype(bf)


def main():
    n, batch, a = 4096, 32768, 32
    g = 128 // (2 * a)  # 2
    bt = 16
    rows = bt * a
    prec = _kernel_precision(None)
    print("device:", jax.devices()[0].device_kind, flush=True)

    sign = -1
    bank = xla_fft.TwiddleBank(np.float32)
    wa_k = bank.dft(a, sign)
    tu_k = bank.twiddle_fm(a, 128, sign)
    wb_k = bank.dft_permuted(128, sign, g) if g > 1 else bank.dft(128, sign)
    arrs = bank.device_arrays()
    war, wai = arrs[wa_k + "r"], arrs[wa_k + "i"]
    tur, tui = arrs[tu_k + "r"], arrs[tu_k + "i"]
    wbr, wbi = arrs[wb_k + "r"], arrs[wb_k + "i"]

    war_np = np.asarray(war)
    wai_np = np.asarray(wai)
    wrh, wrl = presplit_np(war_np)
    wih, wil = presplit_np(wai_np)
    # akstack table (2a, 6a): rows [ar; ai] against X6
    sa_r = np.concatenate([wrh, wrh, wrl, -wih, -wih, -wil], axis=1)
    sa_i = np.concatenate([wih, wih, wil, wrh, wrh, wrl], axis=1)
    sa = jnp.asarray(np.concatenate([sa_r, sa_i], axis=0))  # bf16 below
    sa = sa.astype(bf)
    # akara tables (a, 3a) per product
    wsh, wsl = presplit_np(war_np + wai_np)
    ka_r = jnp.asarray(np.concatenate([wrh, wrh, wrl], axis=1)).astype(bf)
    ka_i = jnp.asarray(np.concatenate([wih, wih, wil], axis=1)).astype(bf)
    ka_s = jnp.asarray(np.concatenate([wsh, wsh, wsl], axis=1)).astype(bf)
    # bkara presplit stage-B tables
    qrh, qrl = presplit_np(wbr)
    qih, qil = presplit_np(wbi)
    qsh, qsl = presplit_np(np.asarray(wbr) + np.asarray(wbi))
    bk = [jnp.asarray(t).astype(bf)
          for t in (qrh, qrl, qih, qil, qsh, qsl)]

    rng = np.random.default_rng(0)
    raw_np = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    raw = jnp.asarray(raw_np)
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)
    blk = 2 * bt * a
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )

    def deint(x_ref, pr, pi, s3):
        x = x_ref[...].reshape(rows, 256)
        for t in range(rows // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = x[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T
        return pr[...], pi[...]

    def to_stageA(pr, pi):
        xr3 = jnp.transpose(pr.reshape(bt, a, 128), (1, 0, 2))
        xi3 = jnp.transpose(pi.reshape(bt, a, 128), (1, 0, 2))
        L = bt * 128
        return xr3.reshape(a, L), xi3.reshape(a, L)

    def stageA_base(xr2, xi2, warf, waif):
        w_r, w_i = warf[...], waif[...]
        ar2 = xla_fft.matmul_x3(w_r, xr2) - xla_fft.matmul_x3(w_i, xi2)
        ai2 = xla_fft.matmul_x3(w_i, xr2) + xla_fft.matmul_x3(w_r, xi2)
        return ar2.reshape(a, bt, 128), ai2.reshape(a, bt, 128)

    def stageA_kstack(xr2, xi2, saf):
        xrh, xrl = split2(xr2)
        xih, xil = split2(xi2)
        x6 = jnp.concatenate([xrh, xrl, xrh, xih, xil, xih], axis=0)
        y = jnp.matmul(saf[...], x6, preferred_element_type=f32)
        return (y[:a].reshape(a, bt, 128), y[a:].reshape(a, bt, 128))

    def stageA_kara(xr2, xi2, krf, kif, ksf):
        xrh, xrl = split2(xr2)
        xih, xil = split2(xi2)
        xsh, xsl = split2(xr2 + xi2)
        x3r = jnp.concatenate([xrh, xrl, xrh], axis=0)
        x3i = jnp.concatenate([xih, xil, xih], axis=0)
        x3s = jnp.concatenate([xsh, xsl, xsh], axis=0)
        t1 = jnp.matmul(krf[...], x3r, preferred_element_type=f32)
        t2 = jnp.matmul(kif[...], x3i, preferred_element_type=f32)
        t3 = jnp.matmul(ksf[...], x3s, preferred_element_type=f32)
        ar2 = t1 - t2
        ai2 = t3 - t1 - t2
        return ar2.reshape(a, bt, 128), ai2.reshape(a, bt, 128)

    def stageB_base(ar3, ai3, wbrf, wbif):
        return xla_fft.complex_matmul_last(
            ar3, ai3, wbrf[...], wbif[...], prec
        )

    def mm3r(xh, xl, wh, wl):
        out = jnp.matmul(xh, wh[...], preferred_element_type=f32)
        out = out + jnp.matmul(xl, wh[...], preferred_element_type=f32)
        return out + jnp.matmul(xh, wl[...], preferred_element_type=f32)

    def stageB_kara(ar3, ai3, refs):
        qrh, qrl, qih, qil, qsh, qsl = refs
        arh, arl = split2(ar3)
        aih, ail = split2(ai3)
        ash, asl = split2(ar3 + ai3)
        t1 = mm3r(arh, arl, qrh, qrl)
        t2 = mm3r(aih, ail, qih, qil)
        t3 = mm3r(ash, asl, qsh, qsl)
        return t1 - t2, t3 - t1 - t2

    def tw(ar3, ai3, trf, tif):
        return xla_fft.complex_mul(
            ar3, ai3, trf[...].reshape(a, 1, 128), tif[...].reshape(a, 1, 128)
        )

    def fold(cr, ci, s2, o_ref):
        Lg = 128 // g
        for j in range(g):
            lane = slice(j * Lg, (j + 1) * Lg)
            s2[j * 2 * a : (j + 1) * 2 * a : 2] = cr[:, :, lane]
            s2[j * 2 * a + 1 : (j + 1) * 2 * a : 2] = ci[:, :, lane]
        v = jnp.transpose(s2[...], (1, 0, 2))
        v = jnp.swapaxes(v, 1, 2)
        o_ref[...] = v.reshape(2 * rows, 128)

    def k_base(x_ref, warf, waif, trf, tif, wbrf, wbif,
               o_ref, pr, pi, s3, s2):
        prv, piv = deint(x_ref, pr, pi, s3)
        ar3, ai3 = stageA_base(*to_stageA(prv, piv), warf, waif)
        ar3, ai3 = tw(ar3, ai3, trf, tif)
        cr, ci = stageB_base(ar3, ai3, wbrf, wbif)
        fold(cr, ci, s2, o_ref)

    def k_akstack(x_ref, saf, trf, tif, wbrf, wbif, o_ref, pr, pi, s3, s2):
        prv, piv = deint(x_ref, pr, pi, s3)
        ar3, ai3 = stageA_kstack(*to_stageA(prv, piv), saf)
        ar3, ai3 = tw(ar3, ai3, trf, tif)
        cr, ci = stageB_base(ar3, ai3, wbrf, wbif)
        fold(cr, ci, s2, o_ref)

    def k_akara(x_ref, krf, kif, ksf, trf, tif, wbrf, wbif,
                o_ref, pr, pi, s3, s2):
        prv, piv = deint(x_ref, pr, pi, s3)
        ar3, ai3 = stageA_kara(*to_stageA(prv, piv), krf, kif, ksf)
        ar3, ai3 = tw(ar3, ai3, trf, tif)
        cr, ci = stageB_base(ar3, ai3, wbrf, wbif)
        fold(cr, ci, s2, o_ref)

    def k_bkara(x_ref, warf, waif, trf, tif, q1, q2, q3, q4, q5, q6,
                o_ref, pr, pi, s3, s2):
        prv, piv = deint(x_ref, pr, pi, s3)
        ar3, ai3 = stageA_base(*to_stageA(prv, piv), warf, waif)
        ar3, ai3 = tw(ar3, ai3, trf, tif)
        cr, ci = stageB_kara(ar3, ai3, (q1, q2, q3, q4, q5, q6))
        fold(cr, ci, s2, o_ref)

    def k_stackall(x_ref, saf, trf, tif, q1, q2, q3, q4, q5, q6,
                   o_ref, pr, pi, s3, s2):
        prv, piv = deint(x_ref, pr, pi, s3)
        ar3, ai3 = stageA_kstack(*to_stageA(prv, piv), saf)
        ar3, ai3 = tw(ar3, ai3, trf, tif)
        cr, ci = stageB_kara(ar3, ai3, (q1, q2, q3, q4, q5, q6))
        fold(cr, ci, s2, o_ref)

    scratch = [
        pltpu.VMEM((rows, 128), f32),
        pltpu.VMEM((rows, 128), f32),
        pltpu.VMEM((256, 128), f32),
        pltpu.VMEM((2 * a * g, bt, 128 // g), f32),
    ]

    configs = [
        ("base", k_base, [war, wai, tur, tui, wbr, wbi]),
        ("akstack", k_akstack, [sa, tur, tui, wbr, wbi]),
        ("akara", k_akara, [ka_r, ka_i, ka_s, tur, tui, wbr, wbi]),
        ("bkara", k_bkara, [war, wai, tur, tui] + bk),
        ("stackall", k_stackall, [sa, tur, tui] + bk),
    ]

    def build(kern, tables):
        def fn(v):
            return pl.pallas_call(
                kern,
                grid=(batch // bt,),
                in_specs=[spec] + [const(t) for t in tables],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((total // 128, 128), f32),
                scratch_shapes=scratch,
            )(v.reshape(total // 128, 128), *tables)

        return jax.jit(fn)

    cases = []
    for name, kern, tables in configs:
        try:
            fn = build(kern, tables)
            r = fn(x2)
            jax.device_get(r.ravel()[0:1])
            cases.append((name, fn, r))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    ref = np.fft.fft(raw_np.reshape(batch, n, 2)[:4, :, 0]
                     + 1j * raw_np.reshape(batch, n, 2)[:4, :, 1], axis=1)
    for name, fn, r in cases:
        got = np.asarray(r).reshape(batch, n, 2)[:4]
        gc = got[..., 0] + 1j * got[..., 1]
        rel = np.max(np.abs(gc - ref)) / np.max(np.abs(ref))
        print(f"{name}: rel_err {rel:.2e}", flush=True)

    best = {}
    for _ in range(4):
        for name, fn, _ in cases:
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(x2)
            jax.device_get(r.ravel()[0:1])
            best[name] = min(best.get(name, 1e9),
                             (time.perf_counter() - t0) / 8)
    gb = 2 * total * 4 / 1e9
    for name, t in best.items():
        print(f"{name:9s} {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
