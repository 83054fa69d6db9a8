"""fused2 N=4096 stage-A fix probe: block-diagonal lift + Karatsuba.

probe_fused2_parts.py showed stage A costs 24% (2.9 ms): the
(32,32)@(32,2048) left matmuls use ~6% of the MXU's 128x128 array.
Variants (all numerically CORRECT, checked against np.fft):

  v2_base   current fused2_raw_v2 structure
  bd        stage A lifted to a 128x128 block-diagonal matrix over
            gr = 128/a batch groups (full MXU rows)
  bd_kara   bd + Karatsuba 3-product complex matmuls in both stages
            with pre-split bf16 tables
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


def kara_mm_last(xr, xi, wrh, wrl, wih, wil, wsh, wsl):
    xrh, xrl = split2(xr)
    xih, xil = split2(xi)
    xsh, xsl = split2(xr + xi)
    rr = mm3(xrh, xrl, wrh, wrl)
    ii = mm3(xih, xil, wih, wil)
    m = mm3(xsh, xsl, wsh, wsl)
    return rr - ii, m - rr - ii


def presplit(m):
    h = jnp.asarray(np.asarray(m)).astype(bf)
    l = (jnp.asarray(np.asarray(m)) - h.astype(f32)).astype(bf)
    return h, l


def main():
    n, batch, a = 4096, 32768, 32
    g = 128 // (2 * a)  # fold factor 2
    gr = 128 // a  # 4 batch groups for the block-diagonal lift
    bt = 16
    m_ = bt // gr
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

    def blockdiag(m):
        out = np.zeros((128, 128), np.float32)
        for q in range(gr):
            out[q * a : (q + 1) * a, q * a : (q + 1) * a] = np.asarray(m)
        return out

    bdr_np = blockdiag(war)
    bdi_np = blockdiag(wai)
    bdr_j, bdi_j = jnp.asarray(bdr_np), jnp.asarray(bdi_np)
    tur_t = jnp.asarray(np.tile(np.asarray(tur), (gr, 1)))
    tui_t = jnp.asarray(np.tile(np.asarray(tui), (gr, 1)))

    bdr_h, bdr_l = presplit(bdr_np)
    bdi_h, bdi_l = presplit(bdi_np)
    bds_h, bds_l = presplit(bdr_np + bdi_np)
    wbr_h, wbr_l = presplit(wbr)
    wbi_h, wbi_l = presplit(wbi)
    wbs_h, wbs_l = presplit(np.asarray(wbr) + np.asarray(wbi))

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
        rows = bt * a
        x = x_ref[...].reshape(rows, 256)
        for t in range(rows // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = x[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T

    def fold_store(cr, ci, s2, o_ref):
        rows = bt * a
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
        o_ref[...] = v.reshape(2 * rows, 128)

    # --- v2 baseline ----------------------------------------------------
    def v2_kernel(x_ref, warf, waif, trf, tif, wbrf, wbif,
                  o_ref, pr, pi, s3, s2):
        deint(x_ref, pr, pi, s3)
        xr3 = jnp.transpose(pr[...].reshape(bt, a, 128), (1, 0, 2))
        xi3 = jnp.transpose(pi[...].reshape(bt, a, 128), (1, 0, 2))
        L = bt * 128
        xr2 = xr3.reshape(a, L)
        xi2 = xi3.reshape(a, L)
        w_r, w_i = warf[...], waif[...]
        ar2 = xla_fft.matmul_x3(w_r, xr2) - xla_fft.matmul_x3(w_i, xi2)
        ai2 = xla_fft.matmul_x3(w_i, xr2) + xla_fft.matmul_x3(w_r, xi2)
        ar3 = ar2.reshape(a, bt, 128)
        ai3 = ai2.reshape(a, bt, 128)
        ar3, ai3 = xla_fft.complex_mul(
            ar3, ai3, trf[...].reshape(a, 1, 128), tif[...].reshape(a, 1, 128)
        )
        cr, ci = xla_fft.complex_matmul_last(
            ar3, ai3, wbrf[...], wbif[...], "x3"
        )
        fold_store(cr, ci, s2, o_ref)

    # --- block-diagonal stage A ----------------------------------------
    def regroup(p):
        # (bt*a, 128) rows [b, n1] -> (128, m_*128) rows [q*a + n1],
        # group q = batch slice q*m_ + m
        x = p.reshape(gr, m_, a, 128)
        x = jnp.transpose(x, (0, 2, 1, 3))  # (gr, a, m_, 128)
        return x.reshape(128, m_ * 128)

    def ungroup(c):
        # (128, m_, 128) [q*a + k1, m, k2] -> (a, bt, 128) [k1, b, k2]
        x = c.reshape(gr, a, m_, 128)
        x = jnp.transpose(x, (1, 0, 2, 3))  # (a, gr, m_, 128)
        return x.reshape(a, bt, 128)

    def bd_kernel(x_ref, bdrf, bdif, trf, tif, wbrf, wbif,
                  o_ref, pr, pi, s3, s2):
        deint(x_ref, pr, pi, s3)
        xr2 = regroup(pr[...])
        xi2 = regroup(pi[...])
        b_r, b_i = bdrf[...], bdif[...]
        ar2 = xla_fft.matmul_x3(b_r, xr2) - xla_fft.matmul_x3(b_i, xi2)
        ai2 = xla_fft.matmul_x3(b_i, xr2) + xla_fft.matmul_x3(b_r, xi2)
        ar3 = ar2.reshape(128, m_, 128)
        ai3 = ai2.reshape(128, m_, 128)
        ar3, ai3 = xla_fft.complex_mul(
            ar3, ai3, trf[...].reshape(128, 1, 128),
            tif[...].reshape(128, 1, 128)
        )
        cr, ci = xla_fft.complex_matmul_last(
            ar3, ai3, wbrf[...], wbif[...], "x3"
        )
        fold_store(ungroup(cr), ungroup(ci), s2, o_ref)

    def bd_kara_kernel(x_ref, brh, brl, bih, bil, bsh, bsl,
                       trf, tif, qrh, qrl, qih, qil, qsh, qsl,
                       o_ref, pr, pi, s3, s2):
        deint(x_ref, pr, pi, s3)
        xr2 = regroup(pr[...])
        xi2 = regroup(pi[...])
        xrh, xrl = split2(xr2)
        xih, xil = split2(xi2)
        xsh, xsl = split2(xr2 + xi2)

        def lmm3(wh, wl, xh, xl):
            out = jnp.matmul(wh[...], xh, preferred_element_type=f32)
            out = out + jnp.matmul(wh[...], xl, preferred_element_type=f32)
            return out + jnp.matmul(wl[...], xh, preferred_element_type=f32)

        rr = lmm3(brh, brl, xrh, xrl)
        ii = lmm3(bih, bil, xih, xil)
        mm = lmm3(bsh, bsl, xsh, xsl)
        ar2 = rr - ii
        ai2 = mm - rr - ii
        ar3 = ar2.reshape(128, m_, 128)
        ai3 = ai2.reshape(128, m_, 128)
        ar3, ai3 = xla_fft.complex_mul(
            ar3, ai3, trf[...].reshape(128, 1, 128),
            tif[...].reshape(128, 1, 128)
        )
        cr, ci = kara_mm_last(
            ar3, ai3, qrh[...], qrl[...], qih[...], qil[...],
            qsh[...], qsl[...]
        )
        fold_store(ungroup(cr), ungroup(ci), s2, o_ref)

    def build(kern, tables):
        def fn(v):
            return pl.pallas_call(
                kern,
                grid=(batch // bt,),
                in_specs=[spec] + [const(t) for t in tables],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((total // 128, 128), f32),
                scratch_shapes=[
                    pltpu.VMEM((bt * a, 128), f32),
                    pltpu.VMEM((bt * a, 128), f32),
                    pltpu.VMEM((256, 128), f32),
                    pltpu.VMEM((2 * a * g, bt, 128 // g), f32),
                ],
            )(v.reshape(total // 128, 128), *tables)

        return jax.jit(fn)

    configs = [
        ("v2_base", v2_kernel, [war, wai, tur, tui, wbr, wbi]),
        ("bd", bd_kernel, [bdr_j, bdi_j, tur_t, tui_t, wbr, wbi]),
        ("bd_kara", bd_kara_kernel,
         [bdr_h, bdr_l, bdi_h, bdi_l, bds_h, bds_l, tur_t, tui_t,
          wbr_h, wbr_l, wbi_h, wbi_l, wbs_h, wbs_l]),
    ]
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
    for _ in range(3):
        for name, fn, _ in cases:
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(x2)
            jax.device_get(r.ravel()[0:1])
            best[name] = min(best.get(name, 1e9),
                             (time.perf_counter() - t0) / 8)
    gb = 2 * total * 4 / 1e9
    for name, t in best.items():
        print(f"{name:10s} {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
