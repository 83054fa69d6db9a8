"""fused2 N=4096 probe round 2: push past stackall (199 GB/s).

Variants on top of stackall (= A-kstack one-matmul + B-Karatsuba):

  stackall      best of probe_fused2_mm (re-run for adjacency)
  bt32          stackall at bt=32 (larger matmuls, fewer grid steps)
  bkstack       stage B Karatsuba with each product x3-K-stacked:
                three (512,384)@(384,128) matmuls instead of nine
                (512,128)@(128,128)
  nofold        stackall without the output restack (wrong layout,
                measures the new compute floor)
  par           stackall with dimension_semantics=("parallel",)
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

    war_np, wai_np = np.asarray(war), np.asarray(wai)
    wrh, wrl = presplit_np(war_np)
    wih, wil = presplit_np(wai_np)
    sa_r = np.concatenate([wrh, wrh, wrl, -wih, -wih, -wil], axis=1)
    sa_i = np.concatenate([wih, wih, wil, wrh, wrh, wrl], axis=1)
    sa = jnp.asarray(np.concatenate([sa_r, sa_i], axis=0)).astype(bf)

    qrh, qrl = presplit_np(wbr)
    qih, qil = presplit_np(wbi)
    qsh, qsl = presplit_np(np.asarray(wbr) + np.asarray(wbi))
    bk = [jnp.asarray(t).astype(bf)
          for t in (qrh, qrl, qih, qil, qsh, qsl)]
    # bkstack: (384, 128) stacked per product
    bs_r = jnp.asarray(np.concatenate([qrh, qrh, qrl], axis=0)).astype(bf)
    bs_i = jnp.asarray(np.concatenate([qih, qih, qil], axis=0)).astype(bf)
    bs_s = jnp.asarray(np.concatenate([qsh, qsh, qsl], axis=0)).astype(bf)

    rng = np.random.default_rng(0)
    raw_np = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    raw = jnp.asarray(raw_np)
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)
    const = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )

    def make(bt, stageB, fold_on=True, par=False):
        rows = bt * a

        def deint(x_ref, pr, pi, s3):
            x = x_ref[...].reshape(rows, 256)
            for t in range(rows // 128):
                sl = slice(t * 128, (t + 1) * 128)
                s3[...] = x[sl, :].T
                pr[sl, :] = s3[0::2, :].T
                pi[sl, :] = s3[1::2, :].T
            return pr[...], pi[...]

        def stageA(pr, pi, saf):
            xr3 = jnp.transpose(pr.reshape(bt, a, 128), (1, 0, 2))
            xi3 = jnp.transpose(pi.reshape(bt, a, 128), (1, 0, 2))
            L = bt * 128
            xr2 = xr3.reshape(a, L)
            xi2 = xi3.reshape(a, L)
            xrh, xrl = split2(xr2)
            xih, xil = split2(xi2)
            x6 = jnp.concatenate([xrh, xrl, xrh, xih, xil, xih], axis=0)
            y = jnp.matmul(saf[...], x6, preferred_element_type=f32)
            return y[:a].reshape(a, bt, 128), y[a:].reshape(a, bt, 128)

        def mm3r(xh, xl, wh, wl):
            out = jnp.matmul(xh, wh[...], preferred_element_type=f32)
            out = out + jnp.matmul(xl, wh[...], preferred_element_type=f32)
            return out + jnp.matmul(xh, wl[...], preferred_element_type=f32)

        def stageB_kara(ar3, ai3, refs):
            q1, q2, q3, q4, q5, q6 = refs
            arh, arl = split2(ar3)
            aih, ail = split2(ai3)
            ash, asl = split2(ar3 + ai3)
            t1 = mm3r(arh, arl, q1, q2)
            t2 = mm3r(aih, ail, q3, q4)
            t3 = mm3r(ash, asl, q5, q6)
            return t1 - t2, t3 - t1 - t2

        def stageB_kstack(ar3, ai3, refs):
            br, bi_, bs = refs
            arh, arl = split2(ar3)
            aih, ail = split2(ai3)
            ash, asl = split2(ar3 + ai3)
            s_r = jnp.concatenate([arh, arl, arh], axis=2)
            s_i = jnp.concatenate([aih, ail, aih], axis=2)
            s_s = jnp.concatenate([ash, asl, ash], axis=2)
            t1 = jnp.matmul(s_r, br[...], preferred_element_type=f32)
            t2 = jnp.matmul(s_i, bi_[...], preferred_element_type=f32)
            t3 = jnp.matmul(s_s, bs[...], preferred_element_type=f32)
            return t1 - t2, t3 - t1 - t2

        sb = stageB_kara if stageB == "kara" else stageB_kstack

        def kernel(x_ref, saf, trf, tif, *rest):
            nb = 6 if stageB == "kara" else 3
            brefs = rest[:nb]
            o_ref = rest[nb]
            pr, pi, s3, s2 = rest[nb + 1 :]
            prv, piv = deint(x_ref, pr, pi, s3)
            ar3, ai3 = stageA(prv, piv, saf)
            ar3, ai3 = xla_fft.complex_mul(
                ar3, ai3, trf[...].reshape(a, 1, 128),
                tif[...].reshape(a, 1, 128),
            )
            cr, ci = sb(ar3, ai3, brefs)
            if fold_on:
                Lg = 128 // g
                for j in range(g):
                    lane = slice(j * Lg, (j + 1) * Lg)
                    s2[j * 2 * a : (j + 1) * 2 * a : 2] = cr[:, :, lane]
                    s2[j * 2 * a + 1 : (j + 1) * 2 * a : 2] = ci[:, :, lane]
                v = jnp.transpose(s2[...], (1, 0, 2))
                v = jnp.swapaxes(v, 1, 2)
                o_ref[...] = v.reshape(2 * rows, 128)
            else:
                o_ref[:rows] = cr.reshape(rows, 128)
                o_ref[rows:] = ci.reshape(rows, 128)

        tables = [sa, tur, tui] + (bk if stageB == "kara"
                                   else [bs_r, bs_i, bs_s])
        blk = 2 * bt * a
        spec = pl.BlockSpec((blk, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((rows, 128), f32),
            pltpu.VMEM((rows, 128), f32),
            pltpu.VMEM((256, 128), f32),
            pltpu.VMEM((2 * a * g, bt, 128 // g), f32),
        ]
        kw = {}
        if par:
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            )

        def fn(v):
            return pl.pallas_call(
                kernel,
                grid=(batch // bt,),
                in_specs=[spec] + [const(t) for t in tables],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((total // 128, 128), f32),
                scratch_shapes=scratch,
                **kw,
            )(v.reshape(total // 128, 128), *tables)

        return jax.jit(fn)

    configs = [
        ("stackall", dict(bt=16, stageB="kara")),
        ("bt32", dict(bt=32, stageB="kara")),
        ("bkstack", dict(bt=16, stageB="kstack")),
        ("nofold", dict(bt=16, stageB="kara", fold_on=False)),
        ("par", dict(bt=16, stageB="kara", par=True)),
    ]
    cases = []
    for name, kw in configs:
        try:
            fn = make(**kw)
            r = fn(x2)
            jax.device_get(r.ravel()[0:1])
            cases.append((name, fn, r, kw.get("fold_on", True)))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    ref = np.fft.fft(raw_np.reshape(batch, n, 2)[:4, :, 0]
                     + 1j * raw_np.reshape(batch, n, 2)[:4, :, 1], axis=1)
    for name, fn, r, folded in cases:
        if not folded:
            continue
        got = np.asarray(r).reshape(batch, n, 2)[:4]
        gc = got[..., 0] + 1j * got[..., 1]
        rel = np.max(np.abs(gc - ref)) / np.max(np.abs(ref))
        print(f"{name}: rel_err {rel:.2e}", flush=True)

    best = {}
    for _ in range(4):
        for name, fn, _, _ in cases:
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
