"""Ablate the fused2_raw_v2 kernel at N=4096 (a=32): which stage costs.

Each variant moves identical HBM traffic (in block = out block = tiles of
the flat (X, 128) view); ablated variants compute wrong values but the
GB/s deltas isolate the per-stage VPU/XPOSE/MXU cost:

  full        deint loop + permute + stage A + twiddle + stage B + fold
  no_deint    planes faked by reinterpreting block halves (skips the
              (128,256) transposes + strided slices + (128,128) transposes)
  no_perm     skips the (1,0,2) sub-block permute after deint
  no_dftA     skips stage A matmuls (planes pass through)
  no_tw       skips the twiddle complex-mul
  no_dftB     skips stage B matmuls
  no_fold     skips the k2-fold strided stores + output permutes (writes
              the stage-B planes straight into the out block)
  mm_only     no_deint + no_perm + no_tw + no_fold (pure matmul ceiling)
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
from portfft_tpu.ops.pallas_fft import _kernel_precision, _mm  # noqa: E402


def make_kernel(a, bt, prec, g, *, deint=True, perm=True, dftA=True,
                tw=True, dftB=True, fold=True):
    def kernel(x_ref, war, wai, tr, ti, wbr, wbi, o_ref, pr, pi, s3, s2):
        rows = bt * a
        x = x_ref[...].reshape(rows, 256)
        if deint:
            for t in range(rows // 128):
                sl = slice(t * 128, (t + 1) * 128)
                s3[...] = x[sl, :].T
                pr[sl, :] = s3[0::2, :].T
                pi[sl, :] = s3[1::2, :].T
            prv, piv = pr[...], pi[...]
        else:
            # fake planes from block halves: right shapes, zero XPOSE
            prv = x[:, :128]
            piv = x[:, 128:]
        if perm:
            xr3 = jnp.transpose(prv.reshape(bt, a, 128), (1, 0, 2))
            xi3 = jnp.transpose(piv.reshape(bt, a, 128), (1, 0, 2))
        else:
            xr3 = prv.reshape(a, bt, 128)
            xi3 = piv.reshape(a, bt, 128)
        L = bt * 128
        if dftA:
            xr2 = xr3.reshape(a, L)
            xi2 = xi3.reshape(a, L)
            war_, wai_ = war[...], wai[...]
            ar2 = _mm(war_, xr2, prec) - _mm(wai_, xi2, prec)
            ai2 = _mm(wai_, xr2, prec) + _mm(war_, xi2, prec)
            ar3 = ar2.reshape(a, bt, 128)
            ai3 = ai2.reshape(a, bt, 128)
        else:
            ar3, ai3 = xr3, xi3
        if tw:
            twr = tr[...].reshape(a, 1, 128)
            twi = ti[...].reshape(a, 1, 128)
            ar3, ai3 = xla_fft.complex_mul(ar3, ai3, twr, twi)
        if dftB:
            cr, ci = xla_fft.complex_matmul_last(
                ar3, ai3, wbr[...], wbi[...], prec
            )
        else:
            cr, ci = ar3, ai3
        if fold:
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
        else:
            # straight plane write: same bytes, no restack
            o_ref[: rows] = cr.reshape(rows, 128)
            o_ref[rows :] = ci.reshape(rows, 128)

    return kernel


def main():
    n, batch, a = 4096, 32768, 32
    g = 128 // (2 * a)  # 2
    bt = 16
    prec = _kernel_precision(None)
    print("device:", jax.devices()[0].device_kind, flush=True)

    bank = xla_fft.TwiddleBank(np.float32)
    wa = bank.dft(a, -1)
    tk = bank.twiddle_fm(a, 128, -1)  # (a, 128) orientation
    wb = bank.dft_permuted(128, -1, g) if g > 1 else bank.dft(128, -1)
    arrs = bank.device_arrays()
    tables = [arrs[wa + "r"], arrs[wa + "i"], arrs[tk + "r"], arrs[tk + "i"],
              arrs[wb + "r"], arrs[wb + "i"]]

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    total = raw.shape[0]
    x2 = raw.reshape(total // 128, 128)
    blk = 2 * bt * a
    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
    )

    def build(**kw):
        kern = make_kernel(a, bt, prec, g, **kw)

        def fn(v):
            return pl.pallas_call(
                kern,
                grid=(batch // bt,),
                in_specs=[spec] + [const(t) for t in tables],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((total // 128, 128),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((bt * a, 128), jnp.float32),
                    pltpu.VMEM((bt * a, 128), jnp.float32),
                    pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.VMEM((2 * a * g, bt, 128 // g), jnp.float32),
                ],
            )(v.reshape(total // 128, 128), *tables)

        return jax.jit(fn)

    cases = [
        ("full", {}),
        ("no_deint", dict(deint=False)),
        ("no_perm", dict(perm=False)),
        ("no_dftA", dict(dftA=False)),
        ("no_tw", dict(tw=False)),
        ("no_dftB", dict(dftB=False)),
        ("no_fold", dict(fold=False)),
        ("mm_only", dict(deint=False, perm=False, tw=False, fold=False)),
    ]
    gb = 2 * total * 4 / 1e9
    warm = []
    for name, kw in cases:
        try:
            fn = build(**kw)
            r = fn(x2)
            jax.device_get(r.ravel()[0:1])
            warm.append((name, fn))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)
    best = {}
    for _ in range(3):
        for name, fn in warm:
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(x2)
            jax.device_get(r.ravel()[0:1])
            t = (time.perf_counter() - t0) / 8
            best[name] = min(best.get(name, 1e9), t)
    for name, t in best.items():
        print(f"{name:10s} {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
