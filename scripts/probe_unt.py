#!/usr/bin/env python
"""Race untangle-pass restructurings (round 5).

probe_real attributed the REAL half-length path: at n=8192 b=16384 the
h-C2C core runs 1.8 ms while the UNTANGLE pass runs 12.9 ms at 84 GB/s
traffic — 7x slower than the core on the same bytes.  Suspects, raced
here as kernel variants:

  v0  current library kernel (x3 permutation matmuls, two plane
      transposes per reversal, ragged (bt, 2h+2) output block)
  v1  x2 exact-perm matmuls (J/P/M1/M0 are exactly bf16, so x3's
      w_lo term vanishes; split only the data operand): 12 passes -> 8
  v2  v1 + transpose-free reversal: lane mirror via one M1 matmul +
      sublane flip/roll on the (bt, hh, 128) view — no plane transposes
  v3  v2 + aligned outputs: (bt, 2h) main + (bt, 128) Nyquist block
      (+ the XLA concat the caller would pay, measured separately)

Usage: python scripts/probe_unt.py [n batch]   (default 8192 16384)
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

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu.enums import Domain  # noqa: E402
from portfft_tpu.ops import pallas_real, xla_fft  # noqa: E402
from portfft_tpu.ops.pallas_fft import _const_spec, _mm  # noqa: E402

R = 6


def build_variant(variant, batch, n, rtabs, config):
    h = n // 2
    hh = h // 128
    bt = pallas_real._pick_bt(batch, h, config.vmem_budget)
    assert bt is not None
    wr, wi = rtabs
    wr2 = wr.reshape(hh, 128)
    wi2 = wi.reshape(hh, 128)
    jm, pm, m1, m0 = pallas_real._perm_tables(h)
    rows_v = bt * h // 128

    from portfft_tpu.ops.pallas_fft import _mm_f32, _split2

    def perm_mm_l(w, data):
        # 0/1 permutation matrices are EXACTLY bf16: x3's w_lo term is
        # identically zero, so splitting only the DATA operand (two
        # passes) reproduces the x3 result at 2/3 the MXU cost.  (A
        # single bf16 pass is NOT enough — the MXU rounds the data
        # operand, measured 2e-3 rel.)
        dh, dl = _split2(data)
        wb = w.astype(jnp.bfloat16)
        return _mm_f32(wb, dh) + _mm_f32(wb, dl)

    def perm_mm_r(data, w):
        dh, dl = _split2(data)
        wb = w.astype(jnp.bfloat16)
        return _mm_f32(dh, wb) + _mm_f32(dl, wb)

    def reverse_mm(pv, jmr, pmr, m1r, m0r):
        if variant == 0:
            return pallas_real._reverse_planes(
                pv, jmr, pmr, m1r, m0r, bt, hh
            )
        # v1: same structure as _reverse_planes, x2 exact-perm matmuls
        z3 = pv.reshape(bt, hh, 128)
        z2 = jnp.transpose(z3, (1, 0, 2)).reshape(hh, bt * 128)
        t1 = perm_mm_l(jmr[...], z2).reshape(hh, bt, 128)
        t2 = perm_mm_l(pmr[...], z2).reshape(hh, bt, 128)
        t1 = jnp.transpose(t1, (1, 0, 2)).reshape(bt * hh, 128)
        t2 = jnp.transpose(t2, (1, 0, 2)).reshape(bt * hh, 128)
        return perm_mm_r(t1, m1r[...]) + perm_mm_r(t2, m0r[...])

    # NOTE: a transpose-free reversal via jnp.flip/roll on the sublane
    # axis is NOT lowerable (Pallas TPU has no `rev` primitive — which
    # is why the library reverses via anti-identity matmuls in the first
    # place), so every variant keeps the matmul reversal structure.
    rev = reverse_mm

    def body(x_ref, wrr, wii, jmr, pmr, m1r, m0r, pr, pi, s3):
        x = x_ref[...].reshape(rows_v, 256)
        for t in range(rows_v // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = x[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T
        rr = rev(pr[...], jmr, pmr, m1r, m0r)
        ri = rev(pi[...], jmr, pmr, m1r, m0r)
        zr, zi = pr[...], pi[...]
        er = 0.5 * (zr + rr)
        ei = 0.5 * (zi - ri)
        our = 0.5 * (zi + ri)
        oui = -0.5 * (zr - rr)
        w_r = jnp.broadcast_to(
            wrr[...].reshape(1, hh, 128), (bt, hh, 128)
        ).reshape(rows_v, 128)
        w_i = jnp.broadcast_to(
            wii[...].reshape(1, hh, 128), (bt, hh, 128)
        ).reshape(rows_v, 128)
        tr, ti = xla_fft.complex_mul(our, oui, w_r, w_i)
        return tr + er, ti + ei, zr, zi

    if variant <= 2:

        def kernel(x_ref, wrr, wii, jmr, pmr, m1r, m0r, o_ref, pr, pi,
                   s3, so):
            xr, xi, zr, zi = body(
                x_ref, wrr, wii, jmr, pmr, m1r, m0r, pr, pi, s3
            )
            for t in range(rows_v // 128):
                sl = slice(t * 128, (t + 1) * 128)
                s3[0::2, :] = xr[sl, :].T
                s3[1::2, :] = xi[sl, :].T
                so[sl, :] = s3[...].T
            o_ref[:, : 2 * h] = so[...].reshape(bt, 2 * h)
            z0 = pr[0::hh, :] - pi[0::hh, :]
            ny = (_mm(z0, m0r[...], "x3") if variant == 0
                  else perm_mm_r(z0, m0r[...]))
            o_ref[:, 2 * h : 2 * h + 2] = ny[:, 0:2]

        spec_in = pl.BlockSpec(
            (bt, 2 * h), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        spec_out = pl.BlockSpec(
            (bt, 2 * h + 2), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

        def fn(z):
            out = pl.pallas_call(
                kernel,
                grid=(batch // bt,),
                in_specs=[spec_in]
                + [_const_spec(t) for t in (wr2, wi2, jm, pm, m1, m0)],
                out_specs=spec_out,
                out_shape=jax.ShapeDtypeStruct((batch, 2 * h + 2), z.dtype),
                scratch_shapes=[
                    pltpu.VMEM((rows_v, 128), jnp.float32),
                    pltpu.VMEM((rows_v, 128), jnp.float32),
                    pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.VMEM((rows_v, 256), jnp.float32),
                ],
                interpret=jax.default_backend() != "tpu",
            )(z.reshape(batch, 2 * h), wr2, wi2, jm, pm, m1, m0)
            return out.reshape(batch * (2 * h + 2))

        return fn

    if variant == 4:
        # flat 1-D output, per-row manual DMA at the ragged offsets
        # r·(2h+2) — no (batch, 2h+2) tiled array ever materializes, so
        # the ~9 ms repack sweep disappears entirely
        def kernel4(x_ref, wrr, wii, jmr, pmr, m1r, m0r, o_hbm, pr, pi,
                    s3, so, so4, sems):
            step = pl.program_id(0)
            xr, xi, zr, zi = body(
                x_ref, wrr, wii, jmr, pmr, m1r, m0r, pr, pi, s3
            )
            for t in range(rows_v // 128):
                sl = slice(t * 128, (t + 1) * 128)
                s3[0::2, :] = xr[sl, :].T
                s3[1::2, :] = xi[sl, :].T
                so[sl, :] = s3[...].T
            so4[:, : 2 * h] = so[...].reshape(bt, 2 * h)
            z0 = pr[0::hh, :] - pi[0::hh, :]
            so4[:, 2 * h :] = perm_mm_r(z0, m0r[...])
            for r in range(bt):
                off = (step * bt + r) * (2 * h + 2)
                pltpu.make_async_copy(
                    so4.at[r, pl.ds(0, 2 * h + 2)],
                    o_hbm.at[pl.ds(off, 2 * h + 2)],
                    sems.at[r],
                ).start()
            for r in range(bt):
                pltpu.make_async_copy(
                    so4.at[r, pl.ds(0, 2 * h + 2)],
                    o_hbm.at[pl.ds((step * bt + r) * (2 * h + 2),
                                   2 * h + 2)],
                    sems.at[r],
                ).wait()

        spec_in4 = pl.BlockSpec(
            (bt, 2 * h), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

        def fn4(z):
            out = pl.pallas_call(
                kernel4,
                grid=(batch // bt,),
                in_specs=[spec_in4]
                + [_const_spec(t) for t in (wr2, wi2, jm, pm, m1, m0)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct(
                    (batch * (2 * h + 2),), z.dtype
                ),
                scratch_shapes=[
                    pltpu.VMEM((rows_v, 128), jnp.float32),
                    pltpu.VMEM((rows_v, 128), jnp.float32),
                    pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.VMEM((rows_v, 256), jnp.float32),
                    pltpu.VMEM((bt, 2 * h + 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((bt,)),
                ],
                interpret=jax.default_backend() != "tpu",
            )(z.reshape(batch, 2 * h), wr2, wi2, jm, pm, m1, m0)
            return out

        return fn4

    # v3: aligned main output + separate Nyquist block
    def kernel3(x_ref, wrr, wii, jmr, pmr, m1r, m0r, o_ref, ny_ref, pr,
                pi, s3, so):
        xr, xi, zr, zi = body(
            x_ref, wrr, wii, jmr, pmr, m1r, m0r, pr, pi, s3
        )
        for t in range(rows_v // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[0::2, :] = xr[sl, :].T
            s3[1::2, :] = xi[sl, :].T
            so[sl, :] = s3[...].T
        o_ref[...] = so[...].reshape(bt, 2 * h)
        z0 = pr[0::hh, :] - pi[0::hh, :]
        ny_ref[...] = perm_mm_r(z0, m0r[...])

    spec_in = pl.BlockSpec(
        (bt, 2 * h), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def fn3(z):
        out, ny = pl.pallas_call(
            kernel3,
            grid=(batch // bt,),
            in_specs=[spec_in]
            + [_const_spec(t) for t in (wr2, wi2, jm, pm, m1, m0)],
            out_specs=[
                pl.BlockSpec((bt, 2 * h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, 2 * h), z.dtype),
                jax.ShapeDtypeStruct((batch, 128), z.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_v, 128), jnp.float32),
                pltpu.VMEM((rows_v, 128), jnp.float32),
                pltpu.VMEM((256, 128), jnp.float32),
                pltpu.VMEM((rows_v, 256), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(z.reshape(batch, 2 * h), wr2, wi2, jm, pm, m1, m0)
        return out, ny

    return fn3


def bench_fn(label, f, x, gb):
    def mk(k):
        @jax.jit
        def chained(v):
            y = v
            for _ in range(k):
                y = f(y)
            return y

        return chained

    cr, c2r = mk(R), mk(2 * R)
    jax.device_get(jax.tree.leaves(cr(x))[0].ravel()[0:1])
    jax.device_get(jax.tree.leaves(c2r(x))[0].ravel()[0:1])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(cr(x))[0].ravel()[0:1])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(c2r(x))[0].ravel()[0:1])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / R
        if d > 0 and (best is None or d < best):
            best = d
    print(f"  {label:22s} {best*1e3:8.3f} ms  {gb/best:7.1f} GB/s(traffic)",
          flush=True)
    return best


def main():
    args = [int(a) for a in sys.argv[1:]]
    n, batch = (args + [8192, 16384])[:2]
    h = n // 2
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, domain=Domain.REAL
    ).commit(use_pallas=True)
    rkey = plan._bank_keys[("R", n, -1)]
    rt = [plan._bank_arrays[rkey + "r"], plan._bank_arrays[rkey + "i"]]
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.uniform(-1, 1, 2 * batch * h).astype(np.float32))
    gb = 2 * (2 * batch * h * 4) / 1e9

    L = 2 * batch * h
    ref = None
    fns = {}
    for v in (0, 1, 3, 4):
        try:
            f = build_variant(v, batch, n, rt, plan.config)
            y = f(z)
        except Exception as e:  # noqa: BLE001
            print(f"v{v}: ERROR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        if v == 3:
            main_, ny = y
            got = np.concatenate(
                [np.asarray(main_), np.asarray(ny)[:, :2]], axis=1
            ).ravel()
        else:
            got = np.asarray(y)
        if v == 0:
            ref = got
        else:
            rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"v{v}: parity vs v0 rel={rel:.2e}", flush=True)
            assert rel < 1e-5, rel
        if v == 3:
            # library-realistic form: split kernel + caller concat; all
            # chained variants trim back to the input length so the A/B
            # carries the same slice-copy handicap
            fns["v3main"] = lambda zz, f=f: f(zz)[0].reshape(-1)

            def v3cat(zz, f=f):
                m, ny = f(zz)
                return jnp.concatenate(
                    [m, ny[:, :2]], axis=1
                ).reshape(-1)[:L]

            fns["v3+concat"] = v3cat
        else:
            fns[f"v{v}"] = lambda zz, f=f: f(zz)[:L]

    best = {}
    for _ in range(3):
        for label, f in fns.items():
            d = bench_fn(label, f, z, gb)
            if label not in best or d < best[label]:
                best[label] = d
    print("\nBEST:", flush=True)
    for label, d in best.items():
        print(f"  {label:22s} {d*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
