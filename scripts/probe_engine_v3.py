"""Engine realified-matmul probe at N=65536: fold the de/interleave into
one full-width MXU matmul per pass.

Pass 1 (realified split): transpose the raw (g1, 2t1) block once ->
(2t1, g1), reshape to (t1, 2g1) split-pair lanes [p*g1 + n1], one x3
matmul against the (2g1, 2g1) realified DFT table whose OUTPUT columns
are plane-split [yr | yi] -- the strided-slice deinterleave and the
4-product complex matmul both disappear into the MXU.  Twiddle applies
on the output planes as before.

Pass 2 (realified split): write both plane blocks transposed into one
(t2, 2g2) scratch, one x3 matmul against the (2g2, 2g2) table with
plane-split output, then the usual reinterleave fold.

Variants: p1_real, p1_kara (best of v2 probe, rerun for adjacency),
p2_real, p2_kara.  Numeric checks against the base pass.
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


def mm3_right(x, bh, bl):
    xh, xl = split2(x)
    return mm3(xh, xl, bh, bl)


def kara_mm(xr, xi, tabs):
    wrh, wrl, wih, wil, wsh, wsl = tabs
    xrh, xrl = split2(xr)
    xih, xil = split2(xi)
    xsh, xsl = split2(xr + xi)
    rr = mm3(xrh, xrl, wrh, wrl)
    ii = mm3(xih, xil, wih, wil)
    m = mm3(xsh, xsl, wsh, wsl)
    return rr - ii, m - rr - ii


def presplit(m):
    j = jnp.asarray(np.asarray(m, np.float32))
    h = j.astype(bf)
    return h, (j - h.astype(f32)).astype(bf)


def main():
    n, batch = 65536, 2048
    g1 = g2 = 256
    t1 = t2 = 256
    print("device:", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    wc = np.exp(-2j * np.pi * np.outer(np.arange(g1), np.arange(g1)) / g1)
    wr_np = np.float32(wc.real)
    wi_np = np.float32(wc.imag)

    # realified split-layout table: rows p*g + n1 (input split planes),
    # cols p'*g + k1 (output split planes):
    #   yr = xr Wr - xi Wi ; yi = xr Wi + xi Wr
    v = np.zeros((2 * g1, 2 * g1), np.float32)
    v[:g1, :g1] = wr_np
    v[g1:, :g1] = -wi_np
    v[:g1, g1:] = wi_np
    v[g1:, g1:] = wr_np
    vh, vl = presplit(v)

    wrh, wrl = presplit(wr_np)
    wih, wil = presplit(wi_np)
    wsh, wsl = presplit(wr_np + wi_np)
    kara_tabs = [wrh, wrl, wih, wil, wsh, wsl]

    twc = np.exp(-2j * np.pi * np.outer(np.arange(g2), np.arange(g1)) / n)
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

    # --- pass 1 variants -------------------------------------------------
    def p1_real_kern(x_ref, vh_, vl_, tr, ti, or_ref, oi_ref):
        xt = x_ref[0].T  # (2t1, g1): rows 2t+p
        # flat-preserving merge: row pairs (2t, 2t+1) -> one 2g1-lane row,
        # giving lane index p*g1 + n1 (split-pair layout)
        xs = xt.reshape(t1, 2 * g1)
        y = mm3_right(xs, vh_[...], vl_[...])  # (t1, 2g1) = [yr | yi]
        ar, ai = y[:, :g1], y[:, g1:]
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
        or_ref[0] = ar
        oi_ref[0] = ai

    def p1_kara_kern(x_ref, *refs):
        tabs = [r[...] for r in refs[:6]]
        tr, ti = refs[6], refs[7]
        or_ref, oi_ref = refs[8], refs[9]
        s3, pr, pi = refs[10], refs[11], refs[12]
        for j in range(g1 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s3[...] = x_ref[0, sl, :].T
            pr[:, sl] = s3[0::2, :]
            pi[:, sl] = s3[1::2, :]
        ar, ai = kara_mm(pr[...], pi[...], tabs)
        ar, ai = xla_fft.complex_mul(ar, ai, tr[...], ti[...])
        or_ref[0] = ar
        oi_ref[0] = ai

    def build_p1(kern, tables, scratch):
        def fn(vv):
            return pl.pallas_call(
                kern,
                grid=(batch, g2 // t1),
                in_specs=[in1] + [const(t) for t in tables]
                + [tw_spec, tw_spec],
                out_specs=[out1, out1],
                out_shape=[jax.ShapeDtypeStruct((batch, g2, g1), f32)] * 2,
                scratch_shapes=scratch,
            )(vv.reshape(batch, g1, 2 * g2), *tables, twr_, twi_)

        return jax.jit(fn)

    scr = [pltpu.VMEM((2 * t1, 128), f32), pltpu.VMEM((t1, g1), f32),
           pltpu.VMEM((t1, g1), f32)]

    # --- pass 2 variants -------------------------------------------------
    in2 = pl.BlockSpec((1, g2, t2), lambda bi, ji: (bi, 0, ji),
                       memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((1, g2, 2 * t2), lambda bi, ji: (bi, 0, ji),
                        memory_space=pltpu.VMEM)

    def p2_real_kern(xr_ref, xi_ref, vh_, vl_, o_ref, xs, s2):
        xs[:, :g2] = xr_ref[0].T
        xs[:, g2:] = xi_ref[0].T
        y = mm3_right(xs[...], vh_[...], vl_[...])  # (t2, 2g2) [cr | ci]
        cr, ci = y[:, :g2], y[:, g2:]
        for j in range(g2 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = cr[:, sl]
            s2[1::2, :] = ci[:, sl]
            o_ref[0, sl, :] = s2[...].T

    def p2_kara_kern(xr_ref, xi_ref, *refs):
        tabs = [r[...] for r in refs[:6]]
        o_ref, s2 = refs[6], refs[7]
        cr, ci = kara_mm(xr_ref[0].T, xi_ref[0].T, tabs)
        for j in range(g2 // 128):
            sl = slice(j * 128, (j + 1) * 128)
            s2[0::2, :] = cr[:, sl]
            s2[1::2, :] = ci[:, sl]
            o_ref[0, sl, :] = s2[...].T

    def build_p2(kern, tables, scratch):
        def fn(a, b):
            return pl.pallas_call(
                kern,
                grid=(batch, g1 // t2),
                in_specs=[in2, in2] + [const(t) for t in tables],
                out_specs=out2,
                out_shape=jax.ShapeDtypeStruct((batch, g2, 2 * g1), f32),
                scratch_shapes=scratch,
            )(a, b, *tables)

        return jax.jit(fn)

    sr = jnp.asarray(rng.uniform(-1, 1, (batch, g2, g1)).astype(np.float32))
    si = jnp.asarray(rng.uniform(-1, 1, (batch, g2, g1)).astype(np.float32))
    cases = [
        ("p1_real", build_p1(p1_real_kern, [vh, vl], [])),
        ("p1_kara", build_p1(p1_kara_kern, kara_tabs, scr)),
        ("p2_real", build_p2(p2_real_kern, [vh, vl],
                             [pltpu.VMEM((t2, 2 * g2), f32),
                              pltpu.VMEM((2 * t2, 128), f32)])),
        ("p2_kara", build_p2(p2_kara_kern, kara_tabs,
                             [pltpu.VMEM((2 * t2, 128), f32)])),
    ]

    def args_of(name):
        return (raw,) if name.startswith("p1") else (sr, si)

    warm = []
    for name, fn in cases:
        try:
            r = fn(*args_of(name))
            jax.device_get(r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                           else r.ravel()[0:1])
            warm.append((name, fn, r))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    by = {name: r for name, _, r in warm}
    if "p1_real" in by and "p1_kara" in by:
        d = float(jnp.max(jnp.abs(by["p1_real"][0] - by["p1_kara"][0])))
        m = float(jnp.max(jnp.abs(by["p1_kara"][0])))
        print(f"p1 real vs kara: max diff {d:.2e} (max {m:.2e})", flush=True)
    if "p2_real" in by and "p2_kara" in by:
        d = float(jnp.max(jnp.abs(by["p2_real"] - by["p2_kara"])))
        print(f"p2 real vs kara: max diff {d:.2e}", flush=True)

    best = {}
    for _ in range(3):
        for name, fn, _ in warm:
            a = args_of(name)
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(*a)
            jax.device_get(r[0].ravel()[0:1] if isinstance(r, (tuple, list))
                           else r.ravel()[0:1])
            best[name] = min(best.get(name, 1e9),
                             (time.perf_counter() - t0) / 8)
    gb = 2 * batch * n * 4 * 2 / 1e9
    for name, t in best.items():
        print(f"{name:10s} {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s(pass)",
              flush=True)


if __name__ == "__main__":
    main()
