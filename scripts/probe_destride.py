#!/usr/bin/env python
"""Race destride strategies for the regular strided gather (round-5
VERDICT #3: strided_large runs 28 ms device vs large_1d's 7.2 at 4x the
batch — the XLA deinterleave + strided complex slice path).

The regular rectangle: raw floats (batch, 2*dist), wanted complex pairs
at float cols [2*s*j, 2*s*j+1], j < n.  Output: packed (batch, 2*n).

Strategies:
  xla3     reshape (b, n', 2s) -> [..., :2]  (pure XLA minor slice)
  xla_cplx the library's current path cost proxy: deinterleave + strided
           slice per plane (measured via plan._gather on planes)
  pl_t     Pallas transpose trick: per 128-complex chunk, one
           (bt, 2s*128) transpose, strided sublane reads, one (256, bt)
           transpose back
  pl_r     Pallas in-VMEM reshape: block (bt, 2s*ct) -> (bt, ct, 2s)
           -> [..., :2] -> (bt, 2ct)

Usage: python scripts/probe_destride.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

B, N, S = 512, 65536, 2
DIST = S * N  # dense stride-2 rectangle (the bench layout)


def _sync(y):
    # block_until_ready returns immediately on tunneled runtimes (axon):
    # force a tiny readback of result-dependent data instead
    jax.device_get(y.ravel()[0:1])


def dev_time_ms(apply_k, iters=8):
    _sync(apply_k(iters))
    _sync(apply_k(2 * iters))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(apply_k(iters))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(apply_k(2 * iters))
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / iters if t2 > t1 else t2 / (2 * iters)
        best = d if best is None or d < best else best
    return best * 1e3


def chain(one, x):
    """Device-loop chain: python-loop dispatches of dead outputs are
    ELIDED by the tunneled runtime (measured 4 TB/s absurdities), so each
    iteration's result is folded back into the carry with a
    dynamic_update_slice — every pass is live, one dispatch per burst."""

    def body(i, a):
        y = one(a)
        return jax.lax.dynamic_update_slice(a, y, (0, 0))

    f = jax.jit(
        lambda xx, k: jax.lax.fori_loop(0, k, body, xx), static_argnums=1
    )
    return lambda k: f(x, k)


def verify(fn, x, ref):
    got = np.asarray(fn(x)[:2])
    return np.abs(got - ref[:2]).max()


def main():
    rng = np.random.default_rng(0)
    xh = rng.uniform(-1, 1, (B, 2 * DIST)).astype(np.float32)
    x = jnp.asarray(xh)
    ref = xh.reshape(B, N, 2 * S)[:, :, :2].reshape(B, 2 * N)
    gb = (2 * B * DIST * 4 + 2 * B * N * 4) / 1e9  # read all + write packed
    print(f"probe_destride B={B} N={N} s={S}: {gb:.3f} GB per pass")

    def xla3(a):
        return a.reshape(B, N, 2 * S)[:, :, :2].reshape(B, 2 * N)

    cases = [("xla3", xla3)]

    # Pallas transpose-trick kernel
    for bt, ct in ((128, 1024), (256, 512), (128, 512), (64, 2048)):
        def make_pt(bt, ct):
            L = 2 * S * ct

            def kern(x_ref, o_ref, s_ref, o_s):
                for j in range(ct // 128):
                    s_ref[...] = x_ref[
                        :, j * 2 * S * 128 : (j + 1) * 2 * S * 128
                    ].T
                    o_s[0::2, :] = s_ref[0 :: 2 * S, :]
                    o_s[1::2, :] = s_ref[1 :: 2 * S, :]
                    o_ref[:, j * 256 : (j + 1) * 256] = o_s[...].T

            def f(a):
                return pl.pallas_call(
                    kern,
                    grid=(B // bt, N // ct),
                    in_specs=[
                        pl.BlockSpec(
                            (bt, L), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM,
                        )
                    ],
                    out_specs=pl.BlockSpec(
                        (bt, 2 * ct), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct((B, 2 * N), a.dtype),
                    scratch_shapes=[
                        pltpu.VMEM((2 * S * 128, bt), a.dtype),
                        pltpu.VMEM((256, bt), a.dtype),
                    ],
                )(a)

            return f

        cases.append((f"pl_t bt={bt} ct={ct}", make_pt(bt, ct)))

    # Pallas in-VMEM reshape kernel (Mosaic rejected all variants on
    # chip round 5 — kept for the record, skipped by default)
    for bt, ct in ():
        def make_pr(bt, ct):
            L = 2 * S * ct

            def kern(x_ref, o_ref):
                blk = x_ref[...].reshape(bt, ct, 2 * S)
                o_ref[...] = blk[:, :, :2].reshape(bt, 2 * ct)

            def f(a):
                return pl.pallas_call(
                    kern,
                    grid=(B // bt, N // ct),
                    in_specs=[
                        pl.BlockSpec(
                            (bt, L), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM,
                        )
                    ],
                    out_specs=pl.BlockSpec(
                        (bt, 2 * ct), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct((B, 2 * N), a.dtype),
                )(a)

            return f

        cases.append((f"pl_r bt={bt} ct={ct}", make_pr(bt, ct)))

    for label, f in cases:
        try:
            err = verify(jax.jit(f), x, ref)
            if err > 0:
                print(f"  {label:22s} WRONG (max err {err})")
                continue
            ms = dev_time_ms(chain(f, x))
            print(
                f"  {label:22s} {ms:8.3f} ms  {gb / ms * 1e3:7.1f} GB/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"  {label:22s} ERROR {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
