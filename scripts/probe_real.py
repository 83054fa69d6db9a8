#!/usr/bin/env python
"""Attribute the REAL half-length path's device time: h-length C2C core
vs the untangle pass, at the bench real_large / real_131072 shapes.

The round-5 bench run measured real_large (n=8192, b=16384) at 14.6 ms
device — the h=4096 C2C core should cost ~3 ms at the bench's own
medium_large rate and the untangle pass one ~1 GB round trip, so ~7 ms
is unattributed.  This times each piece separately with unrolled-chain
R-vs-2R subtraction (the bench protocol).

Usage: python scripts/probe_real.py [n batch] ...
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu import fastpath  # noqa: E402
from portfft_tpu.enums import Direction, Domain  # noqa: E402
from portfft_tpu.ops import pallas_real  # noqa: E402

R = 6


def bench_fn(label, f, x, gb):
    def mk(k):
        @jax.jit
        def chained(v):
            y = v
            for _ in range(k):
                y = f(y)
            return y

        return chained

    try:
        cr, c2r = mk(R), mk(2 * R)
        jax.device_get(cr(x).ravel()[0:1])
        jax.device_get(c2r(x).ravel()[0:1])
    except Exception as e:  # noqa: BLE001
        print(f"  {label:28s} ERROR {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(cr(x).ravel()[0:1])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(c2r(x).ravel()[0:1])
        t2 = time.perf_counter() - t0
        d = (t2 - t1) / R
        if d > 0 and (best is None or d < best):
            best = d
    print(f"  {label:28s} {best*1e3:8.3f} ms  {gb/best:7.1f} GB/s(traffic)",
          flush=True)
    return best


def probe(n, batch):
    h = n // 2
    print(f"\nREAL n={n} b={batch} (h={h})", flush=True)
    desc = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, domain=Domain.REAL
    )
    plan = desc.commit(use_pallas=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, batch * n).astype(np.float32)
    )

    # full path (the library route, unrolled-chain timing needs matching
    # in/out shapes: full real fwd output is b*(n+2) floats — pad-trim)
    full = plan.compute_forward

    def full_loop(v):
        y = full(v)
        return y[: batch * n]  # shape-preserving for the chain

    bench_fn("full fwd (chained, trimmed)", full_loop, x,
             2 * batch * n * 4 / 1e9)

    # h-length C2C core alone on the same raw buffer
    ch = pfft.Descriptor(lengths=[h], number_of_transforms=batch)
    planh = ch.commit(use_pallas=True)
    entry = planh._raw_fast.get(Direction.FORWARD)
    fnh = fastpath.build_fn(planh, Direction.FORWARD, entry, batch * n)
    bank = planh._bank_arrays
    bench_fn("h-C2C core", lambda v: fnh(v, bank), x,
             2 * batch * n * 4 / 1e9)

    # untangle pass alone
    rkey = plan._bank_keys.get(("R", n, -1))
    if rkey is not None:
        rt = [plan._bank_arrays[rkey + "r"], plan._bank_arrays[rkey + "i"]]

        def unt(v):
            y = pallas_real.untangle_raw_call(
                v, batch, n, rt, plan.config
            )
            return y[: batch * n]

        bench_fn("untangle pass", unt, x, 2 * batch * n * 4 / 1e9)


def main():
    args = [int(a) for a in sys.argv[1:]]
    shapes = list(zip(args[0::2], args[1::2])) or [
        (8192, 16 * 1024), (131072, 1024)
    ]
    for n, b in shapes:
        probe(n, b)


if __name__ == "__main__":
    main()
