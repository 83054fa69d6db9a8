#!/usr/bin/env python
"""A/B the fused2 n=4096 default at the HEADLINE bench shape.

The md/real tune sweep crowned {'bt': 32, 'eng': 4, 'flat': 1} on the
shared fused2/n4096 sub-entry — measured through the REAL wrapper at
b=16384.  That entry is also the headline medium_large_1d default
(N=4096, b=32768 plain C2C), so confirm flat wins there too before the
round bench inherits it; if it loses, restore the ds winner.
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
from portfft_tpu import fastpath, tuning  # noqa: E402
from portfft_tpu.enums import Direction  # noqa: E402

N, BATCH = 4096, 32768
CANDS = [
    {"bt": 32, "eng": 4, "flat": 1},
    {"bt": 32, "ds": 1, "eng": 4},
]


def dev_time(fn, x, bank, iters=6):
    chain = jax.jit(
        lambda raw, k: jax.lax.fori_loop(
            0, k, lambda i, y: fn(y, bank), raw
        )
    )
    jax.device_get(chain(x, 1).ravel()[0:1])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chain(x, iters).ravel()[0:1])
        t1 = time.perf_counter()
        jax.device_get(chain(x, 2 * iters).ravel()[0:1])
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / iters
        if d > 0 and (best is None or d < best):
            best = d
    return (best or 1e9) * 1e3


def main():
    dev = jax.devices()[0]
    device = pfft.resolve_device_config(dev).name
    print(f"A/B fused2 n={N} b={BATCH} on {dev.device_kind}", flush=True)
    rng = np.random.default_rng(5)
    xh = rng.uniform(-1, 1, 2 * BATCH * N).astype(np.float32)
    x = jnp.asarray(xh)
    nv = 4
    ref = np.fft.fft(xh.view(np.complex64).reshape(BATCH, N)[:nv])
    refn = np.linalg.norm(ref)
    gb = 2 * BATCH * N * 4 * 2 / 1e9

    plan = pfft.Descriptor(
        lengths=[N], number_of_transforms=BATCH
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None, "no fastpath entry for n=4096"

    best = None
    for ov in CANDS:
        label = str(ov)
        try:
            fn = fastpath.build_fn(
                plan, Direction.FORWARD, entry, 2 * BATCH * N,
                overrides=dict(ov),
            )
            got = np.asarray(fn(x, plan._bank_arrays))
            gc = got.view(np.complex64).reshape(BATCH, N)[:nv]
            rel = np.linalg.norm(gc - ref) / refn
            if not rel < 1e-4:
                print(f"  {label:36s} PARITY FAIL rel={rel:.2e}",
                      flush=True)
                continue
            ms = dev_time(fn, x, plan._bank_arrays)
            print(f"  {label:36s} {ms:8.3f} ms {gb/ms*1e3:7.1f} GB/s",
                  flush=True)
            if best is None or ms < best[0]:
                best = (ms, ov)
        except Exception as e:  # noqa: BLE001 — unattended agenda
            print(f"  {label:36s} ERROR {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    if best is not None:
        tuning.record(device, "fused2", f"n{N}", dict(best[1]))
        print(f"WINNER n={N}: {best[1]}  {best[0]:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
