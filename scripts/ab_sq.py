#!/usr/bin/env python
"""A/B the single-sweep square engine (eng-5) against the eng-7 ladder
defaults at 2^17/2^18 with the BENCH protocol (unrolled chains, R-vs-2R).

Why: BENCH r5 measured large_1d (65536, eng-5 bt=2) at 293-301 GB/s
device while the eng-7 ladder rows run 165-175 — eng-5's one-grid-step-
per-bt-batches structure (every step reads one input block AND writes
one output block) is the library's fastest large-N shape, and
global_sq_supported enumerates at 2^17 (est 16.5 MB) and 2^18 (31 MB,
2x-slack gate; Mosaic adjudicates).  Winners recorded to the user cache.

Usage: python scripts/ab_sq.py [nlog ...]   (default 17 18)
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

BATCHES = {17: 1024, 18: 512, 19: 256, 20: 128}
R = 6


def main():
    nlogs = [int(a) for a in sys.argv[1:]] or [17, 18]
    device = pfft.resolve_device_config(jax.devices()[0]).name
    cases = {}
    incumbent = {}
    for nlog in nlogs:
        n, batch = 1 << nlog, BATCHES[nlog]
        plan = pfft.Descriptor(
            lengths=[n], number_of_transforms=batch
        ).commit(use_pallas=True)
        entry = plan._raw_fast.get(Direction.FORWARD)
        key = tuning._entry_key(plan, "global2")
        incumbent[nlog] = (key, tuning.lookup(device, "global2", key))
        rng = np.random.default_rng(3)
        xh = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
        x = jnp.asarray(xh)
        ref = np.fft.fft(xh.view(np.complex64).reshape(batch, n)[:2])
        gb = 2 * batch * n * 8 / 1e9
        variants = [("tuned", None)] + [
            (f"sq_bt{bt}", {"eng": 5, "bt": bt}) for bt in (1, 2)
        ]
        for label, ov in variants:
            try:
                fn = fastpath.build_fn(
                    plan, Direction.FORWARD, entry, 2 * batch * n,
                    overrides=dict(ov) if ov else None,
                )
                got = np.asarray(fn(x, plan._bank_arrays))
                gc = got.view(np.complex64).reshape(batch, n)[:2]
                rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
                assert rel < 1e-4, rel

                def mk(k, fn=fn, bank=plan._bank_arrays):
                    @jax.jit
                    def chained(raw):
                        y = raw
                        for _ in range(k):
                            y = fn(y, bank)
                        return y

                    return chained

                cr, c2r = mk(R), mk(2 * R)
                jax.device_get(cr(x).ravel()[0:1])
                jax.device_get(c2r(x).ravel()[0:1])
                cases[(nlog, label)] = (cr, c2r, x, gb, ov)
                print(f"2^{nlog} {label}: parity ok rel={rel:.1e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"2^{nlog} {label}: ERROR {type(e).__name__}: "
                      f"{str(e)[:110]}", flush=True)

    best = {}
    for _ in range(3):
        for k, (cr, c2r, x, gb, _) in cases.items():
            t0 = time.perf_counter()
            jax.device_get(cr(x).ravel()[0:1])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.device_get(c2r(x).ravel()[0:1])
            t2 = time.perf_counter() - t0
            d = (t2 - t1) / R
            if d > 0 and (k not in best or d < best[k]):
                best[k] = d
    win = {}
    for (nlog, label), d in sorted(best.items()):
        gb = cases[(nlog, label)][3]
        print(f"2^{nlog} {label:8s} {d*1e3:8.3f} ms  {gb/d:7.1f} GB/s",
              flush=True)
        if nlog not in win or d < win[nlog][0]:
            win[nlog] = (d, label)
    for nlog, (d, label) in sorted(win.items()):
        key, _ = incumbent[nlog]
        ov = cases[(nlog, label)][4]
        if ov is not None:
            tuning.record(device, "global2", key, dict(ov))
            print(f"WINNER 2^{nlog}: {label} {ov} -> recorded {key}",
                  flush=True)
        else:
            print(f"WINNER 2^{nlog}: tuned default stands", flush=True)


if __name__ == "__main__":
    main()
