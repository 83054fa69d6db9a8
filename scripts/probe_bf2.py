#!/usr/bin/env python
"""Race the bf2 (relayout-lean) variant of the butterfly-factored GLOBAL
engine against the round-4 eng-7 winners, on-chip, device time.

Round-4 verdict: eng-7 delivers 145-180 GB/s on the ladder against
eng-6's measured 271 GB/s pure-data-movement rate — the gap is phase-A
relayout (A1 sequential (t1, 128) transposes + slab concatenate + A1
store transposes) plus the streamed GB twiddle (8n/A1 HBM bytes).  bf2
restructures exactly those: ONE whole-block input transpose, resident
factored GB (B1/B2), one-store tile epilogue (st3), 2-D phase-B matmul.

Usage: python scripts/probe_bf2.py [n ...]   (default: 65536..2^20)
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
from portfft_tpu.enums import Direction  # noqa: E402


SIZES = {
    65536: 2048,
    1 << 17: 1024,
    1 << 18: 512,
    1 << 19: 256,
    1 << 20: 128,
}


def dev_time(fn, x, bank, iters=6):
    """R-vs-2R chained device time per application (ms)."""
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
        t_1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(chain(x, 2 * iters).ravel()[0:1])
        t_2 = time.perf_counter() - t0
        d = (t_2 - t_1) / iters if t_2 > t_1 else t_2 / (2 * iters)
        best = d if best is None or d < best else best
    return best * 1e3


def main():
    sizes = [int(a) for a in sys.argv[1:]] or list(SIZES)
    for n in sizes:
        batch = SIZES.get(n) or max(1, (1 << 27) // n)
        plan = pfft.Descriptor(
            lengths=[n], number_of_transforms=batch
        ).commit(use_pallas=True)
        p0 = plan.plans[n]
        if p0.sub is None:
            print(f"n={n}: not GLOBAL — skipped")
            continue
        g1, g2 = p0.sub[0].n, p0.sub[1].n
        print(f"\nprobe_bf2 n={n} g={g1}x{g2} batch={batch}", flush=True)
        entry = plan._raw_fast.get(Direction.FORWARD)
        if entry is None or entry[0] != "global2":
            print("  no global2 raw entry — skipped")
            continue
        rng = np.random.default_rng(3)
        xh = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
        x = jnp.asarray(xh)
        nv = min(4, batch)
        ref = np.fft.fft(xh.view(np.complex64).reshape(batch, n)[:nv])
        gb = 2 * batch * n * 4 * 2 / 1e9

        from portfft_tpu import tuning

        tuned = tuning.lookup(
            plan.config.name, entry[0], tuning._entry_key(plan, entry[0])
        ) or {}
        cases = []
        if tuned:
            cases.append((f"tuned{tuned}", dict(tuned)))
        for t1 in (128, 256):
            if g2 % t1 == 0:
                cases.append((f"eng7 t1={t1}", {"eng": 7, "t1": t1}))
        for t1 in (128, 256):
            if g2 % t1 == 0:
                cases.append((f"ilv t1={t1}", {"eng": 8, "t1": t1}))

        # compile + parity-gate every case first, then time them
        # ROUND-ROBIN in one window — the chip rate drifts 2x within a
        # process, so sequential per-case timing conflates variant
        # quality with chip weather (tuning._measure_round_robin).
        fns = {}
        for label, ov in cases:
            try:
                fn = fastpath.build_fn(
                    plan, Direction.FORWARD, entry, 2 * batch * n,
                    overrides=ov or None,
                )
                # pull ONLY the verify rows — the full result is ~1 GB and
                # the tunneled host readback would dominate the probe
                got = np.asarray(fn(x, plan._bank_arrays)[: 2 * nv * n])
                gc = got.view(np.complex64).reshape(nv, n)
                rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
                if not rel < 1e-4:
                    print(f"  {label:24s} PARITY FAIL rel={rel:.2e}")
                    continue
                fns[label] = fn
            except Exception as e:  # noqa: BLE001 — unattended agenda
                print(f"  {label:24s} ERROR {type(e).__name__}: {e}")
        best = tuning._measure_round_robin(
            fns, x, plan._bank_arrays, iters=6, rounds=3
        )
        for label in fns:
            t = best.get(label)
            if t is None:
                print(f"  {label:24s} (no timing)")
                continue
            ms = t * 1e3
            print(
                f"  {label:24s} {ms:8.3f} ms  {gb / ms * 1e3:7.1f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
