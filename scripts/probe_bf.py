#!/usr/bin/env python
"""Race the butterfly-factored GLOBAL engine ({"eng": 7}) against the
round-3 winners at the ladder sizes, on-chip, pure device time.

Context: probe_eng6 (logs/r4d_probe_eng6.log) measured the eng-6 fused
engine COMPUTE-bound at 2^17 — data movement alone streams 271 GB/s but
the dense lane-DFT matmuls triple the time.  eng 7 replaces the dense
g-point DFT matmuls (768-1024 cMAC/pt at ladder splits) with
butterfly + digit-twiddle + one 128-matmul (256 cMAC/pt total), keeping
the single-sweep HBM shape.  This probe answers: does the FLOP cut
materialize as wall-clock on real hardware, and which t1 wins?

Engines raced per size (each parity-checked against np.fft before its
time counts):
  eng2   two-pass plane engine, round-3 tuned tiles
  eng6   fused single-sweep engine, best known tiles (+ftw)
  eng7   butterfly-factored single-sweep, t1 in {128, 256}

Usage: python scripts/probe_bf.py [n ...]   (default: 65536..2^20)
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
        g1, g2 = p0.sub[0].n, p0.sub[1].n
        print(f"\nprobe_bf n={n} g={g1}x{g2} batch={batch}", flush=True)
        entry = plan._raw_fast.get(Direction.FORWARD)
        if entry is None or entry[0] != "global2":
            print("  no global2 raw entry — skipped")
            continue
        rng = np.random.default_rng(3)
        xh = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
        x = jnp.asarray(xh)
        # np.fft on the first 4 rows only (full-batch host FFT is slow)
        nv = min(4, batch)
        ref = np.fft.fft(xh.view(np.complex64).reshape(batch, n)[:nv])
        gb = 2 * batch * n * 4 * 2 / 1e9

        cases = [("eng2 static", {"eng": 2})]
        from portfft_tpu import tuning

        tuned = tuning.lookup(
            plan.config.name, entry[0], tuning._entry_key(plan, entry[0])
        ) or {}
        if tuned:
            cases.append((f"tuned{tuned}", dict(tuned)))
        for t1, t2 in ((64, 256), (128, 256)):
            if g2 % t1 == 0 and g1 % t2 == 0:
                cases.append(
                    (f"eng6 t1={t1} t2={t2} ftw",
                     {"eng": 6, "t1": t1, "t2": t2, "ftw": 1})
                )
                break
        for t1 in (128, 256):
            if g2 % t1 == 0:
                cases.append((f"eng7 t1={t1}", {"eng": 7, "t1": t1}))

        for label, ov in cases:
            try:
                fn = fastpath.build_fn(
                    plan, Direction.FORWARD, entry, 2 * batch * n,
                    overrides=ov or None,
                )
                got = np.asarray(fn(x, plan._bank_arrays))
                gc = got.view(np.complex64).reshape(batch, n)[:nv]
                rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
                if not rel < 1e-4:
                    print(f"  {label:24s} PARITY FAIL rel={rel:.2e}")
                    continue
                ms = dev_time(fn, x, plan._bank_arrays)
                print(
                    f"  {label:24s} {ms:8.3f} ms  {gb / ms * 1e3:7.1f} GB/s"
                    f"  rel={rel:.1e}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — unattended agenda
                print(f"  {label:24s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
