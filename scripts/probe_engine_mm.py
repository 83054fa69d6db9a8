#!/usr/bin/env python
"""A/B the two-pass GLOBAL engine's widened-matmul (mm) sub-DFTs on TPU.

Measures the raw fastpath at GLOBAL bench shapes with the mm lane-DFTs on
vs off (overrides {"mm": 1} / {"mm": 0}), round-robin interleaved so both
arms see the same chip weather.  Tile parameters come from the shipped
tuning defaults (same as production).

Usage: python scripts/probe_engine_mm.py [n ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu import fastpath, tuning  # noqa: E402
from portfft_tpu.enums import Direction  # noqa: E402

SHAPES = [(65536, 2048), (1 << 17, 1024), (1 << 18, 512),
          (1 << 19, 256), (1 << 20, 128)]


def main() -> None:
    print("device:", jax.devices()[0].device_kind, flush=True)
    shapes = SHAPES
    if len(sys.argv) > 1:
        wanted = {int(a) for a in sys.argv[1:]}
        shapes = [(nn, bb) for nn, bb in SHAPES if nn in wanted]
    for n, batch in shapes:
        plan = pfft.Descriptor(
            lengths=[n], number_of_transforms=batch
        ).commit()
        entry = plan._raw_fast.get(Direction.FORWARD)
        if entry is None or entry[0] != "global2":
            print(f"n={n}: no global2 fastpath ({entry and entry[0]})",
                  flush=True)
            continue
        base = tuning.lookup(
            plan.config.name, "global2", tuning._entry_key(plan, "global2")
        ) or {}
        base = {k: v for k, v in base.items() if k in ("t1", "t2", "eng")}
        if base.get("eng", 2) != 2:
            base = {}
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
        )
        fns = {}
        for arm in (0, 1):
            ov = dict(base)
            ov["mm"] = arm
            ov.setdefault("eng", 2)
            try:
                traced = fastpath.build_fn(
                    plan, Direction.FORWARD, entry, 2 * batch * n,
                    overrides=ov,
                )
                fn = jax.jit(traced)
                r = fn(x, plan._bank_arrays)
                jax.device_get(r.ravel()[0:1])
                fns[arm] = (fn, r)
            except Exception as exc:
                print(f"n={n} mm={arm}: FAILED {str(exc)[:120]}", flush=True)
        if len(fns) < 2:
            continue
        # correctness spot check (first 4 rows)
        xc = np.asarray(x).view(np.complex64).reshape(batch, n)[:4]
        ref = np.fft.fft(xc, axis=1)
        for arm, (_, r) in fns.items():
            gc = (
                np.asarray(r).view(np.complex64).reshape(batch, n)[:4]
            )
            rel = np.max(np.abs(gc - ref)) / np.max(np.abs(ref))
            print(f"n={n} mm={arm}: rel {rel:.2e}", flush=True)
        best = {0: 1e9, 1: 1e9}
        for _ in range(4):
            for arm, (fn, _) in fns.items():
                t0 = time.perf_counter()
                for _ in range(6):
                    r = fn(x, plan._bank_arrays)
                jax.device_get(r.ravel()[0:1])
                best[arm] = min(
                    best[arm], (time.perf_counter() - t0) / 6
                )
        gb = 2 * batch * n * 4 * 2 / 1e9  # one read + one write per pass x2
        for arm in (0, 1):
            t = best[arm]
            print(
                f"n={n:8d} mm={arm} tiles={base}: {t*1e3:8.3f} ms "
                f"{gb/t/2:6.1f} GB/s-per-pass", flush=True,
            )
        win = "mm" if best[1] < best[0] else "narrow"
        print(
            f"n={n:8d} WINNER {win} "
            f"({best[0]/min(best.values()):.3f} vs "
            f"{best[1]/min(best.values()):.3f})", flush=True,
        )


if __name__ == "__main__":
    main()
