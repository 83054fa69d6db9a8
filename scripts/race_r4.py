#!/usr/bin/env python
"""Targeted GLOBAL-ladder race: the shortlist of (split, variant) combos
the round-4 evidence says can win, raced on-chip with parity gates, and
the winners recorded into the user tuning cache.

Why not scripts/tune.py: its full split x variant sweep needs a warm XLA
cache (~20-40 s Mosaic compile per cold variant); a cold session can only
afford the contenders.  The shortlist comes from logs/r4f_probe_bf.log
(eng-7 race, device-time): eng7 t1=256 won 2^17/2^18 at A1 <= 4 splits,
tied the planner's A1=16 splits at 2^19/2^20 — so here the 2^19/2^20
races try the g1 in {512, 1024} splits the probe never reached.

Winners land as global_split + global2 cache entries (merge with
scripts/merge_tuning.py).  A current-default case that fails to compile
is forgotten (stale-winner purge — two round-3 winners already rotted
when the compile server tightened scoped-VMEM accounting).

Usage: python scripts/race_r4.py [n ...]
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

BATCHES = {
    65536: 2048,
    1 << 17: 1024,
    1 << 18: 512,
    1 << 19: 256,
    1 << 20: 128,
}

# Phase 2 (--phase2): the eng-7 winners landed (logs/r4s_race.log) at
# t1=256 everywhere; race the untried t1 tiles around each winner, plus
# one retry of the (1024, 1024) split whose first compile attempt died
# with an HTTP 500 from the compile helper (flake vs real VMEM reject).
CASES2 = {
    1 << 17: [
        ((512, 256), {"eng": 7, "t1": 256}),
        ((512, 256), {"eng": 7, "t1": 128}),
    ],
    1 << 18: [
        ((512, 512), {"eng": 7, "t1": 256}),
        ((512, 512), {"eng": 7, "t1": 128}),
        ((512, 512), {"eng": 7, "t1": 512}),
    ],
    1 << 19: [
        ((512, 1024), {"eng": 7, "t1": 256}),
        ((512, 1024), {"eng": 7, "t1": 128}),
        ((512, 1024), {"eng": 7, "t1": 512}),
        ((512, 1024), {"eng": 7, "t1": 1024}),
    ],
    1 << 20: [
        ((512, 2048), {"eng": 7, "t1": 256}),
        ((512, 2048), {"eng": 7, "t1": 128}),
        ((512, 2048), {"eng": 7, "t1": 512}),
        ((1024, 1024), {"eng": 7, "t1": 256}),
    ],
}

# n -> [((g1, g2), overrides)]; first entry = incumbent (current default)
CASES = {
    65536: [
        ((256, 256), {"eng": 5, "bt": 2}),
        ((256, 256), {"eng": 7, "t1": 256}),
    ],
    1 << 17: [
        ((256, 512), {"ds": 1, "eng": 2, "t1": 512, "t2": 256}),
        ((256, 512), {"eng": 7, "t1": 256}),
        ((512, 256), {"eng": 7, "t1": 256}),
    ],
    1 << 18: [
        ((512, 512), {"eng": 2, "t1": 512, "t2": 512}),
        ((512, 512), {"eng": 7, "t1": 256}),
    ],
    1 << 19: [
        ((2048, 256), {"eng": 2, "t1": 64, "t2": 512}),
        ((512, 1024), {"eng": 7, "t1": 256}),
        ((1024, 512), {"eng": 7, "t1": 256}),
        ((512, 1024), {"eng": 2, "t1": 256, "t2": 256}),
    ],
    1 << 20: [
        ((2048, 512), {"eng": 2, "t1": 64, "t2": 256}),
        ((512, 2048), {"eng": 7, "t1": 256}),
        ((1024, 1024), {"eng": 7, "t1": 256}),
        ((1024, 1024), {"eng": 2, "t1": 256, "t2": 256}),
    ],
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
        t1 = time.perf_counter()
        jax.device_get(chain(x, 2 * iters).ravel()[0:1])
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / iters
        if d > 0 and (best is None or d < best):
            best = d
    return (best or 1e9) * 1e3


def commit_at_split(n, batch, g1, g2, device):
    tuning.record(device, "global_split", f"n{n}", {"g1": g1, "g2": g2})
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch
    ).commit(use_pallas=True)
    p = plan.plans[n]
    assert (p.sub[0].n, p.sub[1].n) == (g1, g2), (
        f"planner ignored split {g1}x{g2}: got "
        f"{p.sub[0].n}x{p.sub[1].n}"
    )
    return plan


def race(n, device):
    batch = BATCHES[n]
    rng = np.random.default_rng(3)
    xh = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    x = jnp.asarray(xh)
    nv = min(4, batch)
    ref = np.fft.fft(xh.view(np.complex64).reshape(batch, n)[:nv])
    refn = np.linalg.norm(ref)
    gb = 2 * batch * n * 4 * 2 / 1e9

    saved_split = tuning.lookup(device, "global_split", f"n{n}")
    print(f"\nrace n={n} batch={batch} (incumbent split {saved_split})",
          flush=True)
    best = None  # (ms, g1, g2, overrides)
    try:
        for idx, ((g1, g2), ov) in enumerate(CASES[n]):
            label = f"g{g1}x{g2} {ov}"
            try:
                plan = commit_at_split(n, batch, g1, g2, device)
                entry = plan._raw_fast.get(Direction.FORWARD)
                assert entry is not None and entry[0] == "global2", entry
                fn = fastpath.build_fn(
                    plan, Direction.FORWARD, entry, 2 * batch * n,
                    overrides=dict(ov),
                )
                got = np.asarray(fn(x, plan._bank_arrays))
                gc = got.view(np.complex64).reshape(batch, n)[:nv]
                rel = np.linalg.norm(gc - ref) / refn
                if not rel < 1e-4:
                    print(f"  {label:44s} PARITY FAIL rel={rel:.2e}",
                          flush=True)
                    continue
                ms = dev_time(fn, x, plan._bank_arrays)
                print(f"  {label:44s} {ms:8.3f} ms {gb/ms*1e3:7.1f} GB/s",
                      flush=True)
                if best is None or ms < best[0]:
                    best = (ms, g1, g2, ov)
            except Exception as e:  # noqa: BLE001 — unattended agenda
                print(f"  {label:44s} ERROR {type(e).__name__}: "
                      f"{str(e)[:110]}", flush=True)
                if idx == 0:
                    # the incumbent default no longer builds: purge it so
                    # shipped defaults never carry a known-rotten winner
                    tuning.forget(device, "global2", f"n{n}_g{g1}x{g2}")
                    print(f"  purged stale default n{n}_g{g1}x{g2}",
                          flush=True)
    finally:
        if best is not None:
            _, g1, g2, ov = best
            tuning.record(device, "global_split", f"n{n}",
                          {"g1": g1, "g2": g2})
            tuning.record(device, "global2", f"n{n}_g{g1}x{g2}", dict(ov))
            print(f"  WINNER n={n}: split {g1}x{g2} {ov}  "
                  f"{best[0]:.3f} ms {gb/best[0]*1e3:.1f} GB/s",
                  flush=True)
        elif saved_split is not None:
            tuning.record(device, "global_split", f"n{n}", saved_split)
        else:
            tuning.forget(device, "global_split", f"n{n}")


def main():
    dev = jax.devices()[0]
    device = pfft.resolve_device_config(dev).name
    print(f"racing on {dev.device_kind} ({device})", flush=True)
    global CASES
    argv = [a for a in sys.argv[1:] if a != "--phase2"]
    if "--phase2" in sys.argv[1:]:
        CASES = CASES2
    sizes = [int(a) for a in argv] or list(CASES)
    for n in sizes:
        race(n, device)
    print("\ntuning cache:", tuning._USER_PATH, flush=True)


if __name__ == "__main__":
    main()
