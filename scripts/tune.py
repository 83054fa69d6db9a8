#!/usr/bin/env python
"""Autotune the bench-set shapes on the attached TPU and print the results.

For every headline shape this measures the kernel-variant space (matmul row
tiles, batch tiles, two-pass lane tiles) via ``CommittedDescriptor.autotune``
and, for GLOBAL sizes, the four-step split itself — then persists winners to
the user tuning cache (~/.cache/portfft_tpu_tuning.json).  Merge the cache
into portfft_tpu/tuning_defaults.json to ship them.

Usage: python scripts/tune.py [n ...] [md]
(no args = every 1D bench-set size plus the 2D/3D bench shapes; numeric
args filter the 1D sizes, the literal ``md`` adds the multi-dim shapes)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
from portfft_tpu import tuning  # noqa: E402
from portfft_tpu.enums import Level  # noqa: E402

SHAPES = [
    (16, 8 * 1024 * 1024),
    (256, 512 * 1024),
    (512, 256 * 1024),
    (1024, 128 * 1024),
    (2048, 64 * 1024),
    (4096, 32 * 1024),
    (8192, 16 * 1024),
    (16384, 8 * 1024),
    (32768, 4 * 1024),
    (65536, 2048),
    (1 << 17, 1024),
    (1 << 18, 512),
    (1 << 19, 256),
    (1 << 20, 128),
]


def _sync(a):
    jax.device_get(a.ravel()[0:1])


def measure_plan(plan, x, iters=8, verify_n: int = 0) -> float:
    y = plan.compute_forward(x)
    _sync(y)
    if verify_n:
        # unattended-agenda safety: a tuned plan must match np.fft before
        # its time can crown a split/variant winner
        b = min(2, x.size // (2 * verify_n))
        got = (
            np.asarray(y[: 2 * b * verify_n])
            .view(np.complex64)
            .reshape(b, verify_n)
        )
        ref = np.fft.fft(
            np.asarray(x[: 2 * b * verify_n])
            .view(np.complex64)
            .reshape(b, verify_n),
            axis=1,
        )
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        if not rel < 1e-3:
            raise AssertionError(f"verification failed: rel={rel:.2e}")
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = plan.compute_forward(x)
        _sync(y)
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def tune_shape(n: int, batch: int, device: str) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    gb = batch * n * 16 / 1e9

    base_plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch
    ).commit()
    level = base_plan.plans[n].level

    if level != Level.GLOBAL:
        params = base_plan.autotune()
        t = measure_plan(base_plan, x, verify_n=n)
        print(f"n={n:8d} {base_plan.plans[n].describe():50s} "
              f"tuned={params} {t*1e3:8.3f} ms {gb/t:6.1f} GB/s", flush=True)
        return

    # GLOBAL: search the split space too.  Trial splits are recorded into
    # the user cache so the planner picks them up; the finally block always
    # leaves either the measured winner or no entry at all — never a trial
    # that declined or failed (and an aborted sweep cleans up too).
    from portfft_tpu.ops import pallas_global, pallas_global3

    best = None
    try:
        for g1 in (256, 512, 1024, 2048):
            if n % g1:
                continue
            g2 = n // g1
            if g2 < 8 or g2 > 2048:
                continue
            tuning.record(device, "global_split", f"n{n}",
                          {"g1": g1, "g2": g2})
            plan = pfft.Descriptor(
                lengths=[n], number_of_transforms=batch
            ).commit()
            p = plan.plans[n]
            if not (
                pallas_global3.global3_supported(p, plan.config)
                or pallas_global.global2_raw_supported(
                    p, plan.config.direct_threshold
                )
            ):
                print(f"  n={n} split {g1}x{g2}: engine declines",
                      flush=True)
                continue
            try:
                plan.autotune()  # records t1/t2 under the split key
                t = measure_plan(plan, x, verify_n=n)
            except Exception as exc:
                print(f"  n={n} split {g1}x{g2}: FAIL {str(exc)[:90]}",
                      flush=True)
                continue
            won = tuning.lookup(
                device, "global2", f"n{n}_g{g1}x{g2}"
            )
            print(f"  n={n} split {g1}x{g2} [{p.describe()}]: "
                  f"{t*1e3:8.3f} ms {gb/t:6.1f} GB/s  won={won}",
                  flush=True)
            if best is None or t < best[0]:
                best = (t, g1, g2)
    finally:
        if best is None:
            tuning.forget(device, "global_split", f"n{n}")
        else:
            tuning.record(device, "global_split", f"n{n}",
                          {"g1": best[1], "g2": best[2]})
    if best is None:
        print(f"n={n}: no viable split", flush=True)
        return
    t, g1, g2 = best
    print(f"n={n:8d} WINNER split {g1}x{g2}: {t*1e3:8.3f} ms "
          f"{gb/t:6.1f} GB/s", flush=True)


MD_SHAPES = [
    ([512, 512], 256),
    ([1024, 1024], 64),
    ([128, 128, 128], 32),
]

REAL_SHAPES = [  # bench real set (half-length raw path from n >= 1024)
    (2048, 64 * 1024),
    (8192, 16 * 1024),
]


def tune_real(n: int, batch: int) -> None:
    """Autotune a REAL-domain bench shape: the realf entry enumerates (and
    records under) its half-length sub-transform's variant space."""
    rng = np.random.default_rng(0)
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, domain=pfft.Domain.REAL
    ).commit()
    params = plan.autotune()
    x = jnp.asarray(rng.uniform(-1, 1, batch * n).astype(np.float32))
    y = plan.compute_forward(x)
    _sync(y)
    yh = np.asarray(y).ravel()
    got = (
        yh[: n // 2 + 1]
        if np.iscomplexobj(yh)
        else yh[: 2 * (n // 2 + 1)].view(np.complex64)
    )
    ref = np.fft.rfft(np.asarray(x[:n]))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-3, f"real n={n}: verification failed rel={rel:.2e}"
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(8):
            y = plan.compute_forward(x)
        _sync(y)
        ts.append((time.perf_counter() - t0) / 8)
    t = min(ts)
    gb = batch * n * 12 / 1e9  # real in + half-spectrum out + once more
    print(f"real n={n:6d} b={batch:6d} tuned={params} "
          f"{t*1e3:8.3f} ms {gb/t:6.1f} GB/s", flush=True)


def tune_multidim(lengths, batch) -> None:
    """Autotune a multi-dim bench shape (column-kernel lane tile + the
    reused 1D row tuning are measured through the multidim entry)."""
    rng = np.random.default_rng(0)
    total = batch
    for ln in lengths:
        total *= ln
    x = jnp.asarray(rng.uniform(-1, 1, 2 * total).astype(np.float32))
    plan = pfft.Descriptor(
        lengths=lengths, number_of_transforms=batch
    ).commit()
    params = plan.autotune()
    t = measure_plan(plan, x)
    gb = total * 16 / 1e9
    name = "x".join(str(ln) for ln in lengths)
    print(f"md {name:>12s} b={batch:5d} tuned={params} "
          f"{t*1e3:8.3f} ms {gb/t:6.1f} GB/s", flush=True)


def main() -> None:
    dev = jax.devices()[0]
    device = pfft.resolve_device_config(dev).name
    print(f"tuning on {dev.device_kind} ({device})", flush=True)
    # Stale marks (runtime compile failures of persisted winners,
    # tuning.mark_stale): report + purge so the re-measure below replaces
    # them with fresh, compile-verified winners.
    for sdev, kern, key, params in tuning.stale_entries(device):
        print(
            f"  purging stale entry {kern}/{key}: "
            f"{params.get('stale', '')[:80]}",
            flush=True,
        )
        tuning.forget(sdev, kern, key)
    shapes = SHAPES
    md = MD_SHAPES
    real = REAL_SHAPES
    if len(sys.argv) > 1:
        args = sys.argv[1:]
        md = MD_SHAPES if "md" in args else []
        real = REAL_SHAPES if "real" in args else []
        wanted = {int(a) for a in args if a not in ("md", "real")}
        shapes = [(nn, bb) for nn, bb in SHAPES if nn in wanted]
    for n, batch in shapes:
        tune_shape(n, batch, device)
    for lengths, batch in md:
        tune_multidim(lengths, batch)
    for n, batch in real:
        tune_real(n, batch)
    print("tuning cache:", tuning._USER_PATH, flush=True)


if __name__ == "__main__":
    main()
