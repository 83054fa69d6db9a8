#!/usr/bin/env python
"""Microbenchmarks for planner/kernel tuning on real TPU hardware.

Measures the primitives that set the framework's speed so the planner
constants (config.py) and kernel formulations can be chosen from data:

  python scripts/microbench.py matmul      # factor-size × precision sweep
  python scripts/microbench.py leaf        # XLA chain vs Pallas fused leaf
  python scripts/microbench.py io          # de/interleave strategies
  python scripts/microbench.py bw          # achievable HBM bandwidth
  python scripts/microbench.py all
"""

import sys
import time

import numpy as np


def _sync(arr):
    import jax

    jax.device_get(arr.ravel()[0:1])


def timeit(fn, *args, iters=10):
    r = fn(*args)
    _sync(r if not isinstance(r, (tuple, list)) else r[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(r if not isinstance(r, (tuple, list)) else r[0])
    return (time.perf_counter() - t0) / iters


def bench_bw():
    import jax
    import jax.numpy as jnp

    for mb in (64, 256, 1024):
        m = mb * 1024 * 1024 // 4
        x = jnp.asarray(np.ones(m, np.float32))
        f = jax.jit(lambda a: a + 1.0)
        t = timeit(f, x)
        print(f"bw copy+add {mb:5d}MB: {t*1e3:8.3f} ms  {m*8/t/1e9:7.1f} GB/s")


def bench_matmul():
    """DFT-factor matmul shapes: (rows, f) @ (f, f) across f and precision."""
    import jax
    import jax.numpy as jnp

    rows = 1 << 20
    for f in (8, 16, 32, 64, 128, 256):
        x = jnp.asarray(np.ones((rows, f), np.float32))
        w = jnp.asarray(np.ones((f, f), np.float32))
        for prec in ("default", "high", "highest"):
            p = dict(
                default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGH,
                highest=jax.lax.Precision.HIGHEST,
            )[prec]
            fn = jax.jit(lambda a, b, p=p: jnp.matmul(a, b, precision=p))
            t = timeit(fn, x, w)
            gf = 2 * rows * f * f / t / 1e9
            bw = rows * f * 8 / t / 1e9
            print(
                f"matmul f={f:4d} {prec:8s}: {t*1e3:8.3f} ms  "
                f"{gf:9.1f} GFLOP/s  {bw:7.1f} GB/s(data)"
            )


def bench_leaf():
    """Whole-leaf execution: XLA chain vs Pallas fused kernel."""
    import jax

    import portfft_tpu as pfft
    from portfft_tpu.enums import Direction

    for n, batch in ((256, 1 << 15), (1024, 1 << 13), (4096, 1 << 11)):
        rng = np.random.default_rng(0)
        xr = np.asarray(rng.uniform(-1, 1, (batch, n)), np.float32)
        xi = np.asarray(rng.uniform(-1, 1, (batch, n)), np.float32)
        import jax.numpy as jnp

        xrd, xid = jnp.asarray(xr), jnp.asarray(xi)
        for pallas in (False, True):
            plan = pfft.Descriptor(
                lengths=[n], number_of_transforms=batch
            ).commit(use_pallas=pallas)
            bank = plan._bank_arrays
            fn = jax.jit(
                lambda a, b: plan._core(a, b, Direction.FORWARD, bank)
            )
            try:
                t = timeit(fn, xrd, xid)
            except Exception as e:
                print(f"leaf n={n} pallas={pallas}: FAIL {str(e)[:80]}")
                continue
            flops = 5 * batch * n * np.log2(n)
            bw = batch * n * 16 / t / 1e9
            print(
                f"leaf n={n:5d} b={batch:6d} pallas={int(pallas)}: "
                f"{t*1e3:8.3f} ms  {flops/t/1e9:9.1f} GFLOP/s(5NlogN)  "
                f"{bw:7.1f} GB/s(1-pass)"
            )


def bench_io():
    """Interleaved buffer handling end to end through the public API."""
    import jax.numpy as jnp

    import portfft_tpu as pfft

    n, batch = 4096, 1 << 11
    rng = np.random.default_rng(0)
    raw = np.asarray(rng.uniform(-1, 1, 2 * batch * n), np.float32)
    raw_d = jnp.asarray(raw)
    plan = pfft.Descriptor(lengths=[n], number_of_transforms=batch).commit()
    t = timeit(plan.compute_forward, raw_d)
    print(
        f"io interleaved n={n} b={batch}: {t*1e3:8.3f} ms  "
        f"{batch*n*16/t/1e9:7.1f} GB/s(1-pass)"
    )
    re_d = jnp.asarray(np.ascontiguousarray(raw[0::2]))
    im_d = jnp.asarray(np.ascontiguousarray(raw[1::2]))
    plan_s = pfft.Descriptor(
        lengths=[n],
        number_of_transforms=batch,
        complex_storage=pfft.ComplexStorage.SPLIT_COMPLEX,
    ).commit()
    fn = lambda a, b: plan_s.compute_forward(a, b)[0]
    t = timeit(fn, re_d, im_d)
    print(
        f"io split       n={n} b={batch}: {t*1e3:8.3f} ms  "
        f"{batch*n*16/t/1e9:7.1f} GB/s(1-pass)"
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    if which in ("bw", "all"):
        bench_bw()
    if which in ("matmul", "all"):
        bench_matmul()
    if which in ("leaf", "all"):
        bench_leaf()
    if which in ("io", "all"):
        bench_io()


if __name__ == "__main__":
    main()
