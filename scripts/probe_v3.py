"""On-chip probe: v3 interleaved-stage fused2 kernel vs the shipped v2.

v3 (ops/pallas_fft.py fused2_raw_v3_call): the input is never
deinterleaved — stage A runs as a left complex matmul on the interleaved
block, the twiddle applies via lane rolls, stage B right-multiplies by
split-output interleaved tables.  Removes the per-tile deinterleave
transposes that capped the fused2 family at ~190-200 GB/s (round 2).

Run on the TPU with ``python -u``; comparisons are in-process only
(chip rate varies 2x between sessions).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

import portfft_tpu as pfft
from portfft_tpu.config import enable_persistent_cache
enable_persistent_cache()  # noqa: E402
from portfft_tpu import fastpath  # noqa: E402
from portfft_tpu.enums import Direction  # noqa: E402


def measure(fn, *args, iters=10):
    r = fn(*args)
    jax.device_get(r.ravel()[0:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.device_get(r.ravel()[0:1])
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts), r


def ceiling_probe():
    x = jnp.arange(192 * 2**20 // 4, dtype=jnp.float32)

    @jax.jit
    def cp(v):
        return v + 1.0

    t, _ = measure(cp, x, iters=20)
    gbps = 2 * x.size * 4 / t / 1e9
    print(f"ceiling probe: {gbps:.1f} GB/s", flush=True)
    return gbps


def build_v3_tables(a, sign, scale=1.0):
    from portfft_tpu.ops import pallas_fft, xla_fft

    bank = xla_fft.TwiddleBank(np.float32)
    wa = bank.dft(a, sign)
    e = bank.twiddle_expanded(a, 128, sign)
    g = pallas_fft.fold_factor(a)
    vs = bank.vmat_split(128, sign, g, scale)
    arrs = bank.device_arrays()
    return [arrs[wa + "r"], arrs[wa + "i"], arrs[e + "r"], arrs[e + "i"],
            arrs[vs + "r"], arrs[vs + "i"]]


def run_case(n, batch, bts):
    from portfft_tpu.ops import pallas_fft

    print(f"\n== N={n} b={batch} ==", flush=True)
    a = n // 128
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    xd = jnp.asarray(x)
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))

    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit()
    plan0 = plan.plans[n]
    entry = plan._raw_fast.get(Direction.FORWARD)
    bank = plan._bank_arrays
    if entry is not None:
        fn = fastpath.build_fn(plan, Direction.FORWARD, entry, 2 * batch * n)
        t, r = measure(jax.jit(fn), xd, bank)
        gbps = 2 * batch * n * 8 / t / 1e9
        gc = np.asarray(r).view(np.complex64).reshape(batch, n)
        err = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
        print(f"  v2 tuned: {t*1e3:8.3f} ms  {gbps:7.1f} GB/s  rel={err:.2e}",
              flush=True)

    tables = build_v3_tables(a, -1)
    for bt in bts:
        if batch % bt:
            continue
        try:
            f = jax.jit(
                lambda v, bt=bt: pallas_fft.fused2_raw_v3_call(
                    v, batch, plan0, tables, plan.config, bt_override=bt
                )
            )
            t, r = measure(f, xd)
        except Exception as e:
            print(f"  v3 bt={bt}: FAILED {str(e)[:140]}", flush=True)
            continue
        gbps = 2 * batch * n * 8 / t / 1e9
        gc = np.asarray(r).view(np.complex64).reshape(batch, n)
        err = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
        print(f"  v3 bt={bt:3d}: {t*1e3:8.3f} ms  {gbps:7.1f} GB/s  "
              f"rel={err:.2e}", flush=True)


def reshape_probe():
    """Cost of reshaping the flat buffer to (batch, g1, 2g2) at HBM scale."""
    batch, g1, g2 = 2048, 256, 256
    total = 2 * batch * g1 * g2
    x = jnp.arange(total, dtype=jnp.float32)

    def copy_flat(v):
        x2 = v.reshape(total // 128, 128)
        spec = pl.BlockSpec((4096, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...]),
            grid=(total // 128 // 4096,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((total // 128, 128), v.dtype),
        )(x2)
        return out.reshape(total)

    def copy_3d(v):
        x3 = v.reshape(batch, g1, 2 * g2)
        spec = pl.BlockSpec((1, g1, 2 * g2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...]),
            grid=(batch,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((batch, g1, 2 * g2), x3.dtype),
        )(x3)
        return out.reshape(total)

    for name, fn in (("flat", copy_flat), ("3d-reshaped", copy_3d)):
        t, _ = measure(jax.jit(fn), x, iters=10)
        gbps = 2 * total * 4 / t / 1e9
        print(f"  copy {name}: {t*1e3:8.3f} ms  {gbps:7.1f} GB/s", flush=True)


def run_global_case(n, batch, t1t2s):
    """v3 two-pass engine vs the shipped v2 at a GLOBAL bench shape."""
    from portfft_tpu.ops import pallas_global3 as g3

    print(f"\n== GLOBAL N={n} b={batch} ==", flush=True)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    xd = jnp.asarray(x)
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))

    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit()
    plan0 = plan.plans[n]
    print("plan:", plan0.describe(), flush=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    bank = plan._bank_arrays
    if entry is not None:
        # v2 tuned (entries without "eng" force engine 2)
        fn = fastpath.build_fn(plan, Direction.FORWARD, entry, 2 * batch * n)
        t, r = measure(jax.jit(fn), xd, bank)
        gbps = 2 * batch * n * 8 / t / 1e9
        gc = np.asarray(r).view(np.complex64).reshape(batch, n)
        err = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
        print(f"  default({'v3' if entry[4] and False else 'tuned'}): "
              f"{t*1e3:8.3f} ms  {gbps:7.1f} GB/s  rel={err:.2e}", flush=True)

    g1p, g2p = plan0.sub
    bankh = plan._bank
    for t1, t2 in t1t2s:
        if g2p.n % t1 or g1p.n % t2:
            continue
        names1 = g3.p1_table_names(g1p, n, t1, -1, bankh)
        vs = bankh.vmat_split(g2p.n, -1, 1, 1.0)
        arrs = bankh.device_arrays()
        fn3 = g3.build_call(plan0, -1, names1, vs, plan.config, None, t1, t2)
        if fn3 is None:
            print(f"  v3 t1={t1} t2={t2}: no tiling", flush=True)
            continue
        try:
            f = jax.jit(lambda v, fn3=fn3: fn3(v, batch, arrs))
            t, r = measure(f, xd)
        except Exception as e:
            print(f"  v3 t1={t1} t2={t2}: FAILED {str(e)[:140]}", flush=True)
            continue
        gbps = 2 * batch * n * 8 / t / 1e9
        gc = np.asarray(r).view(np.complex64).reshape(batch, n)
        err = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
        print(f"  v3 t1={t1:3d} t2={t2:3d}: {t*1e3:8.3f} ms  {gbps:7.1f} GB/s"
              f"  rel={err:.2e}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    ceiling_probe()
    args = sys.argv[1:]
    if not args or "fused" in args:
        run_case(4096, 32768, bts=(16, 32))
        run_case(1024, 131072, bts=(32, 64))
        run_case(32768, 4096, bts=(2, 4))
    if not args or "global" in args:
        run_global_case(65536, 2048, [(256, 256), (128, 256), (128, 128)])
        run_global_case(1 << 20, 128, [(128, 256), (64, 256), (64, 128)])
    if not args or "reshape" in args:
        print("\n== reshape relayout probe ==", flush=True)
        reshape_probe()
    ceiling_probe()
