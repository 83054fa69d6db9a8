#!/usr/bin/env python
"""Independent HBM streaming-ceiling probe (round-5 VERDICT #2).

Measures pure data movement — no FFT math — three ways, all with the
R-vs-2R iteration-count subtraction the bench uses for kernels (so the
probe and the kernels share a time basis; round-4's probe divided wall
time including the tunneled dispatch constant and was outrun by its own
kernels):

  xla     an elementwise +1 pass (read + write), fori_loop chained
  pallas  flat (bt, 128) copy through the automatic Pallas pipeline
          (double-buffered HBM->VMEM->HBM), block bytes swept
  dma     manual double-buffered make_async_copy kernel (explicit DMA,
          no pipeline machinery at all)

Reference counterpart: the bench harness's single-pass throughput
counter, /root/reference/test/bench/utils/ops_estimate.hpp:47-50.

Usage: python scripts/probe_dma.py [mib]   (default 384 MiB per buffer)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def _sync(y):
    # block_until_ready returns immediately on tunneled runtimes (axon):
    # force a tiny readback of result-dependent data instead
    jax.device_get(y.ravel()[0:1])


def dev_time_ms(apply_k, iters=8):
    """Device ms per application via t(2R) - t(R) subtraction.

    Each burst length is min-filtered SEPARATELY before subtracting —
    per-pair subtraction lets one noise-inflated t(R) sample produce an
    impossibly small delta that then wins the min (the bench rode that
    to "1412 GB/s" for a kernel against a 710 GB/s copy ceiling)."""
    _sync(apply_k(iters))
    _sync(apply_k(2 * iters))
    t1_min = t2_min = None
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(apply_k(iters))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(apply_k(2 * iters))
        t2 = time.perf_counter() - t0
        t1_min = t1 if t1_min is None else min(t1_min, t1)
        t2_min = t2 if t2_min is None else min(t2_min, t2)
    if t2_min > t1_min:
        return (t2_min - t1_min) / iters * 1e3
    return t2_min / (2 * iters) * 1e3


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    rows = mib * (1 << 20) // (128 * 4)
    x = jnp.ones((rows, 128), jnp.float32)
    gb = 2 * rows * 128 * 4 / 1e9  # read + write per pass
    print(f"probe_dma: buffer {mib} MiB, {gb:.3f} GB moved per pass")

    def chain(one):
        # x rides as an ARGUMENT — capturing it would bake a 384 MiB
        # constant into every executable (and ship it per compile over
        # the tunneled runtime)
        f = jax.jit(
            lambda xx, k: jax.lax.fori_loop(
                0, k, lambda i, a: one(a), xx
            ),
            static_argnums=1,
        )
        return lambda k: f(x, k)

    # --- XLA elementwise pass
    f = chain(lambda a: a + 1.0)
    ms = dev_time_ms(f)
    print(f"  xla +1 pass              {ms:8.3f} ms  {gb/ms*1e3:7.1f} GB/s")

    # --- Pallas pipelined copy, block-rows sweep
    for bt in (1024, 2048, 4096, 8192, 16384):
        if rows % bt:
            continue
        spec = pl.BlockSpec((bt, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        def copy_once(v, bt=bt, spec=spec):
            return pl.pallas_call(
                lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...]),
                grid=(rows // bt,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, 128), v.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)
                ),
            )(v)

        try:
            ms = dev_time_ms(chain(copy_once))
            print(f"  pallas copy bt={bt:<6d}    {ms:8.3f} ms"
                  f"  {gb/ms*1e3:7.1f} GB/s")
        except Exception as e:  # noqa: BLE001
            print(f"  pallas copy bt={bt:<6d}    ERROR {type(e).__name__}")

    # --- manual double-buffered DMA kernel
    for bt in (2048, 4096, 8192):
        if rows % bt:
            continue
        nchunks = rows // bt

        def dma_kernel(x_hbm, o_hbm, scratch, sems, bt=bt, nchunks=nchunks):
            def get_in(slot, idx):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(idx * bt, bt), :],
                    scratch.at[slot], sems.at[slot],
                )

            def put_out(slot, idx):
                return pltpu.make_async_copy(
                    scratch.at[slot],
                    o_hbm.at[pl.ds(idx * bt, bt), :], sems.at[2 + slot],
                )

            get_in(0, 0).start()

            def body(i, _):
                slot = i % 2
                nxt = (i + 1) % 2
                get_in(slot, i).wait()
                put_out(slot, i).start()

                @pl.when(i + 1 < nchunks)
                def _():
                    # scratch[nxt] is about to be overwritten by the next
                    # input; its previous output (chunk i-1) must be done
                    @pl.when(i >= 1)
                    def _():
                        put_out(nxt, i - 1).wait()

                    get_in(nxt, i + 1).start()

                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)
            if nchunks >= 2:
                put_out((nchunks - 2) % 2, nchunks - 2).wait()
            put_out((nchunks - 1) % 2, nchunks - 1).wait()

        def dma_once(v, bt=bt, nchunks=nchunks):
            return pl.pallas_call(
                dma_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct((rows, 128), v.dtype),
                scratch_shapes=[
                    pltpu.VMEM((2, bt, 128), v.dtype),
                    pltpu.SemaphoreType.DMA((4,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True
                ),
            )(v)

        try:
            ms = dev_time_ms(chain(dma_once))
            print(f"  manual dma  bt={bt:<6d}    {ms:8.3f} ms"
                  f"  {gb/ms*1e3:7.1f} GB/s")
        except Exception as e:  # noqa: BLE001
            print(f"  manual dma  bt={bt:<6d}    ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
