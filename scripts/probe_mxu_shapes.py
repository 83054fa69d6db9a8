"""MXU rate vs matmul shape for the fused2/engine stage matmuls.

Round-3 ablation: fused2 N=4096 is matmul-bound — mm_only 10.5 ms =
~39 TFLOP/s effective, i.e. ~20% of the v5e bf16 MXU peak.  Either the
stage shapes are MXU-hostile (narrow M, 3D batched contractions) or the
"matmul" time is actually split/concat VPU work.  This probe times pure
matmul kernels at the exact stage shapes, all data VMEM-resident
(grid revisits one tiny block), so HBM plays no part:

  a_kstack   (2a,6a)@(6a,bt*128)      stage-A kstack, a=32, bt=32
  b_kara3d   a x [(bt,128)@(128,128)] stage-B batched 3D (current form)
  b_kara2d   (a*bt,128)@(128,128)     stage-B flattened to one big M
  b_kara2d9  nine of the above        full Karatsuba matmul count
  sq_256     (256,256)@(256,256) x9   the single-pass square kernel stage
  big_ref    (1024,1024)@(1024,1024)  sanity: near-peak reference point

Each kernel loops its matmul REPS times inside the kernel body (carry
dependency defeats dead-code elimination), grid=GRID re-runs it; rate =
flops_total / time.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

REPS = 32
GRID = 64


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def make_case(name, mk_inputs, body, flops_per_rep):
    """mk_inputs() -> list of bf16 arrays resident in VMEM; body(xs) -> f32
    array whose first element feeds the carry."""
    xs = mk_inputs()
    specs = [
        pl.BlockSpec(x.shape, (lambda *_, nd=x.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for x in xs
    ]

    def kern(*refs):
        ins = [r[...] for r in refs[:-1]]
        o_ref = refs[-1]
        acc = jnp.float32(0)
        for _ in range(REPS):
            y = body([ins[0] + acc.astype(jnp.bfloat16)] + ins[1:])
            acc = y.reshape(-1)[0]
        o_ref[0, 0] = acc

    def fn():
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(*xs)

    return name, jax.jit(fn), flops_per_rep * REPS * GRID


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    def bf(*shape):
        return jnp.asarray(
            rng.uniform(-1, 1, shape).astype(np.float32)
        ).astype(jnp.bfloat16)

    a, bt = 32, 32
    L = bt * 128
    cases = [
        make_case(
            "a_kstack",
            lambda: [bf(2 * a, 6 * a), bf(6 * a, L)],
            lambda xs: _mm(xs[0], xs[1]),
            2 * (2 * a) * (6 * a) * L,
        ),
        make_case(
            "b_kara3d",
            lambda: [bf(a, bt, 128), bf(128, 128)],
            lambda xs: _mm(xs[0], xs[1]),
            2 * a * bt * 128 * 128,
        ),
        make_case(
            "b_kara2d",
            lambda: [bf(a * bt, 128), bf(128, 128)],
            lambda xs: _mm(xs[0], xs[1]),
            2 * a * bt * 128 * 128,
        ),
        make_case(
            "b_kara2d9",
            lambda: [bf(a * bt, 128)] + [bf(128, 128) for _ in range(9)],
            lambda xs: sum(_mm(xs[0], w) for w in xs[1:]),
            9 * 2 * a * bt * 128 * 128,
        ),
        make_case(
            "b_kara3d9",
            lambda: [bf(a, bt, 128)] + [bf(128, 128) for _ in range(9)],
            lambda xs: sum(_mm(xs[0], w) for w in xs[1:]),
            9 * 2 * a * bt * 128 * 128,
        ),
        make_case(
            "a_kstack_T",
            lambda: [bf(L, 6 * a), bf(6 * a, 2 * a)],
            lambda xs: _mm(xs[0], xs[1]),
            2 * (2 * a) * (6 * a) * L,
        ),
        make_case(
            "sq_256x9",
            lambda: [bf(256, 256)] + [bf(256, 256) for _ in range(9)],
            lambda xs: sum(_mm(xs[0], w) for w in xs[1:]),
            9 * 2 * 256 ** 3,
        ),
        make_case(
            "big_ref",
            lambda: [bf(1024, 1024), bf(1024, 1024)],
            lambda xs: _mm(xs[0], xs[1]),
            2 * 1024 ** 3,
        ),
    ]
    warm = []
    for name, fn, fl in cases:
        try:
            t0 = time.perf_counter()
            y = fn()
            jax.device_get(y)
            warm.append((name, fn, fl))
            # incremental: a slow-window timeout keeps the partial record
            print(f"warm {name:12s} {time.perf_counter() - t0:7.1f} s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)
    best = {}
    for rnd in range(3):
        for name, fn, fl in warm:
            t0 = time.perf_counter()
            for _ in range(4):
                y = fn()
            jax.device_get(y)
            t = (time.perf_counter() - t0) / 4
            r = best.get(name)
            if r is None or t < r[0]:
                best[name] = (t, fl)
        # the block shows the running best across ALL rounds so far, not
        # this round's own timings — label it as such
        for name, (t, fl) in best.items():
            print(
                f"best@r{rnd} {name:12s} {t*1e3:8.3f} ms  "
                f"{fl/t/1e12:7.2f} TFLOP/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
