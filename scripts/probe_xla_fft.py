"""XLA's built-in FFT (jnp.fft.fft -> FftOp) vs the committed Pallas plans.

Answers the design question "why not just lower to XLA's native FftOp on
TPU?" with numbers instead of folklore, at each bench level:

  xla_cpx     jnp.fft.fft on a resident complex64 (batch, n) array — the
              best case XLA's op can do (no layout work)
  xla_raw     raw interleaved f32 buffer -> complex view -> fft -> raw
              (apples-to-apples with the library's raw fast path)
  lib         the committed plan's compute_forward on the same raw buffer

If xla_* ever wins a shape, it becomes a dispatch variant; if it loses
everywhere, this log is the recorded justification for the custom kernels.
Round-robin burst timing (the chip rate drifts in-process; adjacent
measurements only — see docs/ROUND3.md chip-weather notes).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

# The axon sitecustomize pins the platform before user code runs; honor an
# explicit JAX_PLATFORMS (e.g. cpu smoke tests) via the live config too.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import portfft_tpu as pfft  # noqa: E402

SHAPES = [
    (16, 8 * 1024 * 1024),
    (256, 512 * 1024),
    (4096, 32 * 1024),
    (65536, 2048),
    (1 << 20, 128),
]


def probe_shape(n: int, batch: int) -> None:
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
    cpx = jnp.asarray(
        rng.uniform(-1, 1, (batch, n)).astype(np.float32)
        + 1j * rng.uniform(-1, 1, (batch, n)).astype(np.float32)
    )

    plan = pfft.Descriptor(lengths=[n], number_of_transforms=batch).commit()

    def xla_cpx(z):
        return jnp.fft.fft(z, axis=-1)

    def xla_raw(v):
        m = v.reshape(batch, n, 2)
        z = jnp.fft.fft(jax.lax.complex(m[..., 0], m[..., 1]), axis=-1)
        return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).reshape(-1)

    cases = []
    for name, fn, arg in (
        ("xla_cpx", jax.jit(xla_cpx), cpx),
        ("xla_raw", jax.jit(xla_raw), raw),
        ("lib", plan.compute_forward, raw),
    ):
        try:
            r = fn(arg)
            jax.device_get(r.ravel()[0:1])
            cases.append((name, fn, arg))
        except Exception as e:
            print(f"  n={n} {name}: FAILED {str(e)[:140]}", flush=True)

    # correctness spot-check of xla_raw vs numpy (first transform)
    ref = np.fft.fft(
        np.asarray(raw[: 2 * n : 2]) + 1j * np.asarray(raw[1 : 2 * n : 2])
    )
    for name, fn, arg in cases:
        if name != "xla_raw":
            continue
        got = np.asarray(jax.device_get(fn(arg)))[: 2 * n]
        z = got[0::2] + 1j * got[1::2]
        rel = np.linalg.norm(z - ref) / np.linalg.norm(ref)
        print(f"  n={n} xla_raw rel_err={rel:.2e}", flush=True)

    gb = 2 * batch * n * 4 * 2 / 1e9  # in+out effective bytes
    gflop = 5 * batch * n * np.log2(n) / 1e9
    best = {}
    for _ in range(3):
        for name, fn, arg in cases:
            t0 = time.perf_counter()
            for _ in range(6):
                r = fn(arg)
            jax.device_get(r.ravel()[0:1])
            t = (time.perf_counter() - t0) / 6
            best[name] = min(best.get(name, 1e9), t)
    for name, t in best.items():
        print(
            f"  n={n:8d} b={batch:8d} {name:8s} {t*1e3:9.3f} ms "
            f"{gflop/t:8.1f} GFLOP/s {gb/t:7.1f} GB/s(effective)",
            flush=True,
        )


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    shapes = SHAPES
    if len(sys.argv) > 1:
        # args: "n" picks the bench batch, "n:batch" overrides it
        shapes = []
        for a in sys.argv[1:]:
            if ":" in a:
                nn, bb = a.split(":")
                shapes.append((int(nn), int(bb)))
            else:
                shapes.extend(
                    (nn, bb) for nn, bb in SHAPES if nn == int(a)
                )
    for n, batch in shapes:
        probe_shape(n, batch)


if __name__ == "__main__":
    main()
