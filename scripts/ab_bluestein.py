"""A/B the Bluestein convolution length on the attached chip.

n=65537 (the bench large_1d_prime config) needs conv ≥ 131073; the round-4
candidate 9·2^14 = 147456 (384×384 two-pass) carries 25% less traffic and
14% fewer cMAC/point than the round-2 choice 3·2^16 = 196608 (512×384).
This script commits both (monkeypatching planner.bluestein_conv_n for the
incumbent) and times forward with the R-vs-2R subtraction protocol.
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
import portfft_tpu as pfft
from portfft_tpu import planner

N = 65537
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
R = 5


def _sync(y):
    # block_until_ready returns immediately on tunneled runtimes (axon)
    import jax

    jax.device_get(jnp.asarray(y).ravel()[0:1])


def run(tag, conv_n, dense=False):
    import os

    os.environ["PORTFFT_BLUESTEIN_DENSE"] = "1" if dense else "0"
    os.environ["PORTFFT_BLUESTEIN_BF"] = "0" if dense else "1"
    orig = planner.bluestein_conv_n
    planner.bluestein_conv_n = lambda n, cap=0: conv_n
    try:
        desc = pfft.Descriptor(lengths=[N], number_of_transforms=BATCH)
        plan = desc.commit(use_pallas=True)
    finally:
        planner.bluestein_conv_n = orig
    assert plan.plans[N].conv.n == conv_n, plan.plans[N].describe()
    print(f"[{tag}] {plan.plans[N].describe()}", flush=True)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2 * BATCH * N).astype(np.float32)
    xd = jnp.asarray(x)
    y = plan.compute_forward(xd)
    _sync(y)
    cb = 4
    got = np.asarray(y[: 2 * cb * N]).view(np.complex64).reshape(cb, N)
    ref = np.fft.fft(x[: 2 * cb * N].view(np.complex64).reshape(cb, N), axis=1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"[{tag}] verify rel={rel:.2e}", flush=True)
    assert rel < 1e-2
    best = None
    for burst in range(3):
        t0 = time.perf_counter()
        for _ in range(R):
            y = plan.compute_forward(xd)
        _sync(y)
        t_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2 * R):
            y = plan.compute_forward(xd)
        _sync(y)
        t_2r = time.perf_counter() - t0
        wall = t_2r / (2 * R)
        if t_2r > t_r:
            dev = (t_2r - t_r) / R
            basis = "dev"
        else:
            # subtraction invalid (noise): fall back to wall per-iteration
            # and SAY so — don't silently relabel wall as device time
            dev = wall
            basis = "wall(!subtraction-invalid)"
        best = dev if best is None else min(best, dev)
        print(
            f"[{tag}] burst{burst}: wall {wall * 1e3:.2f} ms  "
            f"{basis} {dev * 1e3:.2f} ms",
            flush=True,
        )
    gb = 2 * BATCH * N * 8 / 1e9
    print(
        f"[{tag}] BEST dev {best * 1e3:.2f} ms  eff {gb / best:.1f} GB/s",
        flush=True,
    )
    return best


if __name__ == "__main__":
    if "bf" in sys.argv:
        # A/B the butterfly lane-DFT mode of the fused engine (round-5
        # VERDICT weak #6) at the committed conv length
        bfm = run("conv147456-bf", 147456, dense=False)
        dns = run("conv147456-dense", 147456, dense=True)
        print(f"bf speedup: {dns / bfm:.3f}x", flush=True)
    else:
        new = run("conv147456", 147456)
        old = run("conv196608", 196608)
        print(f"speedup new/old: {old / new:.3f}x", flush=True)
