"""Round-3 session-3 TPU drive: verify the new paths on the real chip.

1. In-place REAL (FFTW padded layout): R2C forward overwrites the padded
   buffer, C2R backward round-trips (÷n), vs np.fft.rfft/irfft.
2. Regression spot checks: FUSED 4096 forward, GLOBAL 65536 forward.
3. Misuse probe: bad in-place REAL distance raises InvalidConfiguration.

Then runs the square-kernel probe (scripts/probe_sq65536.py main) in the
same process so the perf A/B shares the session's chip weather.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu import InvalidConfiguration, Placement  # noqa: E402


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    ok = True

    # ---- 1. in-place REAL, n=2048 (raw fastpath range), b=4 ----
    n, b = 2048, 4
    h1 = n // 2 + 1
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=b, domain=pfft.Domain.REAL,
        placement=Placement.IN_PLACE,
    ).commit()
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (b, n)).astype(np.float32)
    buf = np.full((b, 2 * h1), -5.0, np.float32)
    buf[:, :n] = x
    spec = np.asarray(plan.compute_forward(buf.reshape(-1)))
    got = spec.reshape(b, h1)
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"inplace R2C n={n}: rel={rel:.2e}", flush=True)
    ok &= rel < 1e-5
    back = np.asarray(
        plan.compute_backward(np.ascontiguousarray(spec).reshape(-1))
    )
    rows = back.reshape(b, 2 * h1)[:, :n] / n
    rel2 = np.linalg.norm(rows - x) / np.linalg.norm(x)
    print(f"inplace C2R n={n}: rel={rel2:.2e}", flush=True)
    ok &= rel2 < 1e-5

    # ---- 2. regression spot checks ----
    for nn, bb in ((4096, 64), (65536, 8)):
        p = pfft.Descriptor(lengths=[nn], number_of_transforms=bb).commit()
        z = (
            rng.standard_normal(bb * nn) + 1j * rng.standard_normal(bb * nn)
        ).astype(np.complex64)
        y = p.compute_forward(z)
        r = np.fft.fft(z.reshape(bb, nn), axis=1).reshape(-1)
        e = np.linalg.norm(y - r) / np.linalg.norm(r)
        print(f"C2C n={nn}: rel={e:.2e}", flush=True)
        ok &= e < 1e-4

    # ---- 3. misuse probe ----
    try:
        pfft.Descriptor(
            lengths=[64], number_of_transforms=2, domain=pfft.Domain.REAL,
            placement=Placement.IN_PLACE, forward_distance=64,
        ).commit()
        print("misuse probe: FAILED (no raise)", flush=True)
        ok = False
    except InvalidConfiguration:
        print("misuse probe: ok (InvalidConfiguration)", flush=True)

    print("DRIVE", "OK" if ok else "FAILED", flush=True)
    return ok


if __name__ == "__main__":
    good = main()
    if "--with-probe" in sys.argv:
        print("---- square-kernel probe ----", flush=True)
        import importlib

        probe = importlib.import_module("scripts.probe_sq65536")
        probe.main()
    sys.exit(0 if good else 1)
