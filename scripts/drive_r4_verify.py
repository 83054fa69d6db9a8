"""Round-4 verification drive: the working-tree batch on the real chip.

Covers every plan level through the public API (DIRECT/FUSED/GLOBAL/
BLUESTEIN), the round-4 additions (irregular-strided in-trace indices,
df64 traceable apply on CPU-interpret, multi-dim cm kernel via override),
a backward round trip, and misuse probes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from portfft_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import portfft_tpu as pfft  # noqa: E402
from portfft_tpu.enums import ComplexStorage  # noqa: E402
from portfft_tpu.exceptions import (  # noqa: E402
    InvalidConfiguration,
)


def rel(y, ref):
    return np.linalg.norm(y - ref) / np.linalg.norm(ref)


def drive(n, batch, tol=None, **kw):
    t0 = time.perf_counter()
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, **kw
    ).commit()
    rng = np.random.default_rng(n)
    x = (
        rng.standard_normal(batch * n) + 1j * rng.standard_normal(batch * n)
    ).astype(np.complex64)
    y = plan.compute_forward(x)
    ref = np.fft.fft(x.reshape(batch, n), axis=1).reshape(-1)
    r = rel(y, ref)
    lvl = plan.plans[n].describe()
    print(
        f"C2C n={n:<7d} b={batch:<5d} rel={r:.2e} "
        f"[{lvl}] ({time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    tol = tol or 2e-5
    assert r < tol, (n, r)
    # backward round trip on the largest sizes only (compile budget)
    if n >= 65536:
        xb = plan.compute_backward(y)
        rb = rel(xb / n, x)
        print(f"  bwd round-trip rel={rb:.2e}", flush=True)
        assert rb < tol
    return plan


def main():
    import jax

    print("device:", jax.devices()[0].device_kind, flush=True)

    drive(128, 512)            # DIRECT
    drive(4096, 2048)          # FUSED (mm kernel)
    drive(65536, 256)          # GLOBAL eng-5 (tuned default)
    drive(1 << 20, 16)         # GLOBAL ladder top (eng-2 tuned)
    drive(65537, 64, tol=2e-4) # BLUESTEIN prime

    # irregular strided layout -> in-trace index fallback (round-4 change)
    n, batch = 65536, 4
    d = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    d.forward_strides = [3]          # non-unit innermost stride
    d.forward_distance = 3 * n + 17  # irregular row pitch
    plan = d.commit()
    rng = np.random.default_rng(7)
    span = d.forward_distance * (batch - 1) + 3 * (n - 1) + 1
    x = (
        rng.standard_normal(span) + 1j * rng.standard_normal(span)
    ).astype(np.complex64)
    y = plan.compute_forward(x)
    rows = np.stack(
        [
            x[i * d.forward_distance : i * d.forward_distance + 3 * n : 3]
            for i in range(batch)
        ]
    )
    ref = np.fft.fft(rows, axis=1)
    got = y.reshape(batch, n)
    r = rel(got, ref)
    print(f"irregular-strided n={n} rel={r:.2e}", flush=True)
    assert r < 2e-5

    # multi-dim with the cm (widened-matmul column) kernel forced through
    # an in-memory user-cache entry (the autotuner's route to it)
    from portfft_tpu import tuning

    d2 = pfft.Descriptor(lengths=[512, 512], number_of_transforms=8)
    plan2 = d2.commit()
    x2 = (
        rng.standard_normal(8 * 512 * 512)
        + 1j * rng.standard_normal(8 * 512 * 512)
    ).astype(np.complex64)
    ref2 = np.fft.fft2(x2.reshape(8, 512, 512), axes=(1, 2)).reshape(-1)
    y2 = plan2.compute_forward(x2)
    print(f"md 512x512 default rel={rel(y2, ref2):.2e}", flush=True)
    assert rel(y2, ref2) < 5e-5
    dev = plan2.config.name
    prev = tuning.lookup(dev, "multidim", "n512x512")
    tuning.record(dev, "multidim", "n512x512", {"cm": 1})
    try:
        plan2c = d2.commit()
        y2c = plan2c.compute_forward(x2)
        print(f"md 512x512 cm=1     rel={rel(y2c, ref2):.2e}", flush=True)
        assert rel(y2c, ref2) < 5e-5
    finally:
        if prev is not None:
            tuning.record(dev, "multidim", "n512x512", prev)
        else:
            tuning.forget(dev, "multidim", "n512x512")

    # fused trailing-2D kernel (md2) at its riskiest VMEM shapes: 1024^2
    # (8 MB persistent scratch planes + fused-plan phases) and the 3D
    # trailing pair; a Mosaic rejection falls back per-entry, so also
    # assert the md2 gate agreed before measuring
    from portfft_tpu.ops import pallas_multidim as _md

    for lengths, b in ([1024, 1024], 2), ([128, 128, 128], 4):
        dm = pfft.Descriptor(
            lengths=list(lengths), number_of_transforms=b
        )
        planm = dm.commit()
        ntot = int(np.prod(lengths))
        xm = (
            rng.standard_normal(b * ntot)
            + 1j * rng.standard_normal(b * ntot)
        ).astype(np.complex64)
        refm = np.fft.fftn(
            xm.reshape(b, *lengths),
            axes=tuple(range(1, 1 + len(lengths))),
        ).reshape(-1)
        gate = _md.md2_supported(
            planm.plans[lengths[-2]], planm.plans[lengths[-1]],
            planm.config,
        )
        ym = planm.compute_forward(xm)
        tag = "x".join(map(str, lengths))
        print(
            f"md2 {tag} gate={gate} rel={rel(ym, refm):.2e}", flush=True
        )
        assert rel(ym, refm) < 5e-5

    # SPLIT_COMPLEX storage
    ds = pfft.Descriptor(lengths=[4096], number_of_transforms=32)
    ds.complex_storage = ComplexStorage.SPLIT_COMPLEX
    ps = ds.commit()
    xr = rng.standard_normal(32 * 4096).astype(np.float32)
    xi = rng.standard_normal(32 * 4096).astype(np.float32)
    yr, yi = ps.compute_forward(xr, xi)
    yr, yi = np.asarray(yr), np.asarray(yi)  # no complex ops on device
    refs = np.fft.fft((xr + 1j * xi).reshape(32, 4096), axis=1).reshape(-1)
    r = rel(yr + 1j * yi, refs)
    print(f"split-complex n=4096 rel={r:.2e}", flush=True)
    assert r < 2e-5

    # misuse probes
    try:
        pfft.Descriptor(lengths=[4096], number_of_transforms=8).commit(
        ).compute_forward(np.zeros(5, np.complex64))
        raise AssertionError("short buffer accepted")
    except InvalidConfiguration:
        print("misuse short-buffer: ok", flush=True)
    try:
        import portfft_tpu.enums as en

        d3 = pfft.Descriptor(lengths=[1024], number_of_transforms=4)
        d3.placement = en.Placement.IN_PLACE
        p3 = d3.commit()
        p3.compute_forward(
            np.zeros(4 * 1024, np.complex64),
            out=np.zeros(4 * 1024, np.complex64),
        )
        raise AssertionError("out= on IN_PLACE accepted")
    except InvalidConfiguration:
        print("misuse out=/IN_PLACE: ok", flush=True)

    print("DRIVE_R4 OK", flush=True)


if __name__ == "__main__":
    main()
