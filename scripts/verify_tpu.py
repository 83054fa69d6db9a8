#!/usr/bin/env python
"""Full-API verification sweep on the real TPU device.

The unit suite runs on CPU (interpreter-mode Pallas); this script is the
committed record of the on-hardware check — it drives every plan level and
API feature through the public package boundary on the attached TPU chip and
compares against NumPy at the reference tolerance (2·eps·N·log2 N, scaled
for the bf16x3 kernel precision).  Run via ``./ci.sh --tpu`` or directly.

Reference analogue: the gtest suite runs on whatever SYCL device the default
selector picks (test/unit_test/, fft_test_utils.hpp:437-478); here CPU tests
and the TPU sweep split that role.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

import portfft_tpu as pfft
from portfft_tpu import ComplexStorage, Descriptor, Domain, Placement
from portfft_tpu.exceptions import (
    InvalidConfiguration,
    UnsupportedConfiguration,
)

CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn

    return deco


def _rand(count, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(count) + 1j * rng.standard_normal(count)
    ).astype(np.complex64)


def _assert_close(got, ref, n, what=""):
    tol = max(2e-6 * n.bit_length() * 4, 1e-4)  # bf16x3 floor ~1e-5 rel
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)
    assert rel < tol, f"{what}: rel={rel:.2e} tol={tol:.0e}"
    return rel


def _fwd_case(n, batch, seed=0):
    plan = Descriptor(lengths=[n], number_of_transforms=batch).commit()
    x = _rand(batch * n, seed)
    y = plan.compute_forward(x)
    ref = np.fft.fft(x.reshape(batch, n), axis=1).reshape(-1)
    rel = _assert_close(np.asarray(y), ref, n, f"N={n}")
    return plan, rel


@check("DIRECT level (N=128)")
def _(log):
    plan, rel = _fwd_case(128, 512)
    log(f"{plan.plans[128].describe()} rel={rel:.1e}")


@check("FUSED level (N=4096)")
def _(log):
    plan, rel = _fwd_case(4096, 64)
    log(f"{plan.plans[4096].describe()} rel={rel:.1e}")


@check("GLOBAL direct subs (N=65536)")
def _(log):
    plan, rel = _fwd_case(65536, 8)
    log(f"{plan.plans[65536].describe()} rel={rel:.1e}")


@check("GLOBAL fused subs (N=2^20)")
def _(log):
    plan, rel = _fwd_case(1 << 20, 2)
    log(f"{plan.plans[1 << 20].describe()} rel={rel:.1e}")


@check("BLUESTEIN (N=65537)")
def _(log):
    plan, rel = _fwd_case(65537, 2)
    log(f"{plan.plans[65537].describe()} rel={rel:.1e}")


@check("backward round trip (N=4096)")
def _(log):
    n, b = 4096, 16
    plan = Descriptor(lengths=[n], number_of_transforms=b).commit()
    x = _rand(b * n, 1)
    y = plan.compute_backward(plan.compute_forward(x))
    _assert_close(np.asarray(y) / n, x, n, "roundtrip")


@check("split storage (N=2048)")
def _(log):
    n, b = 2048, 16
    plan = Descriptor(
        lengths=[n],
        number_of_transforms=b,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    ).commit()
    rng = np.random.default_rng(2)
    xr = rng.standard_normal(b * n).astype(np.float32)
    xi = rng.standard_normal(b * n).astype(np.float32)
    yr, yi = plan.compute_forward(xr, xi)
    ref = np.fft.fft((xr + 1j * xi).reshape(b, n), axis=1).reshape(-1)
    _assert_close(np.asarray(yr) + 1j * np.asarray(yi), ref, n, "split")


@check("in-place placement (N=1024)")
def _(log):
    n, b = 1024, 32
    plan = Descriptor(
        lengths=[n], number_of_transforms=b, placement=Placement.IN_PLACE
    ).commit()
    x = _rand(b * n, 3)
    y = plan.compute_forward(x)
    ref = np.fft.fft(x.reshape(b, n), axis=1).reshape(-1)
    _assert_close(np.asarray(y), ref, n, "in-place")


@check("scale + strides (N=256)")
def _(log):
    n, b = 256, 8
    plan = Descriptor(
        lengths=[n],
        number_of_transforms=b,
        forward_scale=0.5,
        forward_strides=[2],
        forward_distance=2 * n,
    ).commit()
    x = _rand(b * 2 * n, 4)
    y = plan.compute_forward(x)
    ref = 0.5 * np.fft.fft(x.reshape(b, n, 2)[:, :, 0], axis=1).reshape(-1)
    _assert_close(np.asarray(y)[: b * n], ref, n, "scaled strided")


@check("multi-dim 2D (512x512)")
def _(log):
    plan = Descriptor(lengths=[512, 512], number_of_transforms=2).commit()
    x = _rand(2 * 512 * 512, 5)
    y = plan.compute_forward(x)
    ref = np.fft.fftn(x.reshape(2, 512, 512), axes=(1, 2)).reshape(-1)
    _assert_close(np.asarray(y), ref, 512 * 512, "2D")


@check("multi-dim 3D (64^3)")
def _(log):
    plan = Descriptor(lengths=[64, 64, 64], number_of_transforms=2).commit()
    x = _rand(2 * 64**3, 6)
    y = plan.compute_forward(x)
    ref = np.fft.fftn(x.reshape(2, 64, 64, 64), axes=(1, 2, 3)).reshape(-1)
    _assert_close(np.asarray(y), ref, 64**3, "3D")


@check("REAL domain R2C + C2R (N=512)")
def _(log):
    n, b = 512, 16
    plan = Descriptor(
        lengths=[n], number_of_transforms=b, domain=Domain.REAL
    ).commit()
    rng = np.random.default_rng(7)
    x = rng.standard_normal(b * n).astype(np.float32)
    y = plan.compute_forward(x)
    h = n // 2 + 1
    ref = np.fft.rfft(x.reshape(b, n), axis=1).reshape(-1)
    _assert_close(np.asarray(y).reshape(-1)[: b * h], ref, n, "r2c")
    back = plan.compute_backward(y)
    _assert_close(np.asarray(back) / n, x, n, "c2r")


@check("in-place REAL FFTW padded layout (N=2048)")
def _(log):
    n, b = 2048, 4
    h1 = n // 2 + 1
    plan = Descriptor(
        lengths=[n], number_of_transforms=b, domain=Domain.REAL,
        placement=Placement.IN_PLACE,
    ).commit()
    rng = np.random.default_rng(9)
    x = rng.standard_normal((b, n)).astype(np.float32)
    buf = np.full((b, 2 * h1), -5.0, np.float32)
    buf[:, :n] = x
    spec = np.asarray(plan.compute_forward(buf.reshape(-1)))
    ref = np.fft.rfft(x, axis=1)
    _assert_close(
        spec.reshape(b, h1).reshape(-1), ref.reshape(-1), n, "ip r2c"
    )
    back = np.asarray(
        plan.compute_backward(np.ascontiguousarray(spec).reshape(-1))
    )
    rows = back.reshape(b, 2 * h1)[:, :n] / n
    _assert_close(rows.reshape(-1), x.reshape(-1), n, "ip c2r")


@check("single-pass GLOBAL variant eng=5 (N=65536)")
def _(log):
    from portfft_tpu import fastpath
    from portfft_tpu.enums import Direction
    from portfft_tpu.ops import pallas_global

    import jax.numpy as jnp

    n, b = 65536, 4
    plan = Descriptor(lengths=[n], number_of_transforms=b).commit()
    p0 = plan.plans[n]
    if not pallas_global.global_sq_supported(p0, plan.config):
        log("declined (split not lane-solvable) — skipping")
        return
    import jax

    entry = plan._raw_fast.get(Direction.FORWARD)
    if entry is None and jax.default_backend() != "tpu":
        log("no raw fast path off-TPU — skipping")
        return
    assert entry is not None and entry[0] == "global2", entry
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * b * n,
        overrides={"eng": 5, "bt": 1},
    )
    x = _rand(b * n, 10)
    xr = np.ascontiguousarray(x.view(np.float32))
    got = np.asarray(fn(jnp.asarray(xr), plan._bank_arrays)).view(
        np.complex64
    )
    ref = np.fft.fft(x.reshape(b, n), axis=1).reshape(-1)
    _assert_close(got, ref, n, "eng5")


@check("BATCH_INTERLEAVED layout (N=128)")
def _(log):
    n, b = 128, 1024
    plan = Descriptor(
        lengths=[n],
        number_of_transforms=b,
        forward_strides=[b],
        forward_distance=1,
        backward_strides=[b],
        backward_distance=1,
    ).commit()
    x = _rand(b * n, 8)
    y = plan.compute_forward(x)
    ref = np.fft.fft(x.reshape(n, b), axis=0).reshape(-1)
    _assert_close(np.asarray(y), ref, n, "BI")


@check("functional API (fft/ifft, rfft/irfft, ortho norm)")
def _(log):
    from portfft_tpu import functional as F

    x = _rand(8 * 1024, 11).reshape(8, 1024)
    got = np.asarray(F.fft(x))
    ref = np.fft.fft(x)
    _assert_close(got, ref, 1024, "F.fft")
    back = np.asarray(F.ifft(got))
    _assert_close(back, x, 1024, "F.ifft")
    o = np.asarray(F.fft(x, norm="ortho"))
    _assert_close(o, np.fft.fft(x, norm="ortho"), 1024, "ortho")
    r = np.random.default_rng(12).uniform(-1, 1, (4, 2048)).astype(
        np.float32
    )
    spec = np.asarray(F.rfft(r))
    _assert_close(spec, np.fft.rfft(r), 2048, "F.rfft")
    rt = np.asarray(F.irfft(spec, 2048))
    _assert_close(rt, r, 2048, "F.irfft")


@check("apply() inside a user jit (N=4096)")
def _(log):
    import jax
    import jax.numpy as jnp

    n, b = 4096, 8
    plan = Descriptor(lengths=[n], number_of_transforms=b).commit()
    x = _rand(b * n, 13).reshape(b, n)

    fn = jax.jit(lambda v: jnp.abs(plan.apply(v)) ** 2)
    got = np.asarray(fn(jnp.asarray(x)))
    ref = np.abs(np.fft.fft(x)) ** 2
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


@check("ds / ct tuned-variant overrides (fused2 + multidim)")
def _(log):
    import jax.numpy as jnp

    from portfft_tpu import fastpath
    from portfft_tpu.enums import Direction

    n, b = 4096, 64
    plan = Descriptor(lengths=[n], number_of_transforms=b).commit(
        use_pallas=True
    )
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "fused2", entry
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * b * n,
        overrides={"eng": 4, "ds": 1},
    )
    x = _rand(b * n, 14)
    xr = np.ascontiguousarray(x.view(np.float32))
    got = np.asarray(fn(jnp.asarray(xr), plan._bank_arrays)).view(
        np.complex64
    )
    _assert_close(got, np.fft.fft(x.reshape(b, n)).reshape(-1), n, "ds")

    md = Descriptor(lengths=[64, 256], number_of_transforms=8).commit(
        use_pallas=True
    )
    mentry = md._raw_fast.get(Direction.FORWARD)
    assert mentry is not None and mentry[0] == "multidim", mentry
    mfn = fastpath.build_fn(
        md, Direction.FORWARD, mentry, 2 * 8 * 64 * 256,
        overrides={"ct": 512},
    )
    z = _rand(8 * 64 * 256, 15)
    zr = np.ascontiguousarray(z.view(np.float32))
    mg = np.asarray(mfn(jnp.asarray(zr), md._bank_arrays)).view(
        np.complex64
    )
    mref = np.fft.fft2(z.reshape(8, 64, 256)).reshape(-1)
    _assert_close(mg, mref, 64 * 256, "ct")


@check("misuse raises (short buffer / out= on IN_PLACE / fp64)")
def _(log):
    plan = Descriptor(lengths=[256], number_of_transforms=4).commit()
    try:
        plan.compute_forward(_rand(256))
        raise AssertionError("short buffer accepted")
    except InvalidConfiguration:
        pass
    ip = Descriptor(
        lengths=[256], number_of_transforms=1, placement=Placement.IN_PLACE
    ).commit()
    try:
        ip.compute_forward(_rand(256), out=_rand(256))
        raise AssertionError("out= accepted on IN_PLACE")
    except InvalidConfiguration:
        pass
    try:
        Descriptor(lengths=[64], precision="float64").commit()
        raise AssertionError("fp64 accepted on TPU")
    except UnsupportedConfiguration:
        pass


def main() -> int:
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        print("WARNING: not a TPU device — sweep runs but is not the "
              "hardware check")
    cfg = pfft.resolve_device_config(dev)
    print(f"config: {cfg.name}, VMEM {cfg.vmem_bytes >> 20} MiB")
    failed = 0
    for name, fn in CHECKS:
        msgs = []
        try:
            fn(msgs.append)
            extra = f"  [{msgs[0]}]" if msgs else ""
            print(f"  PASS {name}{extra}")
        except Exception as e:
            failed += 1
            print(f"  FAIL {name}: {e}")
            traceback.print_exc()
    print(f"{len(CHECKS) - failed}/{len(CHECKS)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
