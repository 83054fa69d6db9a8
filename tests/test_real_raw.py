"""Interpret-mode tests for the REAL-domain raw fast path.

fastpath realf/realb entries run the packed half-length transform through
the raw complex kernels (the PACKED real buffer IS the interleaved raw
buffer of z = x_even + i·x_odd) plus ONE Pallas un/retangle pass
(ops/pallas_real.py).  Reference counterpart: none (REAL throws,
committed_descriptor.hpp:134-137); the untangle math mirrors
committed._core_real_forward/_backward, which these tests cross-check
against numpy rfft/irfft.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import portfft_tpu as pfft
from portfft_tpu.config import DeviceConfig
from portfft_tpu.enums import Direction, Domain
from portfft_tpu.ops import pallas_real

CFG = DeviceConfig()


@pytest.mark.parametrize(
    "n,batch",
    # (65536, 16) is NOT here: its whole-h tiling needs bt ∈ {8, 16}
    # for Mosaic's sublane block rule but neither fits VMEM — the shape
    # declines to the plane path (test_wide_gate_and_decline); the old
    # bt=4 registration only ever "worked" in CPU interpret mode and
    # silently fell back on chip.
    [(1024, 64), (2048, 32), (4096, 32), (8192, 16), (32768, 16)],
)
def test_real_raw_forward_backward(n, batch):
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, domain=Domain.REAL
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "realf"
    assert plan._raw_fast[Direction.BACKWARD][0] == "realb"
    rng = np.random.default_rng(0)
    x = rng.standard_normal(batch * n).astype(np.float32)
    y = plan.compute_forward(x)
    assert any(k[0] == "rawreal" for k in plan._compiled), (
        "REAL raw fast path not taken"
    )
    ref = np.fft.rfft(x.reshape(batch, n), axis=1).reshape(-1)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-4
    xb = np.asarray(plan.compute_backward(y)) / n
    rel_rt = np.abs(xb - x).max() / np.abs(x).max()
    assert rel_rt < 1e-4


def test_real_raw_scales():
    n, batch = 2048, 32
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, domain=Domain.REAL,
        forward_scale=2.0, backward_scale=1.0 / n,
    ).commit(use_pallas=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(batch * n).astype(np.float32)
    y = plan.compute_forward(x)
    ref = 2.0 * np.fft.rfft(x.reshape(batch, n), axis=1).reshape(-1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4
    xb = np.asarray(plan.compute_backward(y / 2.0))
    assert np.abs(xb - x).max() / np.abs(x).max() < 1e-4


def test_untangle_kernel_isolated():
    n, b = 2048, 32
    h = n // 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, n)).astype(np.float32)
    z = x.reshape(b, h, 2)[..., 0] + 1j * x.reshape(b, h, 2)[..., 1]
    zf = np.fft.fft(z, axis=1)
    zraw = np.empty((b, 2 * h), np.float32)
    zraw[:, 0::2] = zf.real
    zraw[:, 1::2] = zf.imag
    k = np.arange(h)
    th = 2 * np.pi / n * k
    wr = jnp.asarray(np.cos(th).astype(np.float32))
    wi = jnp.asarray((-np.sin(th)).astype(np.float32))
    out = pallas_real.untangle_raw_call(
        jnp.asarray(zraw.reshape(-1)), b, n, [wr, wi], CFG
    )
    got = np.asarray(out).reshape(b, h + 1, 2)
    gc = got[..., 0] + 1j * got[..., 1]
    ref = np.fft.rfft(x, axis=1)
    assert np.abs(gc - ref).max() / np.abs(ref).max() < 1e-4


def test_unsupported_shapes_decline():
    # odd half length -> no registration (falls back to plane path)
    assert not pallas_real.supported(1000, 8)  # h = 500 not 128-multiple
    plan = pfft.Descriptor(
        lengths=[1040], number_of_transforms=8, domain=Domain.REAL
    ).commit(use_pallas=True)
    assert plan._raw_fast.get(Direction.FORWARD) is None
    rng = np.random.default_rng(2)
    x = rng.standard_normal(8 * 1040).astype(np.float32)
    y = plan.compute_forward(x)  # plane path still correct
    ref = np.fft.rfft(x.reshape(8, 1040), axis=1).reshape(-1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4


# ---------------------------------------------------------------------------
# Small-n single-matmul REAL path (realsf/realsb, round-5 VERDICT weak #2)
# ---------------------------------------------------------------------------

import pytest as _pytest


@_pytest.mark.parametrize("n,b", [(32, 1024), (64, 512), (256, 128), (512, 64)])
def test_small_real_matmul_path(n, b):
    """Small even n registers the constant-matmul entries and matches
    np.fft.rfft / unnormalized irfft."""
    import portfft_tpu as pfft
    from portfft_tpu import Domain
    from portfft_tpu.enums import Direction

    desc = pfft.Descriptor(
        lengths=[n], number_of_transforms=b, domain=Domain.REAL
    )
    plan = desc.commit(use_pallas=True)
    ef = plan._raw_fast.get(Direction.FORWARD)
    eb = plan._raw_fast.get(Direction.BACKWARD)
    assert ef is not None and ef[0] == "realsf", ef
    assert eb is not None and eb[0] == "realsb", eb
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (b, n)).astype(np.float32)
    y = np.asarray(plan.compute_forward(x.reshape(-1)))
    ref = np.fft.rfft(x, axis=-1)
    got = y.reshape(b, n // 2 + 1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel
    spec = ref.astype(np.complex64)
    back = np.asarray(plan.compute_backward(spec.reshape(-1)))
    relb = np.linalg.norm(back.reshape(b, n) / n - x) / np.linalg.norm(x)
    assert relb < 1e-4, relb


def test_small_real_scale_and_fallback():
    """Scales fold into the table; batches that don't group fall back to
    the plane path with identical results."""
    import portfft_tpu as pfft
    from portfft_tpu import Domain
    from portfft_tpu.enums import Direction

    n = 32
    desc = pfft.Descriptor(
        lengths=[n], number_of_transforms=256, domain=Domain.REAL,
        forward_scale=0.25,
    )
    plan = desc.commit(use_pallas=True)
    assert plan._raw_fast[Direction.FORWARD][0] == "realsf"
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (256, n)).astype(np.float32)
    y = np.asarray(plan.compute_forward(x.reshape(-1)))
    ref = 0.25 * np.fft.rfft(x, axis=-1)
    rel = np.linalg.norm(y.reshape(256, -1) - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel
    # batch 3 cannot group (g=4): no entry, plane path still correct
    desc2 = pfft.Descriptor(
        lengths=[n], number_of_transforms=3, domain=Domain.REAL
    )
    plan2 = desc2.commit(use_pallas=True)
    assert plan2._raw_fast.get(Direction.FORWARD) is None
    x2 = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    y2 = np.asarray(plan2.compute_forward(x2.reshape(-1)))
    ref2 = np.fft.rfft(x2, axis=-1)
    rel2 = np.linalg.norm(y2.reshape(3, -1) - ref2) / np.linalg.norm(ref2)
    assert rel2 < 1e-4, rel2


def test_wide_untangle_matches_oracle():
    """Column-chunked untangle (wide_bt_ct) — the path REAL GLOBAL sizes
    take (n=131072's h=65536 whole-h blocks violate Mosaic's sublane
    rule at any VMEM-viable bt; the plane-path fallback ran 38.5 ms
    device, BENCH r5).  Parity vs np.fft.rfft through the public API at
    a wide-forced small shape and direct-call at the library gate."""
    import numpy as np
    import jax.numpy as jnp
    import portfft_tpu as pfft
    from portfft_tpu.enums import Domain
    from portfft_tpu.ops import pallas_real

    n, batch = 16384, 8
    h = n // 2
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, domain=Domain.REAL
    ).commit(use_pallas=True)
    rkey = plan._bank_keys[("R", n, -1)]
    rt = [plan._bank_arrays[rkey + "r"], plan._bank_arrays[rkey + "i"]]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    z = np.fft.fft(x[:, 0::2] + 1j * x[:, 1::2], axis=1).astype(
        np.complex64
    )
    zraw = jnp.asarray(np.ascontiguousarray(z).view(np.float32).ravel())
    y = pallas_real.untangle_wide_raw_call(
        zraw, batch, n, rt, plan.config, scale=0.5
    )
    assert y is not None
    got = np.asarray(y).view(np.complex64).reshape(batch, h + 1)
    ref = 0.5 * np.fft.rfft(x, axis=1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_wide_gate_and_decline():
    from portfft_tpu.config import DeviceConfig
    from portfft_tpu.ops import pallas_real

    cfg = DeviceConfig()
    # n=131072: whole-h tiling fails (Mosaic sublane rule + VMEM) and
    # the raw path DECLINES (the wide kernel measured 5x slower than
    # the plane path on chip — round-5 negative result); the wide
    # kernel itself stays parity-covered above
    assert pallas_real._pick_bt(1024, 65536, cfg.vmem_budget) is None
    assert pallas_real.wide_bt_ct(131072, 1024, cfg) == (8, 32)
    import jax.numpy as jnp
    import numpy as np
    res = pallas_real.untangle_raw_call(
        jnp.zeros(2 * 8 * 65536, jnp.float32), 8, 131072,
        [jnp.zeros(65536, jnp.float32)] * 2, cfg,
    )
    assert res is None
