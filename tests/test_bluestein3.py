"""Interpret-mode tests for the fused three-pass Bluestein engine.

ops/pallas_bluestein collapses the chirp-z transform of a large prime into
three Pallas passes (chirp/pad folded into conv pass 1, merged middle pass
on the swapped backward factorization, final chirp/slice folded into the
last pass).  Reference counterpart: none — portFFT throws for large primes
(committed_descriptor_impl.hpp:240-241); tolerance discipline follows
fft_test_utils.hpp:461-464.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import portfft_tpu as pfft
from portfft_tpu.enums import Level
from portfft_tpu.ops import pallas_bluestein

# primes whose Bluestein convolution plans to GLOBAL (conv > 32768)
PRIMES = [20011, 65537]


def _tol(n):
    return 2 * np.finfo(np.float32).eps * n * np.log2(n) * 30


@pytest.mark.parametrize("n", PRIMES)
def test_fused_path_active_and_correct(n):
    b = 2
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=b
    ).commit(use_pallas=True)
    p = plan.plans[n]
    assert p.level == Level.BLUESTEIN and p.conv.level == Level.GLOBAL
    assert pallas_bluestein.supported(p, plan.config)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    res = pallas_bluestein.bluestein_call(
        jnp.asarray(xr), jnp.asarray(xi), p, -1,
        plan._bank_keys, plan._bank_arrays, plan.config,
    )
    assert res is not None, "fused Bluestein engine declined the shape"
    got = np.asarray(res[0]) + 1j * np.asarray(res[1])
    ref = np.fft.fft(xr + 1j * xi, axis=1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4


@pytest.mark.parametrize("n", PRIMES)
@pytest.mark.parametrize("scale", [1.0, 2.5])
def test_public_api_forward_backward(n, scale):
    b = 3
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=b, forward_scale=scale
    ).commit(use_pallas=True)
    rng = np.random.default_rng(1)
    x = (
        rng.standard_normal(b * n) + 1j * rng.standard_normal(b * n)
    ).astype(np.complex64)
    y = plan.compute_forward(x)
    ref = scale * np.fft.fft(x.reshape(b, n), axis=1).reshape(-1)
    err = np.max(np.abs(y - ref))
    assert err < _tol(n) * np.max(np.abs(ref)) + _tol(n)
    xb = plan.compute_backward(y / scale) / n
    rel = np.linalg.norm(xb - x) / np.linalg.norm(x)
    assert rel < 1e-4


def test_valid_rows_and_gating():
    # nv = ceil(n / g2) rounded to sublane granularity
    assert pallas_bluestein.valid_rows(65537, 384) == 176
    assert pallas_bluestein.valid_rows(20011, 192) == 112
    # non-Bluestein plans are rejected
    plan = pfft.Descriptor(lengths=[4096], number_of_transforms=2).commit()
    assert not pallas_bluestein.supported(
        plan.plans[4096], plan.config
    )


def test_bf_mode_keys_and_gating():
    """65537's 384x384 conv enables the butterfly (bf) lane-DFT mode
    (permuted in-between tables banked); a conv with a non-128-multiple
    factor (20011 -> 256x192) stays on the dense path with no bf keys."""
    p65537 = pfft.Descriptor(
        lengths=[65537], number_of_transforms=1
    ).commit(use_pallas=True)
    assert ("BLT", 65537, -1) in p65537._bank_keys
    assert ("BLP", 65537, -1) in p65537._bank_keys
    assert ("BLB", 65537, -1) in p65537._bank_keys
    p20011 = pfft.Descriptor(
        lengths=[20011], number_of_transforms=1
    ).commit(use_pallas=True)
    assert ("BLT", 20011, -1) not in p20011._bank_keys


def test_blane_dif_dit_roundtrip_tables():
    """blane_dif's lane permutation is exactly lane_perm, and dif->dit
    with matched signs is f·identity (the conv pairing this mode relies
    on)."""
    import jax.numpy as jnp

    from portfft_tpu.ops import pallas_bluestein as pb
    from portfft_tpu.ops import xla_fft

    f = 384
    bank = xla_fft.TwiddleBank(np.float32)
    uf = bank.twiddle_fm(3, 128, -1)
    ub = bank.twiddle_fm(3, 128, +1)
    wf = bank.mat_kara(bank.dft(128, -1))
    wb = bank.mat_kara(bank.dft(128, +1))
    arrs = bank.device_arrays()
    rng = np.random.default_rng(0)
    xr = rng.uniform(-1, 1, (8, f)).astype(np.float32)
    xi = rng.uniform(-1, 1, (8, f)).astype(np.float32)
    fr, fi = pb.blane_dif(
        jnp.asarray(xr), jnp.asarray(xi), f, -1,
        arrs[uf + "r"], arrs[uf + "i"],
        [arrs[wf + str(j)] for j in range(1, 7)],
    )
    # permuted-lane check against np.fft
    ref = np.fft.fft(xr + 1j * xi, axis=1)
    perm = pb.lane_perm(f)
    got = (np.asarray(fr) + 1j * np.asarray(fi))[:, :]
    rel = np.linalg.norm(got - ref[:, perm]) / np.linalg.norm(ref)
    assert rel < 1e-4, rel
    # dit(dif(x)) == f·x
    br, bi = pb.blane_dit(
        fr, fi, f, +1,
        arrs[ub + "r"], arrs[ub + "i"],
        [arrs[wb + str(j)] for j in range(1, 7)],
    )
    back = (np.asarray(br) + 1j * np.asarray(bi)) / f
    orig = xr + 1j * xi
    rel2 = np.linalg.norm(back - orig) / np.linalg.norm(orig)
    assert rel2 < 1e-4, rel2


def test_bf_mode_opt_in_parity(monkeypatch):
    """The butterfly conv mode lost its on-chip A/B (169.5 vs 108.1 ms
    at 65537x2048, scripts/ab_bluestein.py 2026-08-21) and is OPT-IN via
    PORTFFT_BLUESTEIN_BF; this keeps its runtime path parity-covered."""
    monkeypatch.setenv("PORTFFT_BLUESTEIN_BF", "1")
    n, b = 65537, 2
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=b
    ).commit(use_pallas=True)
    p = plan.plans[n]
    rng = np.random.default_rng(5)
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    res = pallas_bluestein.bluestein_call(
        jnp.asarray(xr), jnp.asarray(xi), p, -1,
        plan._bank_keys, plan._bank_arrays, plan.config,
    )
    assert res is not None
    got = np.asarray(res[0]) + 1j * np.asarray(res[1])
    ref = np.fft.fft(xr + 1j * xi, axis=1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4
