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
