"""Pallas IO kernels and raw fast paths (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from portfft_tpu import Descriptor
from portfft_tpu.enums import Direction
from portfft_tpu.ops import pallas_io


def test_interleave_round_trip():
    m = 128 * 256
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, m).astype(np.float32)
    b = rng.uniform(-1, 1, m).astype(np.float32)
    raw = pallas_io.interleave(jnp.asarray(a), jnp.asarray(b), interpret=True)
    raw_n = np.asarray(raw)
    assert np.array_equal(raw_n[0::2], a)
    assert np.array_equal(raw_n[1::2], b)
    ra, rb = pallas_io.deinterleave(raw, interpret=True)
    assert np.array_equal(np.asarray(ra), a)
    assert np.array_equal(np.asarray(rb), b)


def test_supported_predicate():
    assert pallas_io.supported(128 * 128)
    assert not pallas_io.supported(128 * 128 + 1)


@pytest.mark.parametrize("n,b,kind", [(16, 2048, "direct"), (4096, 16, "fused2")])
def test_raw_fast_path_registration_and_result(n, b, kind):
    plan = Descriptor(lengths=[n], number_of_transforms=b).commit(
        use_pallas=True
    )
    fast = plan._raw_fast.get(Direction.FORWARD)
    assert fast is not None and fast[0] == kind
    rng = np.random.default_rng(1)
    x = (
        rng.standard_normal(b * n) + 1j * rng.standard_normal(b * n)
    ).astype(np.complex64)
    y = np.asarray(plan.compute_forward(x))
    ref = np.fft.fft(x.reshape(b, n), axis=1).reshape(-1)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_raw_fast_path_not_registered_for_strided():
    plan = Descriptor(
        lengths=[16],
        number_of_transforms=2048,
        forward_strides=[2],
        forward_distance=32,
    ).commit(use_pallas=True)
    assert Direction.FORWARD not in plan._raw_fast
