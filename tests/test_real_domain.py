"""REAL domain (R2C / C2R) — extension beyond the reference (which throws;
its bench set lists a real-domain config set as planned,
reference_dft_set.hpp:104-113).  Verified against np.fft.rfftn/irfftn."""

import numpy as np
import pytest

from portfft_tpu import (
    ComplexStorage,
    Descriptor,
    Direction,
    Domain,
    InvalidConfiguration,
    Placement,
    UnsupportedConfiguration,
)


def make(n=None, lengths=None, **kw):
    return Descriptor(
        lengths=lengths or [n], domain=Domain.REAL, **kw
    )


def gen_real(desc, seed=0):
    rng = np.random.Generator(np.random.SFC64(seed))
    shape = (desc.number_of_transforms, *desc.lengths)
    return rng.uniform(-1.0, 1.0, shape).astype(desc.precision)


@pytest.mark.parametrize("n", [8, 64, 256, 4096])
def test_r2c_forward(n):
    desc = make(n, number_of_transforms=3)
    plan = desc.commit()
    x = gen_real(desc)
    y = np.asarray(plan.compute_forward(x.reshape(-1)))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    got = y.reshape(3, n // 2 + 1)
    tol = 1e-4 * np.sqrt(n)
    assert np.allclose(got, ref, atol=tol), np.abs(got - ref).max()


@pytest.mark.parametrize("n", [8, 64, 1024])
def test_c2r_backward(n):
    desc = make(n, number_of_transforms=2)
    plan = desc.commit()
    x = gen_real(desc, 1)
    spec = np.fft.rfft(x, axis=-1).astype(np.complex64)
    y = np.asarray(plan.compute_backward(spec.reshape(-1)))
    # unnormalized inverse: compute_backward == irfft * n
    assert np.allclose(y.reshape(2, n) / n, x, atol=1e-4)


def test_r2c_round_trip():
    n = 512
    desc = make(n, number_of_transforms=4)
    plan = desc.commit()
    x = gen_real(desc, 2)
    spec = plan.compute_forward(x.reshape(-1))
    back = np.asarray(plan.compute_backward(np.asarray(spec)))
    assert np.allclose(back.reshape(4, n) / n, x, atol=1e-4)


def test_r2c_split_storage():
    n = 128
    desc = make(
        n,
        number_of_transforms=3,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    )
    plan = desc.commit()
    x = gen_real(desc, 3)
    yr, yi = plan.compute_forward(x.reshape(-1))
    ref = np.fft.rfft(x, axis=-1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.allclose(got.reshape(3, n // 2 + 1), ref, atol=1e-3)
    back = np.asarray(plan.compute_backward(yr, yi))
    assert np.allclose(back.reshape(3, n) / n, x, atol=1e-4)


def test_r2c_2d():
    desc = make(lengths=[16, 64], number_of_transforms=2)
    plan = desc.commit()
    x = gen_real(desc, 4)
    y = np.asarray(plan.compute_forward(x.reshape(-1)))
    ref = np.fft.rfftn(x.astype(np.float64), axes=(1, 2))
    assert np.allclose(y.reshape(2, 16, 33), ref, atol=1e-3)
    back = np.asarray(plan.compute_backward(np.asarray(y)))
    assert np.allclose(back.reshape(2, 16, 64) / (16 * 64), x, atol=1e-4)


def test_r2c_scales():
    n = 64
    desc = make(n, forward_scale=2.0, number_of_transforms=1)
    plan = desc.commit()
    x = gen_real(desc, 5)
    y = np.asarray(plan.compute_forward(x.reshape(-1)))
    ref = 2.0 * np.fft.rfft(x, axis=-1)
    assert np.allclose(y.reshape(1, -1), ref, atol=1e-3)


def test_r2c_strided_real_side():
    n = 32
    desc = make(
        n,
        number_of_transforms=3,
        forward_strides=[2],
        forward_distance=2 * n,
    )
    plan = desc.commit()
    x = gen_real(desc, 6)
    buf = np.zeros(desc.get_input_count(Direction.FORWARD), np.float32)
    idx = 2 * np.arange(n)[None, :] + 2 * n * np.arange(3)[:, None]
    buf[idx] = x
    y = np.asarray(plan.compute_forward(buf))
    ref = np.fft.rfft(x, axis=-1)
    assert np.allclose(y.reshape(3, -1), ref, atol=1e-3)


def test_r2c_padded_spectrum_rows():
    """Non-default spectrum-side layout: each half-spectrum row (n//2+1
    complex elements) sits in a padded row of ``backward_distance`` > that.
    The rectangle fast path must size rows from the BACKWARD domain's
    length, not the transform length (round-3 review regression)."""
    n, b, dist = 32, 3, 32  # spectrum rows are 17 wide, padded to 32
    desc = make(
        n,
        number_of_transforms=b,
        backward_strides=[1],
        backward_distance=dist,
    )
    plan = desc.commit()
    x = gen_real(desc, 7)
    h1 = n // 2 + 1
    out_count = desc.get_output_count(Direction.FORWARD)
    sentinel = np.full(out_count, -5.0 - 5.0j, np.complex64)
    y = np.asarray(
        plan.compute_forward(x.reshape(-1), out=sentinel)
    ).reshape(-1)
    ref = np.fft.rfft(x, axis=-1)
    written = np.zeros(out_count, bool)
    for k in range(b):
        got = y[k * dist : k * dist + h1]
        assert np.allclose(got, ref[k], atol=1e-3), k
        written[k * dist : k * dist + h1] = True
    assert np.all(y[~written] == sentinel[~written]), (
        "padded spectrum gaps disturbed"
    )


def test_c2r_padded_spectrum_rows():
    """Backward (C2R) reading the half spectrum out of padded rows."""
    n, b, dist = 32, 3, 40
    desc = make(
        n,
        number_of_transforms=b,
        backward_strides=[1],
        backward_distance=dist,
    )
    plan = desc.commit()
    x = gen_real(desc, 8)
    spec = np.fft.rfft(x, axis=-1).astype(np.complex64)
    h1 = n // 2 + 1
    buf = np.full(desc.get_input_count(Direction.BACKWARD), 9 + 9j,
                  np.complex64)
    for k in range(b):
        buf[k * dist : k * dist + h1] = spec[k]
    y = np.asarray(plan.compute_backward(buf))
    assert np.allclose(y.reshape(b, n) / n, x, atol=1e-4)


def test_r2c_strided_spectrum_side():
    """Spectrum side with stride > 1 (complex elements every other slot)."""
    n, b, s = 32, 2, 2
    h1 = n // 2 + 1
    dist = (h1 - 1) * s + 1 + 3
    desc = make(
        n,
        number_of_transforms=b,
        backward_strides=[s],
        backward_distance=dist,
    )
    plan = desc.commit()
    x = gen_real(desc, 9)
    y = np.asarray(plan.compute_forward(x.reshape(-1))).reshape(-1)
    ref = np.fft.rfft(x, axis=-1)
    for k in range(b):
        got = y[k * dist : k * dist + (h1 - 1) * s + 1 : s]
        assert np.allclose(got, ref[k], atol=1e-3), k


def test_real_buffer_counts():
    d = make(64, number_of_transforms=2)
    assert d.get_input_count(Direction.FORWARD) == 128       # real elems
    assert d.get_output_count(Direction.FORWARD) == 66       # complex elems
    assert d.domain_lengths(Direction.BACKWARD) == [33]
    assert d.backward_distance == 33


@pytest.mark.parametrize("n", [64, 2048])
def test_real_inplace_fftw_layout_roundtrip(n):
    """In-place R2C/C2R with the FFTW padded layout (rows of 2·(n/2+1)
    reals share the buffer with the half spectrum) — extension beyond the
    reference (committed_descriptor.hpp:134-137 throws for REAL)."""
    b = 3
    h1 = n // 2 + 1
    desc = make(n, number_of_transforms=b, placement=Placement.IN_PLACE)
    assert desc.forward_distance == 2 * h1  # padded default
    plan = desc.commit()
    rng = np.random.Generator(np.random.SFC64(5))
    x = rng.uniform(-1.0, 1.0, (b, n)).astype(np.float32)
    buf = np.full((b, 2 * h1), -5.0, np.float32)
    buf[:, :n] = x
    spec = np.asarray(plan.compute_forward(buf.reshape(-1)))
    got = spec.reshape(b, h1)
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    tol = 1e-4 * np.sqrt(n)
    assert np.allclose(got, ref, atol=tol), np.abs(got - ref).max()
    # backward: same buffer (complex view) -> padded real rows, /n scale
    back = np.asarray(
        plan.compute_backward(np.ascontiguousarray(spec).reshape(-1))
    )
    rows = back.reshape(b, 2 * h1)[:, :n] / n
    assert np.allclose(rows, x, atol=tol), np.abs(rows - x).max()


def test_real_inplace_fp64_native():
    """fp64 (native on the CPU backend) through the in-place padded
    layout — reference runs its whole suite in double (fft_double.cpp)."""
    n, b = 256, 2
    h1 = n // 2 + 1
    plan = make(
        n, number_of_transforms=b, placement=Placement.IN_PLACE,
        precision=np.float64,
    ).commit()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, n))
    buf = np.zeros((b, 2 * h1))
    buf[:, :n] = x
    spec = np.asarray(plan.compute_forward(buf.reshape(-1))).reshape(b, h1)
    ref = np.fft.rfft(x, axis=1)
    rel = np.linalg.norm(spec - ref) / np.linalg.norm(ref)
    assert rel < 1e-13, rel


def test_real_inplace_buffer_counts_cover_both_domains():
    """get_input_count must size the SHARED padded buffer: the half
    spectrum fills every padded row completely (two reals past the last
    real sample of the last row), so a buffer sized by the forward count
    alone would be 2 elements short."""
    n, b = 64, 3
    h1 = n // 2 + 1
    desc = make(n, number_of_transforms=b, placement=Placement.IN_PLACE)
    assert desc.get_input_count(Direction.FORWARD) == 2 * b * h1
    assert desc.get_output_count(Direction.BACKWARD) == 2 * b * h1
    assert desc.get_input_count(Direction.BACKWARD) == b * h1
    # a buffer of exactly get_input_count(FORWARD) reals passes compute
    plan = desc.commit()
    buf = np.zeros(desc.get_input_count(Direction.FORWARD), np.float32)
    plan.compute_forward(buf)


def test_real_inplace_bad_distance_raises():
    with pytest.raises(InvalidConfiguration):
        make(
            64, placement=Placement.IN_PLACE, forward_distance=64
        ).commit()


def test_real_inplace_multidim_unsupported():
    with pytest.raises(UnsupportedConfiguration):
        make(lengths=[4, 64], placement=Placement.IN_PLACE).commit()


def test_real_inplace_split_unsupported():
    with pytest.raises(UnsupportedConfiguration):
        make(
            64,
            placement=Placement.IN_PLACE,
            complex_storage=ComplexStorage.SPLIT_COMPLEX,
        ).commit()


def test_real_odd_length_unsupported():
    with pytest.raises(UnsupportedConfiguration):
        make(63).commit()


def test_real_complex_input_rejected():
    plan = make(64).commit()
    with pytest.raises(InvalidConfiguration):
        plan.compute_forward(np.zeros(64, np.complex64))
