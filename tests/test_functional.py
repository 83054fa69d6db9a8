"""Functional (numpy.fft-style) API and the pure traceable ``apply`` entry
— JAX-native extensions over the descriptor model (the reference exposes
only plan-and-execute, committed_descriptor.hpp:58-310)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import portfft_tpu as pfft
from portfft_tpu import functional as F
from portfft_tpu.enums import Direction


@pytest.fixture(autouse=True)
def fresh_cache():
    F.clear_plan_cache()
    yield
    F.clear_plan_cache()


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_fft_matches_numpy():
    x = (_rng().uniform(-1, 1, (5, 256))
         + 1j * _rng(1).uniform(-1, 1, (5, 256))).astype(np.complex64)
    got = np.asarray(F.fft(x))
    ref = np.fft.fft(x)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


def test_ifft_normalization_roundtrip():
    x = (_rng(2).uniform(-1, 1, (3, 128))
         + 1j * _rng(3).uniform(-1, 1, (3, 128))).astype(np.complex64)
    back = np.asarray(F.ifft(F.fft(x)))
    assert np.allclose(back, x, atol=1e-5)


@pytest.mark.parametrize("norm", ["ortho", "forward"])
def test_fft_norms(norm):
    x = (_rng(4).uniform(-1, 1, (2, 64))
         + 1j * _rng(5).uniform(-1, 1, (2, 64))).astype(np.complex64)
    got = np.asarray(F.fft(x, norm=norm))
    ref = np.fft.fft(x, norm=norm)
    assert np.allclose(got, ref, atol=1e-4)
    back = np.asarray(F.ifft(jnp.asarray(got), norm=norm))
    assert np.allclose(back, x, atol=1e-4)


def test_fft2_and_fftn():
    x = (_rng(6).uniform(-1, 1, (4, 16, 32))
         + 1j * _rng(7).uniform(-1, 1, (4, 16, 32))).astype(np.complex64)
    got = np.asarray(F.fft2(x))
    ref = np.fft.fft2(x)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    got3 = np.asarray(F.fftn(x))  # all three axes
    ref3 = np.fft.fftn(x)
    assert np.linalg.norm(got3 - ref3) / np.linalg.norm(ref3) < 1e-5


def test_rfft_irfft():
    x = _rng(8).uniform(-1, 1, (6, 128)).astype(np.float32)
    got = np.asarray(F.rfft(x))
    ref = np.fft.rfft(x)
    assert got.shape == (6, 65)
    assert np.allclose(got, ref, atol=1e-3)
    back = np.asarray(F.irfft(jnp.asarray(got), 128))
    assert np.allclose(back, x, atol=1e-4)
    with pytest.raises(pfft.InvalidConfiguration, match="half spectrum"):
        F.irfft(jnp.asarray(got), 100)


def test_fft_axis_and_n():
    """numpy signature parity: axis= transforms a non-last axis; n= pads
    or truncates before the transform."""
    x = (_rng(21).uniform(-1, 1, (32, 5))
         + 1j * _rng(22).uniform(-1, 1, (32, 5))).astype(np.complex64)
    got = np.asarray(F.fft(x, axis=0))
    assert np.allclose(got, np.fft.fft(x, axis=0), atol=1e-4)
    y = (_rng(23).uniform(-1, 1, (3, 100))
         + 1j * _rng(24).uniform(-1, 1, (3, 100))).astype(np.complex64)
    assert np.allclose(np.asarray(F.fft(y, n=128)),
                       np.fft.fft(y, n=128), atol=1e-4)
    assert np.allclose(np.asarray(F.fft(y, n=64)),
                       np.fft.fft(y, n=64), atol=1e-4)
    r = _rng(25).uniform(-1, 1, (16, 4)).astype(np.float32)
    assert np.allclose(np.asarray(F.rfft(r, axis=0)),
                       np.fft.rfft(r, axis=0), atol=1e-3)
    spec = np.fft.rfft(r, axis=0).astype(np.complex64)
    assert np.allclose(np.asarray(F.irfft(jnp.asarray(spec), 16, axis=0)),
                       r, atol=1e-3)


def test_rfft_jax_input_repairs_raw_spectrum():
    """jax-array input takes the raw interleaved-pairs return convention;
    the wrapper must re-pair it through the layout-safe helper."""
    x = _rng(20).uniform(-1, 1, (6, 128)).astype(np.float32)
    got = np.asarray(F.rfft(jnp.asarray(x)))
    assert got.shape == (6, 65) and np.iscomplexobj(got)
    assert np.allclose(got, np.fft.rfft(x), atol=1e-3)


def test_rfft2_rfftn_match_numpy():
    x = _rng(26).uniform(-1, 1, (3, 8, 32)).astype(np.float32)
    got = np.asarray(F.rfft2(x))
    ref = np.fft.rfft2(x)
    assert got.shape == ref.shape == (3, 8, 17)
    assert np.allclose(got, ref, atol=1e-3)
    got3 = np.asarray(F.rfftn(x))
    ref3 = np.fft.rfftn(x)
    assert np.allclose(got3, ref3, atol=1e-3)
    back = np.asarray(F.irfft2(jnp.asarray(got), (8, 32)))
    assert np.allclose(back, x, atol=1e-4)
    with pytest.raises(pfft.InvalidConfiguration, match="half spectrum"):
        F.irfftn(jnp.asarray(got), (8, 30))


def test_plan_cache_reuse():
    x = (_rng(9).uniform(-1, 1, (2, 64))
         + 1j * _rng(10).uniform(-1, 1, (2, 64))).astype(np.complex64)
    F.fft(x)
    h0 = F._plan.cache_info().hits
    F.fft(x)  # same (shape, dtype, norm) -> cached plan
    assert F._plan.cache_info().hits == h0 + 1


def test_bad_norm_raises():
    with pytest.raises(pfft.InvalidConfiguration, match="norm"):
        F.fft(jnp.zeros((2, 16), jnp.complex64), norm="bogus")


# ---------------------------------------------------------------------------
# CommittedDescriptor.apply — pure traced entry
# ---------------------------------------------------------------------------


def test_apply_matches_numpy_and_jits():
    n, b = 512, 4
    plan = pfft.Descriptor(lengths=[n], number_of_transforms=b).commit()
    x = (_rng(11).uniform(-1, 1, (b, n))
         + 1j * _rng(12).uniform(-1, 1, (b, n))).astype(np.complex64)
    got = np.asarray(plan.apply(jnp.asarray(x)))
    ref = np.fft.fft(x)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    # composes under a user jit with other ops
    fn = jax.jit(lambda v: jnp.abs(plan.apply(v)) ** 2)
    p = np.asarray(fn(jnp.asarray(x)))
    assert np.allclose(p, np.abs(ref) ** 2, rtol=1e-3, atol=1e-3)


def test_apply_split_planes_and_backward():
    n, b = 256, 2
    plan = pfft.Descriptor(lengths=[n], number_of_transforms=b).commit()
    xr = _rng(13).uniform(-1, 1, (b, n)).astype(np.float32)
    xi = _rng(14).uniform(-1, 1, (b, n)).astype(np.float32)
    yr, yi = plan.apply(jnp.asarray(xr), jnp.asarray(xi))
    ref = np.fft.fft(xr + 1j * xi)
    assert np.allclose(np.asarray(yr) + 1j * np.asarray(yi), ref,
                       atol=1e-3)
    br, bi = plan.apply(yr, yi, direction=Direction.BACKWARD)
    assert np.allclose(np.asarray(br) / n, xr, atol=1e-4)


def test_apply_differentiable():
    """The DFT is linear; grad of sum|FFT(x)|^2 = 2*N*x by Parseval."""
    n, b = 64, 2
    plan = pfft.Descriptor(lengths=[n], number_of_transforms=b).commit()
    xr = jnp.asarray(_rng(15).uniform(-1, 1, (b, n)).astype(np.float32))

    def loss(v):
        return jnp.sum(jnp.abs(plan.apply(v, jnp.zeros_like(v))[0]) ** 2
                       + jnp.abs(plan.apply(v, jnp.zeros_like(v))[1]) ** 2)

    g = jax.grad(loss)(xr)
    assert np.allclose(np.asarray(g), 2 * n * np.asarray(xr), rtol=1e-3,
                       atol=1e-2)


def test_apply_rejects_real_domain():
    plan = pfft.Descriptor(
        lengths=[64], number_of_transforms=1, domain=pfft.Domain.REAL
    ).commit()
    with pytest.raises(pfft.UnsupportedConfiguration, match="REAL"):
        plan.apply(jnp.zeros((1, 64), jnp.float32))


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_hfft_ihfft_match_numpy(norm):
    rng = _rng(11)
    half = (rng.uniform(-1, 1, (3, 65)) + 1j * rng.uniform(-1, 1, (3, 65))
            ).astype(np.complex64)
    got = np.asarray(F.hfft(half, norm=norm))
    ref = np.fft.hfft(half, norm=norm)
    assert got.shape == ref.shape == (3, 128)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5

    sig = rng.uniform(-1, 1, (3, 128)).astype(np.float32)
    got = np.asarray(F.ihfft(sig, norm=norm))
    ref = np.fft.ihfft(sig, norm=norm)
    assert got.shape == ref.shape == (3, 65)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


def test_hfft_odd_output_and_axis():
    rng = _rng(12)
    half = (rng.uniform(-1, 1, (4, 33)) + 1j * rng.uniform(-1, 1, (4, 33))
            ).astype(np.complex64)
    # explicit odd n exercises the non-default parity
    got = np.asarray(F.hfft(half, n=65))
    ref = np.fft.hfft(half, n=65)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    # axis= path
    got = np.asarray(F.ihfft(ref.T.copy(), axis=0))
    want = np.fft.ihfft(ref, axis=-1).T
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


def test_irfft_default_n():
    rng = _rng(13)
    x = rng.uniform(-1, 1, (2, 256)).astype(np.float32)
    half = np.fft.rfft(x).astype(np.complex64)
    got = np.asarray(F.irfft(half))
    assert got.shape == (2, 256)
    assert np.allclose(got, x, atol=1e-4)
    got = np.asarray(F.irfftn(np.fft.rfftn(x).astype(np.complex64)))
    assert got.shape == (2, 256)
    assert np.allclose(got, x, atol=1e-4)


def test_fftfreq_and_shift_match_numpy():
    for n in (8, 9, 128):
        assert np.allclose(np.asarray(F.fftfreq(n, d=0.25)),
                           np.fft.fftfreq(n, d=0.25), atol=1e-6)
        assert np.allclose(np.asarray(F.rfftfreq(n, d=2.0)),
                           np.fft.rfftfreq(n, d=2.0), atol=1e-7)
    x = _rng(14).uniform(-1, 1, (5, 6, 7)).astype(np.float32)
    assert np.array_equal(np.asarray(F.fftshift(x)), np.fft.fftshift(x))
    assert np.array_equal(np.asarray(F.ifftshift(x)), np.fft.ifftshift(x))
    assert np.array_equal(np.asarray(F.fftshift(x, axes=(1, 2))),
                          np.fft.fftshift(x, axes=(1, 2)))
    assert np.array_equal(
        np.asarray(F.ifftshift(F.fftshift(x, axes=1), axes=1)), x)


def test_odd_length_real_fallbacks():
    """Odd last-axis real transforms route through the C2C plan (the
    committed REAL path requires even lengths) with numpy semantics."""
    rng = _rng(15)
    x = rng.uniform(-1, 1, (4, 125)).astype(np.float32)
    got = np.asarray(F.rfft(x))
    ref = np.fft.rfft(x)
    assert got.shape == ref.shape == (4, 63)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    back = np.asarray(F.irfft(ref.astype(np.complex64), n=125))
    assert np.allclose(back, x, atol=1e-4)
    # N-D odd last axis
    x2 = rng.uniform(-1, 1, (2, 8, 27)).astype(np.float32)
    got = np.asarray(F.rfftn(x2, ndim=2))
    ref = np.fft.rfftn(x2, axes=(-2, -1))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    back = np.asarray(F.irfftn(ref.astype(np.complex64), s=(8, 27)))
    assert np.allclose(back, x2, atol=1e-4)
