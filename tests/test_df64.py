"""Emulated-fp64 (double-double) transforms: ops/df64.py.

The reference skips fp64 on devices without the aspect; the df64 path is
an opt-in extension giving ~1e-14 relative error from f32 hardware via
error-free transformations.  These tests run the same executor the TPU
uses (pure jnp, backend-agnostic)."""

import numpy as np
import pytest

from portfft_tpu import ComplexStorage, Descriptor
from portfft_tpu.exceptions import UnsupportedConfiguration

RTOL = 1e-12  # df64 measures ~5e-15; 200x margin


def _roundtrip(plan, n, b, seed=0):
    rng = np.random.default_rng(seed)
    x = (
        rng.standard_normal(b * n) + 1j * rng.standard_normal(b * n)
    ).astype(np.complex128)
    y = plan.compute_forward(x)
    ref = np.fft.fft(x.reshape(b, n), axis=1).reshape(-1)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < RTOL, rel
    back = np.asarray(plan.compute_backward(y)) / n
    relb = np.linalg.norm(back - x) / np.linalg.norm(x)
    assert relb < RTOL, relb


@pytest.mark.parametrize("n", [8, 64, 360])
def test_df64_roundtrip(n):
    plan = Descriptor(
        lengths=[n], number_of_transforms=2, precision="float64"
    ).commit(emulate_fp64=True)
    _roundtrip(plan, n, 2)


def test_df64_multidim_and_scale():
    plan = Descriptor(
        lengths=[32, 64],
        number_of_transforms=2,
        precision="float64",
        forward_scale=0.25,
    ).commit(emulate_fp64=True)
    rng = np.random.default_rng(3)
    tot = 2 * 32 * 64
    x = (
        rng.standard_normal(tot) + 1j * rng.standard_normal(tot)
    ).astype(np.complex128)
    y = plan.compute_forward(x)
    ref = 0.25 * np.fft.fftn(
        x.reshape(2, 32, 64), axes=(1, 2)
    ).reshape(-1)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < RTOL


def test_df64_split_storage():
    plan = Descriptor(
        lengths=[256],
        number_of_transforms=3,
        precision="float64",
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    ).commit(emulate_fp64=True)
    rng = np.random.default_rng(4)
    xr = rng.standard_normal(3 * 256)
    xi = rng.standard_normal(3 * 256)
    yr, yi = plan.compute_forward(xr, xi)
    ref = np.fft.fft((xr + 1j * xi).reshape(3, 256), axis=1).reshape(-1)
    got = yr + 1j * yi
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < RTOL


def test_df64_strided_layout():
    plan = Descriptor(
        lengths=[64],
        number_of_transforms=4,
        precision="float64",
        forward_strides=[2],
        forward_distance=128,
    ).commit(emulate_fp64=True)
    rng = np.random.default_rng(5)
    x = (
        rng.standard_normal(4 * 128) + 1j * rng.standard_normal(4 * 128)
    ).astype(np.complex128)
    y = plan.compute_forward(x)
    ref = np.fft.fft(x.reshape(4, 64, 2)[:, :, 0], axis=1).reshape(-1)
    assert (
        np.linalg.norm(np.asarray(y)[: 4 * 64] - ref)
        / np.linalg.norm(ref)
        < RTOL
    )


def test_df64_large_prime_unsupported():
    with pytest.raises(UnsupportedConfiguration, match="prime factors"):
        Descriptor(lengths=[65537], precision="float64").commit(
            emulate_fp64=True
        )


def test_df64_out_buffer_and_inplace_preserve():
    """Review regression: out= larger than required must not crash, and
    IN_PLACE gap elements must be preserved (the compute contract)."""
    from portfft_tpu import Placement

    n, b = 8, 2
    plan = Descriptor(
        lengths=[n], number_of_transforms=b, precision="float64"
    ).commit(emulate_fp64=True)
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(b * n) + 1j * rng.standard_normal(b * n)).astype(
        np.complex128
    )
    big = np.full(2 * b * n, 7 + 7j, np.complex128)  # double-size out
    y = plan.compute_forward(x, out=big)
    ref = np.fft.fft(x.reshape(b, n), axis=1).reshape(-1)
    got = np.asarray(y)[: b * n]
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < RTOL
    assert np.all(np.asarray(y)[b * n :] == 7 + 7j)  # tail preserved

    # IN_PLACE with a gap (distance > n): gap elements survive
    plan2 = Descriptor(
        lengths=[n],
        number_of_transforms=b,
        precision="float64",
        placement=Placement.IN_PLACE,
        forward_distance=n + 4,
        backward_distance=n + 4,
    ).commit(emulate_fp64=True)
    buf = np.full(b * (n + 4), 7 + 7j, np.complex128)
    rng2 = np.random.default_rng(7)
    vals = (
        rng2.standard_normal((b, n)) + 1j * rng2.standard_normal((b, n))
    )
    view = buf.reshape(b, n + 4)
    view[:, :n] = vals
    y2 = np.asarray(plan2.compute_forward(buf)).reshape(b, n + 4)
    ref2 = np.fft.fft(vals, axis=1)
    assert np.linalg.norm(y2[:, :n] - ref2) / np.linalg.norm(ref2) < RTOL
    assert np.all(y2[:, n:] == 7 + 7j)  # gap untouched


def test_env_flag_zero_means_off(monkeypatch):
    """PORTFFT_EMULATE_FP64=0 must NOT enable emulation (review fix)."""
    import jax

    monkeypatch.setenv("PORTFFT_EMULATE_FP64", "0")
    if jax.default_backend() == "cpu":
        # on CPU the native x64 path should be taken, not df64
        plan = Descriptor(lengths=[64], precision="float64").commit()
        assert plan._df64 is False


def test_df64_naive_prime_stage():
    """Primes in (13, 128] run as naive O(f) vectorized df64 DFT stages
    (round-3: lifted from the previous <=13 limit)."""
    n = 127
    desc = Descriptor(lengths=[n], number_of_transforms=4, precision="float64")
    plan = desc.commit(emulate_fp64=True)
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, (4, n)) + 1j * rng.uniform(-1, 1, (4, n)))
    y = plan.compute_forward(x.reshape(-1).astype(np.complex128))
    ref = np.fft.fft(x).reshape(-1)
    rel = np.linalg.norm(np.asarray(y).reshape(-1) - ref) / np.linalg.norm(ref)
    # CPU runs the naive stage as fori_loop at reduced (~1e-8) precision;
    # the TPU path unrolls and keeps full df64 (see df64._dft_factor)
    assert rel < 1e-7, rel


def test_df64_composite_with_midsize_prime():
    n = 2 * 31  # 62: radix-2 + naive-31 stages
    desc = Descriptor(lengths=[n], number_of_transforms=3, precision="float64")
    plan = desc.commit(emulate_fp64=True)
    rng = np.random.default_rng(1)
    x = (rng.uniform(-1, 1, (3, n)) + 1j * rng.uniform(-1, 1, (3, n)))
    y = plan.compute_forward(x.reshape(-1).astype(np.complex128))
    ref = np.fft.fft(x).reshape(-1)
    rel = np.linalg.norm(np.asarray(y).reshape(-1) - ref) / np.linalg.norm(ref)
    assert rel < 1e-7, rel  # fori_loop naive stage on CPU (see above)


def test_df64_4096_batch256():
    """The round-2 VERDICT 'done' criterion: df64 N=4096 batch>=256 runs
    end-to-end with the transform jitted on device."""
    n, b = 4096, 256
    desc = Descriptor(lengths=[n], number_of_transforms=b, precision="float64")
    plan = desc.commit(emulate_fp64=True)
    rng = np.random.default_rng(2)
    x = (rng.uniform(-1, 1, (b, n)) + 1j * rng.uniform(-1, 1, (b, n)))
    y = plan.compute_forward(x.reshape(-1).astype(np.complex128))
    got = np.asarray(y).reshape(b, n)
    ref = np.fft.fft(x)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-13, rel


def test_df64_real_domain_roundtrip():
    """R2C/C2R on the df64 path (zero-imaginary forward / Hermitian-
    extended backward through the COMPLEX core)."""
    from portfft_tpu import Domain

    n, b = 256, 2
    h1 = n // 2 + 1
    desc = Descriptor(
        lengths=[n], number_of_transforms=b, domain=Domain.REAL,
        precision="float64",
    )
    plan = desc.commit(emulate_fp64=True)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((b, n))
    spec = np.asarray(plan.compute_forward(x.reshape(-1))).reshape(b, h1)
    ref = np.fft.rfft(x, axis=1)
    rel = np.linalg.norm(spec - ref) / np.linalg.norm(ref)
    assert rel < 1e-13, rel
    back = np.asarray(plan.compute_backward(spec.reshape(-1))).reshape(b, n)
    rel2 = np.linalg.norm(back / n - x) / np.linalg.norm(x)
    assert rel2 < 1e-13, rel2


def test_df64_real_unsupported_shapes():
    from portfft_tpu import Domain, Placement
    from portfft_tpu.exceptions import UnsupportedConfiguration
    import pytest

    with pytest.raises(UnsupportedConfiguration):
        Descriptor(
            lengths=[8, 64], number_of_transforms=1, domain=Domain.REAL,
            precision="float64",
        ).commit(emulate_fp64=True)
    with pytest.raises(UnsupportedConfiguration):
        Descriptor(
            lengths=[64], number_of_transforms=1, domain=Domain.REAL,
            placement=Placement.IN_PLACE, precision="float64",
        ).commit(emulate_fp64=True)
    # offsets pass the PACKED layout check (classification ignores them)
    # but the df64 REAL path reads from element 0 — must be rejected
    with pytest.raises(UnsupportedConfiguration, match="offset"):
        Descriptor(
            lengths=[64], number_of_transforms=1, domain=Domain.REAL,
            forward_offset=8, precision="float64",
        ).commit(emulate_fp64=True)


def test_df64_split_out_tuple():
    """out=(re, im) on the df64 SPLIT path unpacks like _compute_split
    (previously the tuple was flattened into one double-length buffer)."""
    from portfft_tpu import ComplexStorage

    n, b = 64, 2
    desc = Descriptor(
        lengths=[n], number_of_transforms=b, precision="float64",
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    )
    plan = desc.commit(emulate_fp64=True)
    rng = np.random.default_rng(5)
    xr = rng.uniform(-1, 1, b * n)
    xi = rng.uniform(-1, 1, b * n)
    o_re = np.zeros(b * n)
    o_im = np.zeros(b * n)
    yr, yi = plan.compute_forward(xr, xi, out=(o_re, o_im))
    ref = np.fft.fft(xr.reshape(b, n) + 1j * xi.reshape(b, n))
    got = np.asarray(yr).reshape(b, n) + 1j * np.asarray(yi).reshape(b, n)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-13, rel
    assert np.asarray(yr).shape == (b * n,)


def test_df64_apply_traceable():
    """apply() on an emulated-fp64 plan (round-4: VERDICT r3 #9) takes
    hi/lo f32 plane pairs, composes with user jit, and matches the
    compute_forward result at df64 precision."""
    import jax
    import jax.numpy as jnp

    from portfft_tpu.ops.df64 import join_f64, split_f64

    n, batch = 64, 3
    plan = Descriptor(
        lengths=[n], number_of_transforms=batch, precision="float64"
    ).commit(emulate_fp64=True)
    rng = np.random.default_rng(5)
    x = (
        rng.standard_normal(batch * n) + 1j * rng.standard_normal(batch * n)
    ).astype(np.complex128)
    rh, rl = split_f64(x.real)
    ih, il = split_f64(x.imag)

    @jax.jit
    def prog(rh, rl, ih, il):
        (orh, orl), (oih, oil) = plan.apply(
            (rh, rl), (ih, il)
        )
        # compose: another traced op on the result
        return orh * 1.0, orl, oih, oil

    orh, orl, oih, oil = prog(
        *(jnp.asarray(p).reshape(batch, n) for p in (rh, rl, ih, il))
    )
    got = join_f64(np.asarray(orh), np.asarray(orl)) + 1j * join_f64(
        np.asarray(oih), np.asarray(oil)
    )
    ref = np.fft.fft(x.reshape(batch, n), axis=1)
    rel = np.linalg.norm(got.reshape(-1) - ref.reshape(-1)) / np.linalg.norm(
        ref
    )
    assert rel < 1e-13, rel

    # misuse: plain arrays (not hi/lo pairs) raise the typed error
    with pytest.raises(UnsupportedConfiguration):
        plan.apply(jnp.zeros((batch, n)), jnp.zeros((batch, n)))
