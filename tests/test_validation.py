"""Invalid/unsupported configuration tests (reference InvalidFFTTest suite,
test/unit_test/instantiate_fft_tests.hpp:322-373 and descriptor_validation
semantics)."""

import pytest

from portfft_tpu import (
    Descriptor,
    Domain,
    InvalidConfiguration,
    Placement,
    UnsupportedConfiguration,
)


def commit(**kw):
    return Descriptor(**kw).commit()


def test_real_domain_restrictions():
    # REAL domain is supported here (extension beyond the reference, which
    # throws unconditionally) — even last dim required; in-place takes the
    # FFTW padded layout (1D + interleaved + padded distance only).
    commit(lengths=[8], domain=Domain.REAL)
    commit(lengths=[8], domain=Domain.REAL, placement=Placement.IN_PLACE)
    with pytest.raises(UnsupportedConfiguration):
        commit(
            lengths=[4, 8], domain=Domain.REAL, placement=Placement.IN_PLACE
        )
    with pytest.raises(UnsupportedConfiguration):
        commit(lengths=[9], domain=Domain.REAL)


def test_zero_batch():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[8], number_of_transforms=0)


def test_empty_lengths():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[])


def test_zero_length():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[0])
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[4, 0])


def test_zero_stride():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[8], forward_strides=[0])


def test_mismatched_strides_length():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[8], forward_strides=[1, 1])


def test_zero_distance_batched():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[8], number_of_transforms=2, forward_distance=0)


def test_overlapping_batches_1d():
    # distance smaller than the strided footprint -> collision
    with pytest.raises(InvalidConfiguration):
        commit(
            lengths=[8],
            number_of_transforms=4,
            forward_strides=[4],
            forward_distance=8,
            backward_strides=[4],
            backward_distance=8,
        )


def test_batch_interleaved_ok():
    # distance=1, stride=batch is the canonical non-overlapping interleave
    commit(
        lengths=[8],
        number_of_transforms=16,
        forward_strides=[16],
        forward_distance=1,
        backward_strides=[16],
        backward_distance=1,
    )


def test_inplace_mismatched_strides():
    with pytest.raises(InvalidConfiguration):
        commit(
            lengths=[8],
            placement=Placement.IN_PLACE,
            forward_strides=[1],
            backward_strides=[2],
        )


def test_inplace_mismatched_distance():
    with pytest.raises(InvalidConfiguration):
        commit(
            lengths=[8],
            number_of_transforms=2,
            placement=Placement.IN_PLACE,
            forward_distance=8,
            backward_distance=16,
        )


def test_multidim_overlap():
    with pytest.raises(InvalidConfiguration):
        commit(lengths=[4, 4], forward_strides=[2, 1], backward_strides=[2, 1])


def test_multidim_non_default_layout_unsupported():
    with pytest.raises(UnsupportedConfiguration):
        commit(
            lengths=[4, 4],
            forward_strides=[1, 4],
            backward_strides=[1, 4],
        )


def test_negative_distance_rejected():
    """Negative distances walked before the buffer start and slipped past
    the == 0 check while the overlap walk early-returned (review fix)."""
    from portfft_tpu import Descriptor, InvalidConfiguration
    import pytest

    with pytest.raises(InvalidConfiguration, match="distance"):
        Descriptor(
            lengths=[16], number_of_transforms=4,
            forward_distance=-1, backward_distance=-1,
        ).commit()


def test_empty_lengths_real_domain_typed_error():
    """lengths=[] with REAL domain used to IndexError in __post_init__
    before validation could raise the typed error."""
    from portfft_tpu import Descriptor, Domain, InvalidConfiguration
    import pytest

    with pytest.raises(InvalidConfiguration, match="at least 1"):
        Descriptor(lengths=[], domain=Domain.REAL)
