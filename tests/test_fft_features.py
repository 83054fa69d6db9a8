"""Cross-cutting feature suites: scales, offsets, strided layouts, split
complex, in-place, batch-interleaved — mirroring the reference's feature
suites (instantiate_fft_tests.hpp:176-319)."""

import numpy as np
import pytest

from fft_test_utils import run_test
from portfft_tpu import ComplexStorage, Descriptor, Direction, Placement

F = Direction.FORWARD
B = Direction.BACKWARD


# --- scales (Fwd/BwdScaledFFTTest, :221-235) --------------------------------


@pytest.mark.parametrize("scale", [-1.0, 2.0])
@pytest.mark.parametrize("n", [8, 256, 4096])
def test_forward_scale(scale, n):
    run_test(lengths=[n], number_of_transforms=3, forward_scale=scale)


@pytest.mark.parametrize("scale", [-1.0, 2.0])
@pytest.mark.parametrize("n", [8, 256])
def test_backward_scale(scale, n):
    run_test(
        direction=B, lengths=[n], number_of_transforms=3, backward_scale=scale
    )


# --- offsets (Offsets* suites, :185-218) ------------------------------------


@pytest.mark.parametrize("offset", [8, 67, 2049])
@pytest.mark.parametrize("n", [16, 512])
def test_offsets_matched(offset, n):
    run_test(
        lengths=[n],
        number_of_transforms=3,
        forward_offset=offset,
        backward_offset=offset,
    )


@pytest.mark.parametrize("fwd,bwd", [(8, 2047), (67, 0), (0, 67)])
def test_offsets_mismatched(fwd, bwd):
    run_test(
        lengths=[64],
        number_of_transforms=3,
        forward_offset=fwd,
        backward_offset=bwd,
    )


def test_offsets_multidim():
    run_test(
        lengths=[16, 32],
        number_of_transforms=2,
        forward_offset=67,
        backward_offset=67,
    )


# --- batch-interleaved layout (SubgroupTest BI regressions, :108-118) -------


@pytest.mark.parametrize("n,batch", [(80, 44), (100, 100), (64, 17)])
def test_batch_interleaved_both_domains(n, batch):
    run_test(
        lengths=[n],
        number_of_transforms=batch,
        forward_strides=[batch],
        forward_distance=1,
        backward_strides=[batch],
        backward_distance=1,
    )


def test_batch_interleaved_one_domain():
    # packed input, batch-interleaved output
    run_test(
        lengths=[32],
        number_of_transforms=9,
        backward_strides=[9],
        backward_distance=1,
    )


# --- arbitrary strides (Strided suites, :237-319) ---------------------------


@pytest.mark.parametrize("stride", [2, 3, 7])
def test_strided_input(stride):
    n, batch = 32, 4
    run_test(
        lengths=[n],
        number_of_transforms=batch,
        forward_strides=[stride],
        forward_distance=n * stride,
    )


def test_strided_output():
    n, batch = 16, 3
    run_test(
        lengths=[n],
        number_of_transforms=batch,
        backward_strides=[5],
        backward_distance=5 * n,
    )


def test_strided_both_mismatched():
    n, batch = 24, 3
    run_test(
        lengths=[n],
        number_of_transforms=batch,
        forward_strides=[3],
        forward_distance=3 * n,
        backward_strides=[2],
        backward_distance=2 * n + 1,
    )


def test_strided_large_fused():
    # arbitrary strides at a size beyond the reference's UNPACKED envelope
    # (descriptor_validation.hpp:67-80 restricts UNPACKED to subgroup sizes;
    # this build supports it at any size via gather prologues)
    run_test(
        lengths=[4096],
        number_of_transforms=2,
        forward_strides=[2],
        forward_distance=8192,
    )


# --- in-place (placement::IN_PLACE) ------------------------------------------


@pytest.mark.parametrize("n", [8, 256, 4096])
@pytest.mark.parametrize("direction", [F, B])
def test_in_place(n, direction):
    run_test(
        direction=direction,
        lengths=[n],
        number_of_transforms=3,
        placement=Placement.IN_PLACE,
    )


def test_in_place_strided():
    run_test(
        lengths=[16],
        number_of_transforms=4,
        placement=Placement.IN_PLACE,
        forward_strides=[3],
        forward_distance=48,
        backward_strides=[3],
        backward_distance=48,
    )


# --- split complex storage ----------------------------------------------------


@pytest.mark.parametrize("n", [8, 256, 4096])
def test_split_complex(n):
    run_test(
        lengths=[n],
        number_of_transforms=3,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    )


def test_split_complex_backward_inplace():
    run_test(
        direction=B,
        lengths=[64],
        number_of_transforms=5,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
        placement=Placement.IN_PLACE,
    )


def test_split_complex_strided():
    run_test(
        lengths=[32],
        number_of_transforms=3,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
        forward_strides=[2],
        forward_distance=64,
        forward_offset=5,
    )


# --- multi-dimensional (MultidimensionalTest, :176-182) ----------------------


@pytest.mark.parametrize(
    "lengths",
    [[2, 4], [4, 2], [16, 512], [64, 2048], [2, 3, 6], [2, 3, 2, 3]],
)
def test_multidim(lengths):
    run_test(lengths=lengths, number_of_transforms=3)


def test_multidim_backward():
    run_test(direction=B, lengths=[16, 64], number_of_transforms=2)


def test_multidim_512x512():
    run_test(lengths=[512, 512], number_of_transforms=1)


def test_multidim_3d_128():
    run_test(lengths=[128, 128, 128], number_of_transforms=1)


@pytest.mark.parametrize("lengths", [[4, 65536], [65536, 4]])
def test_multidim_with_global_axis(lengths):
    """Multi-dim where one axis plans GLOBAL (two-pass): the reference
    throws for GLOBAL + multi-dim (committed_descriptor_impl.hpp:757-764);
    here the per-axis executors compose, in either axis position."""
    run_test(lengths=lengths, number_of_transforms=2)


# --- raw interleaved float buffers (the reference's Scalar* view) ------------


def test_raw_float_interleaved():
    import oracle

    desc = Descriptor(lengths=[64], number_of_transforms=3)
    plan = desc.commit()
    x = oracle.gen_input(desc, 0)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    raw = np.empty(2 * flat.shape[0], dtype=np.float32)
    raw[0::2] = flat.real
    raw[1::2] = flat.imag
    out_raw = np.asarray(plan.compute_forward(raw))
    out = out_raw[0::2] + 1j * out_raw[1::2]
    oracle.verify(desc, out, ref, F, check_padding=False)


# --- round trip ---------------------------------------------------------------


@pytest.mark.parametrize("n", [64, 1024])
def test_round_trip(n):
    import oracle

    desc = Descriptor(lengths=[n], number_of_transforms=2)
    plan = desc.commit()
    x = oracle.gen_input(desc, 1)
    flat = oracle.materialize(desc, x, F)
    y = plan.compute_forward(flat)
    x2 = np.asarray(plan.compute_backward(np.asarray(y)))
    # fwd+bwd with unit scales multiplies by N (descriptor.hpp:65-68)
    got = oracle.extract(desc, x2, B) / n
    assert np.allclose(got, x, atol=1e-4)
