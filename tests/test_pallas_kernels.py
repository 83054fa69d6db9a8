"""Pallas fused-kernel correctness in interpreter mode.

The TPU kernels (ops/pallas_fft.py) run under the Pallas interpreter on the
CPU backend — the analogue of the reference's golden-value device-kernel
tests — comparing against the NumPy oracle at the standard tolerance."""

import numpy as np
import pytest

import oracle
from portfft_tpu import ComplexStorage, Descriptor, Direction
from portfft_tpu.enums import Level

F = Direction.FORWARD
B = Direction.BACKWARD


def run_pallas(direction, **kw):
    desc = Descriptor(**kw)
    plan = desc.commit(use_pallas=True)
    n = desc.lengths[0]
    assert plan.plans[n].level in (Level.DIRECT, Level.FUSED)
    x = oracle.gen_input(desc, 3)
    ref = oracle.reference_output(desc, x, direction)
    flat = oracle.materialize(desc, x, direction)
    compute = (
        plan.compute_forward if direction == F else plan.compute_backward
    )
    out = np.asarray(compute(flat))
    oracle.verify(desc, out, ref, direction, check_padding=False)


@pytest.mark.parametrize("n", [8, 64, 128])
def test_pallas_direct(n):
    run_pallas(F, lengths=[n], number_of_transforms=9)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_pallas_fused(n):
    run_pallas(F, lengths=[n], number_of_transforms=3)


def test_pallas_odd_radix():
    run_pallas(F, lengths=[363], number_of_transforms=5)


@pytest.mark.parametrize("n", [64, 2048])
def test_pallas_backward(n):
    run_pallas(B, lengths=[n], number_of_transforms=2)


def test_pallas_batch_not_tile_multiple():
    run_pallas(F, lengths=[256], number_of_transforms=13)


def test_pallas_global_subplans():
    # GLOBAL level drives pallas leaves for its two sub-transforms.
    # (2^15 is single-kernel FUSED since the a≤512 two-stage extension;
    # 2^17 is the smallest power of two planned GLOBAL.)
    desc = Descriptor(lengths=[1 << 17], number_of_transforms=2)
    plan = desc.commit(use_pallas=True)
    assert plan.plans[1 << 17].level == Level.GLOBAL
    x = oracle.gen_input(desc, 4)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, F, check_padding=False)


@pytest.mark.parametrize("n", [1 << 19, 1 << 20])
def test_pallas_global_fused_subs(n):
    # n > 2^18 plans GLOBAL with FUSED [a, 128] sub-transforms; the two-pass
    # engine solves them in-kernel via the lane-DFT helper (natural-order
    # k2-fold restack) — raw interleaved fast path end to end.
    from portfft_tpu.ops import pallas_global

    desc = Descriptor(lengths=[n], number_of_transforms=1)
    plan = desc.commit(use_pallas=True)
    p = plan.plans[n]
    assert p.level == Level.GLOBAL
    assert any(s.level == Level.FUSED for s in p.sub)
    assert pallas_global.global2_raw_supported(
        p, plan.config.direct_threshold
    )
    x = oracle.gen_input(desc, 11)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_global_fused_subs_backward_split():
    # plane-path (split storage) pass through the same fused-sub engine
    n = 1 << 19
    desc = Descriptor(
        lengths=[n],
        number_of_transforms=2,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    )
    plan = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 12)
    ref = oracle.reference_output(desc, x, B)
    flat = oracle.materialize(desc, x, B)
    yr, yi = plan.compute_backward(
        np.ascontiguousarray(flat.real), np.ascontiguousarray(flat.imag)
    )
    out = np.asarray(yr) + 1j * np.asarray(yi)
    oracle.verify(desc, out, ref, B, check_padding=False)


def test_pallas_with_strided_layout():
    # strides force the gather prologue; the leaf still runs in Pallas
    desc = Descriptor(
        lengths=[1024],
        number_of_transforms=4,
        forward_strides=[2],
        forward_distance=2048,
    )
    plan = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 5)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_multidim_raw_pipeline():
    # PACKED interleaved multi-dim goes through the raw pipeline: 1D raw
    # kernel on the last axis + sublane-major column kernels on the rest
    # (one HBM round trip per axis) — including fused column axes (1024)
    # and a 3D case.
    from portfft_tpu import Direction

    for lengths, b in ([128, 256], 2), ([1024, 128], 1), ([16, 32, 128], 2):
        desc = Descriptor(lengths=lengths, number_of_transforms=b)
        plan = desc.commit(use_pallas=True)
        assert plan._raw_fast[Direction.FORWARD][0] == "multidim"
        x = oracle.gen_input(desc, 13)
        ref = oracle.reference_output(desc, x, F)
        flat = oracle.materialize(desc, x, F)
        out = np.asarray(plan.compute_forward(flat))
        oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_multidim_column_passes():
    # 2D exercising both the direct (<=256) and fused (a*128) column passes
    for lengths in ([128, 256], [1024, 128]):
        desc = Descriptor(lengths=lengths, number_of_transforms=2)
        plan = desc.commit(use_pallas=True)
        x = oracle.gen_input(desc, 6)
        ref = oracle.reference_output(desc, x, F)
        flat = oracle.materialize(desc, x, F)
        out = np.asarray(plan.compute_forward(flat))
        oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_split_storage():
    desc = Descriptor(
        lengths=[2048],
        number_of_transforms=4,
        complex_storage=ComplexStorage.SPLIT_COMPLEX,
    )
    plan = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 7)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    yr, yi = plan.compute_forward(
        np.ascontiguousarray(flat.real), np.ascontiguousarray(flat.imag)
    )
    out = np.asarray(yr) + 1j * np.asarray(yi)
    oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_multidim_unit_axes():
    # length-1 outer axes are skipped by the raw pipeline (cols entry None)
    desc = Descriptor(lengths=[1, 64, 128], number_of_transforms=2)
    plan = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 14)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_multidim_cm_variant():
    # the widened-matmul column kernel ({"cm": 1}) matches the pairswap
    # default on fused (1024) and direct (128/256) column axes
    from portfft_tpu import Direction, fastpath

    for lengths, b in ([128, 256], 2), ([1024, 128], 1):
        desc = Descriptor(lengths=lengths, number_of_transforms=b)
        plan = desc.commit(use_pallas=True)
        entry = plan._raw_fast[Direction.FORWARD]
        assert entry[0] == "multidim"
        x = oracle.gen_input(desc, 21)
        ref = oracle.reference_output(desc, x, F)
        flat = oracle.materialize(desc, x, F)
        total = desc.number_of_transforms * desc.get_flattened_length()
        fn = fastpath.build_fn(
            plan, Direction.FORWARD, entry, 2 * total,
            overrides={"cm": 1},
        )
        raw = np.ascontiguousarray(flat).view(np.float32)
        import jax.numpy as jnp

        got = np.asarray(fn(jnp.asarray(raw), plan._bank_arrays))
        out = got.view(np.complex64)
        oracle.verify(desc, out, ref, F, check_padding=False)


def test_pallas_bi_col_cm_variant():
    # BATCH_INTERLEAVED 1D through the mm column kernel
    from portfft_tpu import Direction, fastpath

    n, b = 256, 128
    desc = Descriptor(
        lengths=[n],
        number_of_transforms=b,
        forward_strides=[b],
        forward_distance=1,
        backward_strides=[b],
        backward_distance=1,
    )
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast[Direction.FORWARD]
    assert entry[0] == "bi_col" and entry[4] is not None
    x = oracle.gen_input(desc, 22)
    ref = oracle.reference_output(desc, x, F)
    flat = oracle.materialize(desc, x, F)
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * n * b, overrides={"cm": 1}
    )
    raw = np.ascontiguousarray(flat).view(np.float32)
    import jax.numpy as jnp

    got = np.asarray(fn(jnp.asarray(raw), plan._bank_arrays))
    out = got.view(np.complex64)
    oracle.verify(desc, out, ref, F, check_padding=False)
