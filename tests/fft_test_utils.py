"""Shared end-to-end test driver (reference test/common/fft_test_utils.hpp
``run_test``/``check_fft``, :271-437): build the descriptor, generate seeded
input, commit, compute, verify against the NumPy oracle with padding
sentinels."""

from __future__ import annotations

import numpy as np

import oracle
from portfft_tpu import ComplexStorage, Descriptor, Direction, Placement


def run_test(
    direction: Direction = Direction.FORWARD,
    seed: int = 0,
    check_padding: bool = True,
    use_out_buffer: bool = None,
    **desc_kwargs,
) -> None:
    desc = Descriptor(**desc_kwargs)
    plan = desc.commit()

    x = oracle.gen_input(desc, seed)
    ref = oracle.reference_output(desc, x, direction)
    flat_in = oracle.materialize(desc, x, direction)

    split = desc.complex_storage == ComplexStorage.SPLIT_COMPLEX
    in_place = desc.placement == Placement.IN_PLACE
    compute = (
        plan.compute_forward
        if direction == Direction.FORWARD
        else plan.compute_backward
    )

    
    out_count = desc.get_output_count(direction)
    # An output buffer pre-filled with sentinels lets us detect stray writes
    # (reference padding-untouched check).
    if use_out_buffer is None:
        use_out_buffer = check_padding and not in_place

    if split:
        re_in = np.ascontiguousarray(flat_in.real)
        im_in = np.ascontiguousarray(flat_in.imag)
        if in_place:
            out_re, out_im = compute(re_in, im_in)
            out = np.asarray(out_re) + 1j * np.asarray(out_im)
        elif use_out_buffer:
            o_re = np.full(out_count, oracle.SENTINEL, dtype=desc.precision)
            o_im = np.full(out_count, oracle.SENTINEL, dtype=desc.precision)
            out_re, out_im = compute(re_in, im_in, out=(o_re, o_im))
            out = np.asarray(out_re) + 1j * np.asarray(out_im)
        else:
            out_re, out_im = compute(re_in, im_in)
            out = np.asarray(out_re) + 1j * np.asarray(out_im)
            check_padding = False
    else:
        if in_place:
            out = np.asarray(compute(flat_in))
        elif use_out_buffer:
            obuf = np.full(
                out_count,
                oracle.SENTINEL + 1j * oracle.SENTINEL,
                dtype=flat_in.dtype,
            )
            out = np.asarray(compute(flat_in, out=obuf))
        else:
            out = np.asarray(compute(flat_in))
            check_padding = False

    oracle.verify(desc, out, ref, direction, check_padding=check_padding)
