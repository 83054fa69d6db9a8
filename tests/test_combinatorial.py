"""Combinatorial parity sweep.

The reference instantiates every FFT test across placement × layout
generators × memory type × precision (instantiate_fft_tests.hpp:375-403,
valid_placement_layouts fft_test_utils.hpp:37-85).  This sweep covers the
same parameter cross for a representative size: placement × storage ×
{packed, batch-interleaved, strided} per domain × direction.
"""

import itertools

import pytest

from fft_test_utils import run_test
from portfft_tpu import ComplexStorage, Direction, Placement

N = 64
BATCH = 4

LAYOUTS = {
    "packed": dict(strides=[1], distance=N),
    "bi": dict(strides=[BATCH], distance=1),
    "strided": dict(strides=[3], distance=3 * N),
}


def _case_id(p):
    placement, storage, lin, lout, direction = p
    return (
        f"{placement.value}-{storage.value.split('_')[0]}-{lin}-{lout}-"
        f"{direction.value}"
    )


CASES = [
    p
    for p in itertools.product(
        [Placement.OUT_OF_PLACE, Placement.IN_PLACE],
        [ComplexStorage.INTERLEAVED_COMPLEX, ComplexStorage.SPLIT_COMPLEX],
        LAYOUTS,
        LAYOUTS,
        [Direction.FORWARD, Direction.BACKWARD],
    )
    # in-place requires identical strides/distance in both domains
    # (validation parity with the reference)
    if not (p[0] == Placement.IN_PLACE and p[2] != p[3])
]


@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_combination(case):
    placement, storage, lin, lout, direction = case
    fwd_layout = lin if direction == Direction.FORWARD else lout
    bwd_layout = lout if direction == Direction.FORWARD else lin
    run_test(
        direction=direction,
        lengths=[N],
        number_of_transforms=BATCH,
        placement=placement,
        complex_storage=storage,
        forward_strides=LAYOUTS[fwd_layout]["strides"],
        forward_distance=LAYOUTS[fwd_layout]["distance"],
        backward_strides=LAYOUTS[bwd_layout]["strides"],
        backward_distance=LAYOUTS[bwd_layout]["distance"],
    )
