"""Pure-host descriptor math tests (reference test/unit_test/descriptor.cpp)."""

import numpy as np
import pytest

from portfft_tpu import Descriptor, Direction
from portfft_tpu.utils.layout import default_strides


def test_flattened_length():
    assert Descriptor(lengths=[4]).get_flattened_length() == 4
    assert Descriptor(lengths=[2, 3, 4]).get_flattened_length() == 24


def test_default_strides():
    assert default_strides([8]) == [1]
    assert default_strides([2, 3, 4]) == [12, 4, 1]
    d = Descriptor(lengths=[2, 3, 4])
    assert d.forward_strides == [12, 4, 1]
    assert d.backward_strides == [12, 4, 1]
    assert d.forward_distance == 24
    assert d.backward_distance == 24


def test_direction_accessors():
    d = Descriptor(
        lengths=[8],
        forward_scale=2.0,
        backward_scale=-1.0,
        forward_offset=3,
        backward_offset=7,
        forward_strides=[2],
        backward_strides=[5],
        forward_distance=16,
        backward_distance=40,
    )
    assert d.get_scale(Direction.FORWARD) == 2.0
    assert d.get_scale(Direction.BACKWARD) == -1.0
    assert d.get_offset(Direction.FORWARD) == 3
    assert d.get_offset(Direction.BACKWARD) == 7
    assert d.get_strides(Direction.FORWARD) == [2]
    assert d.get_strides(Direction.BACKWARD) == [5]
    assert d.get_distance(Direction.FORWARD) == 16
    assert d.get_distance(Direction.BACKWARD) == 40


def test_buffer_count_packed():
    d = Descriptor(lengths=[8], number_of_transforms=3)
    assert d.get_input_count(Direction.FORWARD) == 24
    assert d.get_output_count(Direction.FORWARD) == 24


def test_buffer_count_exotic_strides():
    # descriptor.cpp:77-109 exercises the last-accessed-element formula with
    # non-default strides: count = offset + (batch-1)*distance
    #                              + sum((len-1)*stride) + 1.
    d = Descriptor(
        lengths=[4],
        number_of_transforms=3,
        forward_strides=[5],
        forward_distance=2,
        forward_offset=10,
    )
    assert d.get_input_count(Direction.FORWARD) == 10 + 2 * 2 + 3 * 5 + 1


def test_buffer_count_multidim():
    d = Descriptor(lengths=[2, 3], number_of_transforms=2)
    # packed: offset 0 + 1*6 + 1*3 + 2*1 + 1 = 12
    assert d.get_input_count(Direction.FORWARD) == 12


def test_precision_aliases():
    assert Descriptor(lengths=[4], precision="fp32").precision == np.float32
    assert Descriptor(lengths=[4], precision="double").precision == np.float64
    assert Descriptor(lengths=[4], precision=np.float64).precision == np.float64
    with pytest.raises(ValueError):
        Descriptor(lengths=[4], precision="int8")
