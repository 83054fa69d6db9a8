"""NumPy verification oracle.

In-process port of the reference's subprocess oracle
(test/common/reference_data_wrangler.hpp:107-371): seeded random input,
``np.fft.fftn`` reference output with host-side scale handling, strided
buffer materialization with a padding sentinel in every untouched location,
and three-part verification — (1) padding byte-identical (catches
out-of-bounds writes), (2) per-batch relative L2 error, (3) per-element
absolute-or-relative tolerance ``2·eps·N·log2(N)``
(test/common/fft_test_utils.hpp:461-464).
"""

from __future__ import annotations

import math

import numpy as np

from portfft_tpu.enums import Direction

SENTINEL = -5.0  # reference reference_data_wrangler.hpp:52-90 padding value


def tolerance(descriptor) -> float:
    """2 · eps · N · log2(N), from fft_test_utils.hpp:461-464."""
    n = descriptor.get_flattened_length()
    eps = np.finfo(descriptor.precision).eps
    return 2.0 * eps * n * max(math.log2(n), 1.0)


def gen_input(descriptor, seed: int = 0) -> np.ndarray:
    """Seeded random complex input, canonical (batch, *lengths) layout.

    The reference uses np.random with SFC64(0)
    (reference_data_wrangler.hpp:117-197); exact bitstream parity is not
    needed — any seeded distribution exercises the same code."""
    rng = np.random.Generator(np.random.SFC64(seed))
    shape = (descriptor.number_of_transforms, *descriptor.lengths)
    re = rng.uniform(-1.0, 1.0, shape)
    im = rng.uniform(-1.0, 1.0, shape)
    ctype = np.complex64 if descriptor.precision == np.float32 else np.complex128
    return (re + 1j * im).astype(ctype)


def reference_output(descriptor, x: np.ndarray, direction: Direction) -> np.ndarray:
    """np.fft.fftn/ifftn over the transform axes with the descriptor's scale
    (scales applied host-side as in reference_data_wrangler.hpp:200-210)."""
    axes = tuple(range(1, 1 + len(descriptor.lengths)))
    if direction == Direction.FORWARD:
        ref = np.fft.fftn(x.astype(np.complex128), axes=axes)
        ref *= descriptor.forward_scale
    else:
        n = descriptor.get_flattened_length()
        ref = np.fft.ifftn(x.astype(np.complex128), axes=axes) * n
        ref *= descriptor.backward_scale
    return ref


def materialize(descriptor, canonical: np.ndarray, direction: Direction) -> np.ndarray:
    """Scatter canonical (batch, *lengths) data into a flat strided buffer,
    padding every untouched element with the sentinel
    (reference ``reshape_to_desc``, reference_data_wrangler.hpp:52-90)."""
    count = descriptor.get_input_count(direction)
    buf = np.full(count, SENTINEL + SENTINEL * 1j, dtype=canonical.dtype)
    idx = _indices(descriptor, direction)
    buf[idx] = canonical
    return buf


def extract(descriptor, flat: np.ndarray, direction: Direction) -> np.ndarray:
    """Gather the canonical view back out of a flat strided buffer (output
    domain of ``direction`` = strides of inv(direction))."""
    idx = _indices(descriptor, direction)
    return np.asarray(flat)[idx]


def _indices(descriptor, direction: Direction) -> np.ndarray:
    d = descriptor
    strides = d.get_strides(direction)
    batch = d.number_of_transforms
    idx = d.get_offset(direction) + d.get_distance(direction) * np.arange(
        batch
    ).reshape((batch,) + (1,) * len(d.lengths))
    for axis, (length, stride) in enumerate(zip(d.lengths, strides)):
        shape = [1] * (len(d.lengths) + 1)
        shape[axis + 1] = length
        idx = idx + stride * np.arange(length).reshape(shape)
    return idx


def verify(
    descriptor,
    out_flat: np.ndarray,
    ref_canonical: np.ndarray,
    direction: Direction,
    check_padding: bool = True,
) -> None:
    """Three-part check of reference verify_dft
    (reference_data_wrangler.hpp:272-371)."""
    from portfft_tpu.enums import inv

    out_flat = np.asarray(out_flat)
    out_dir = inv(direction)
    idx = _indices(descriptor, out_dir)

    if check_padding:
        mask = np.ones(out_flat.shape[0], dtype=bool)
        mask[idx.reshape(-1)] = False
        pad_vals = out_flat[mask]
        expected = SENTINEL + SENTINEL * 1j
        assert np.all(pad_vals == expected), (
            f"{np.count_nonzero(pad_vals != expected)} padding elements "
            "were overwritten (out-of-bounds write)"
        )

    got = out_flat[idx].astype(np.complex128)
    ref = ref_canonical.astype(np.complex128)
    tol = tolerance(descriptor)

    # Per-batch relative L2 (logged in the reference; assert sane here).
    flat_got = got.reshape(got.shape[0], -1)
    flat_ref = ref.reshape(ref.shape[0], -1)
    l2 = np.linalg.norm(flat_got - flat_ref, axis=1) / np.maximum(
        np.linalg.norm(flat_ref, axis=1), 1e-30
    )

    # Per-element absolute OR relative within tolerance
    # (reference_data_wrangler.hpp:355-370).
    diff = np.abs(flat_got - flat_ref)
    ok = (diff <= tol) | (diff <= tol * np.abs(flat_ref))
    if not np.all(ok):
        bad = np.argwhere(~ok)
        b, e = bad[0]
        raise AssertionError(
            f"{len(bad)} elements exceed tol={tol:.3e}; first at batch {b} "
            f"elem {e}: got {flat_got[b, e]}, ref {flat_ref[b, e]}, "
            f"diff {diff[b, e]:.3e}; max per-batch relative L2 {l2.max():.3e}"
        )
