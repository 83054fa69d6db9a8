"""Pallas kernels for interleaved-buffer I/O on TPU.

The framework's device representation of an interleaved complex buffer is a
flat float array of (re, im) pairs (the reference's ``Scalar*`` view).  The
compute core wants separate planes.  Lane-level pair interleaving has no
cheap XLA form on TPU (strided lane stores are unimplemented in Mosaic;
interior-padded ``lax.pad`` blows up compilation at size), but it *is*
expressible as two passes through the transpose unit plus sublane-strided
scratch stores, which Mosaic supports:

    interleave(a, b) per (128, 128) tile:
        s[0::2, :] = aᵀ ; s[1::2, :] = bᵀ      (s: (256, 128) scratch)
        out_tile = sᵀ                           # (128, 256), lanes r0 i0 r1 i1…

Deinterleave is the inverse.  These are the TPU analogue of the reference's
vectorized global↔local copy engine (common/transfers.hpp:334-443).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 128  # tile rows; transposes are (128, 128)
TILE = _ROWS * 128  # minimum plane-size granule (callers trailing-pad)


def _interleave_kernel(cols: int):
    def kernel(a_ref, b_ref, o_ref, s_ref):
        for j in range(cols // 128):
            s_ref[0::2, :] = a_ref[:, j * 128 : (j + 1) * 128].T
            s_ref[1::2, :] = b_ref[:, j * 128 : (j + 1) * 128].T
            o_ref[:, j * 256 : (j + 1) * 256] = s_ref[...].T

    return kernel


def _deinterleave_kernel(cols: int):
    def kernel(x_ref, a_ref, b_ref, s_ref):
        for j in range(cols // 128):
            s_ref[...] = x_ref[:, j * 256 : (j + 1) * 256].T
            a_ref[:, j * 128 : (j + 1) * 128] = s_ref[0::2, :].T
            b_ref[:, j * 128 : (j + 1) * 128] = s_ref[1::2, :].T

    return kernel


def _pick_cols(m: int) -> int:
    """Lanes per block: big enough to amortize grid overhead, small enough
    for VMEM (block bytes = 128·cols·4 × 4 buffers)."""
    for cols in (2048, 1024, 512, 256, 128):
        if m % (_ROWS * cols) == 0:
            return cols
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def interleave(a, b, interpret: bool = False):
    """Two (M,) planes -> (2M,) interleaved scalars.  M must be a multiple
    of 128·128 (callers pad); falls back handled by caller."""
    m = a.shape[0]
    cols = _pick_cols(m)
    rows = m // cols
    a2 = a.reshape(rows, cols)
    b2 = b.reshape(rows, cols)
    out = pl.pallas_call(
        _interleave_kernel(cols),
        grid=(rows // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 2,
        out_specs=pl.BlockSpec(
            (_ROWS, 2 * cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 2 * cols), a.dtype),
        scratch_shapes=[pltpu.VMEM((2 * _ROWS, _ROWS), a.dtype)],
        interpret=interpret,
    )(a2, b2)
    return out.reshape(2 * m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def deinterleave(raw, interpret: bool = False):
    """(2M,) interleaved scalars -> two (M,) planes."""
    m = raw.shape[0] // 2
    cols = _pick_cols(m)
    rows = m // cols
    x2 = raw.reshape(rows, 2 * cols)
    a, b = pl.pallas_call(
        _deinterleave_kernel(cols),
        grid=(rows // _ROWS,),
        in_specs=[
            pl.BlockSpec(
                (_ROWS, 2 * cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, cols), raw.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((2 * _ROWS, _ROWS), raw.dtype)],
        interpret=interpret,
    )(x2)
    return a.reshape(m), b.reshape(m)


def supported(m: int) -> bool:
    """True when the Pallas path handles planes of M elements directly."""
    return m % (_ROWS * 128) == 0
