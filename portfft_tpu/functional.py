"""``numpy.fft``-style functional convenience API over the descriptor path.

JAX users expect ``fft(x, axis=-1)``, not a plan-and-execute object model;
these wrappers commit (and LRU-cache) the matching :class:`Descriptor` per
(shape, dtype, norm) and dispatch through the library's optimized compute
entry points — raw Pallas fast paths included.  A thin extension layer:
everything here is expressible with the core API (the reference exposes
only the descriptor model, committed_descriptor.hpp:58-310).

For embedding a transform inside your own ``jax.jit`` / ``lax.scan`` /
``jax.grad`` program, commit a plan once and use
:meth:`CommittedDescriptor.apply` instead — these wrappers call the
cached plan's ``compute_*`` entry, which manages its own jit.

Normalization (``norm``) follows numpy: ``None``/"backward" = forward
unscaled + inverse 1/n, "ortho" = 1/sqrt(n) both ways, "forward" = 1/n on
the forward transform.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from .descriptor import Descriptor
from .enums import Domain
from .exceptions import InvalidConfiguration

_NORMS = ("backward", "ortho", "forward")


def _canon_norm(norm: str | None) -> str:
    """None and "backward" are the same mode — canonicalize before the
    plan-cache key so they share one committed plan."""
    norm = norm or "backward"
    if norm not in _NORMS:
        raise InvalidConfiguration(f"norm must be one of {_NORMS}")
    return norm


def _scales(n: int, norm: str):
    if norm == "backward":
        return 1.0, 1.0 / n
    if norm == "ortho":
        s = 1.0 / math.sqrt(n)
        return s, s
    return 1.0 / n, 1.0


@functools.lru_cache(maxsize=128)
def _plan(lengths: tuple, batch: int, precision: str, domain: Domain,
          norm: str):
    n = math.prod(lengths)
    fs, bs = _scales(n, norm)
    return Descriptor(
        lengths=list(lengths),
        number_of_transforms=batch,
        precision=precision,
        domain=domain,
        forward_scale=fs,
        backward_scale=bs,
    ).commit()


def clear_plan_cache() -> None:
    """Drop every cached committed plan (frees their device tables)."""
    _plan.cache_clear()


def _precision_of(dtype) -> str:
    dt = np.dtype(dtype)
    if dt in (np.complex128, np.float64):
        return "float64"
    return "float32"


def _to_last(x, axis: int):
    """Move ``axis`` to the end (no-op for the default -1)."""
    if axis in (-1, x.ndim - 1):
        return x, False
    return jnp.moveaxis(x, axis, -1), True


def _sized(x, n: int | None):
    """numpy fft's ``n=``: truncate or zero-pad the last axis to n."""
    if n is None or n == x.shape[-1]:
        return x
    if n < x.shape[-1]:
        return x[..., :n]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
    return jnp.pad(x, pad)


def _c2c(x, k: int, forward: bool, norm):
    x = jnp.asarray(x)
    if x.ndim < k:
        raise InvalidConfiguration(
            f"input has {x.ndim} dims; transform needs {k}"
        )
    lengths = tuple(int(s) for s in x.shape[-k:])
    lead = x.shape[:-k]
    batch = int(np.prod(lead, dtype=np.int64)) if lead else 1
    plan = _plan(lengths, batch, _precision_of(x.dtype), Domain.COMPLEX,
                 _canon_norm(norm))
    cdt = jnp.complex128 if _precision_of(x.dtype) == "float64" else (
        jnp.complex64
    )
    flat = x.astype(cdt).reshape(-1)
    run = plan.compute_forward if forward else plan.compute_backward
    return run(flat).reshape(*lead, *lengths)


def fft(x, n=None, axis=-1, *, norm=None):
    """1D forward DFT (numpy signature: ``n`` pads/truncates, ``axis``
    selects the transform axis; batched over the other axes)."""
    x, moved = _to_last(jnp.asarray(x), axis)
    y = _c2c(_sized(x, n), 1, True, norm)
    return jnp.moveaxis(y, -1, axis) if moved else y


def ifft(x, n=None, axis=-1, *, norm=None):
    """1D inverse DFT (numpy normalization)."""
    x, moved = _to_last(jnp.asarray(x), axis)
    y = _c2c(_sized(x, n), 1, False, norm)
    return jnp.moveaxis(y, -1, axis) if moved else y


def fft2(x, *, norm=None):
    """2D forward DFT over the last two axes."""
    return _c2c(x, 2, True, norm)


def ifft2(x, *, norm=None):
    return _c2c(x, 2, False, norm)


def fftn(x, *, ndim: int | None = None, norm=None):
    """N-D forward DFT over the last ``ndim`` axes (default: all)."""
    return _c2c(x, ndim or jnp.asarray(x).ndim, True, norm)


def ifftn(x, *, ndim: int | None = None, norm=None):
    return _c2c(x, ndim or jnp.asarray(x).ndim, False, norm)


def rfft(x, n=None, axis=-1, *, norm=None):
    """1D real-to-complex DFT -> (..., n//2+1) along ``axis``."""
    x, moved = _to_last(jnp.asarray(x), axis)
    x = _sized(x, n)
    n = int(x.shape[-1])
    lead = x.shape[:-1]
    batch = int(np.prod(lead, dtype=np.int64)) if lead else 1
    plan = _plan((n,), batch, _precision_of(x.dtype), Domain.REAL,
                 _canon_norm(norm))
    y = plan.compute_forward(x.reshape(-1))
    y = _repair(plan, y).reshape(*lead, n // 2 + 1)
    return jnp.moveaxis(y, -1, axis) if moved else y


def _repair(plan, y):
    """Re-pair a raw interleaved float spectrum (jax-input convention)
    into complex through the layout-safe helper."""
    if jnp.iscomplexobj(y):
        return y
    import jax as _jax

    re, im = plan._deinterleave(y)
    return _jax.lax.complex(re, im)


def rfftn(x, *, ndim: int | None = None, norm=None):
    """N-D real-to-complex DFT over the last ``ndim`` axes (default all):
    R2C on the last axis (-> n//2+1 bins), C2C on the others — numpy
    rfftn semantics."""
    x = jnp.asarray(x)
    k = ndim or x.ndim
    lengths = tuple(int(s) for s in x.shape[-k:])
    lead = x.shape[:-k]
    batch = int(np.prod(lead, dtype=np.int64)) if lead else 1
    plan = _plan(lengths, batch, _precision_of(x.dtype), Domain.REAL,
                 _canon_norm(norm))
    y = _repair(plan, plan.compute_forward(x.reshape(-1)))
    return y.reshape(*lead, *lengths[:-1], lengths[-1] // 2 + 1)


def rfft2(x, *, norm=None):
    """2D real-to-complex DFT over the last two axes."""
    return rfftn(x, ndim=2, norm=norm)


def irfftn(x, s, *, norm=None):
    """N-D inverse of :func:`rfftn`; ``s`` is the full output lengths (the
    half spectrum does not determine the last axis's parity)."""
    x = jnp.asarray(x)
    lengths = tuple(int(v) for v in s)
    k = len(lengths)
    h1 = lengths[-1] // 2 + 1
    if tuple(x.shape[-k:]) != (*lengths[:-1], h1):
        raise InvalidConfiguration(
            f"half spectrum shape {x.shape[-k:]} does not match s={s} "
            f"(expected {(*lengths[:-1], h1)})"
        )
    lead = x.shape[:-k]
    batch = int(np.prod(lead, dtype=np.int64)) if lead else 1
    plan = _plan(lengths, batch, _precision_of(x.dtype), Domain.REAL,
                 _canon_norm(norm))
    y = plan.compute_backward(x.reshape(-1))
    return y.reshape(*lead, *lengths)


def irfft2(x, s, *, norm=None):
    return irfftn(x, s, norm=norm)


def irfft(x, n: int, axis=-1, *, norm=None):
    """1D complex-to-real inverse of :func:`rfft`; ``n`` is the output
    length (the half spectrum does not determine parity)."""
    x, moved = _to_last(jnp.asarray(x), axis)
    h1 = int(x.shape[-1])
    if h1 != n // 2 + 1:
        raise InvalidConfiguration(
            f"half spectrum has {h1} bins; expected {n // 2 + 1} for n={n}"
        )
    lead = x.shape[:-1]
    batch = int(np.prod(lead, dtype=np.int64)) if lead else 1
    plan = _plan((n,), batch, _precision_of(x.dtype), Domain.REAL,
                 _canon_norm(norm))
    y = plan.compute_backward(x.reshape(-1))
    y = y.reshape(*lead, n)
    return jnp.moveaxis(y, -1, axis) if moved else y
