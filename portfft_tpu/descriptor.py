"""FFT problem description — the user-facing entry point.

Semantics-parity port of the reference ``descriptor`` struct
(/root/reference/src/portfft/descriptor.hpp:44-271): lengths, per-direction
scales / strides / distances / offsets, number_of_transforms, complex storage
and placement, plus the buffer-count math (descriptor.hpp:262-270).  The
C++ ``descriptor<Scalar, Domain>`` template parameters become the
``precision`` and ``domain`` fields.

``commit()`` validates the problem and returns a :class:`CommittedDescriptor`
(see committed.py) holding the plan, precomputed twiddle device arrays and
jitted executors — the JAX analogue of the reference's commit-time JIT build.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .enums import ComplexStorage, Direction, Domain, Placement
from .exceptions import InvalidConfiguration
from .utils.layout import default_strides, flattened_length

_PRECISION_ALIASES = {
    "fp32": np.float32,
    "fp64": np.float64,
    "float32": np.float32,
    "float64": np.float64,
    "single": np.float32,
    "double": np.float64,
}


def _canonical_precision(precision) -> np.dtype:
    if isinstance(precision, str):
        key = precision.lower()
        if key not in _PRECISION_ALIASES:
            raise ValueError(f"Unknown precision {precision!r}")
        return np.dtype(_PRECISION_ALIASES[key])
    dt = np.dtype(precision)
    if dt not in (np.dtype(np.float32), np.dtype(np.float64)):
        raise ValueError(f"precision must be fp32 or fp64, got {dt}")
    return dt


@dataclasses.dataclass
class Descriptor:
    """FFT problem parameters (reference descriptor.hpp:44-129).

    Attributes
    ----------
    lengths:
        Size of each transform dimension, most-significant first (contiguous
        dimension last).  N-D transforms supported.
    precision:
        Scalar type used for computation: ``fp32`` (default) or ``fp64``.
    domain:
        ``Domain.COMPLEX`` (C2C).  ``Domain.REAL`` is validated-unsupported,
        matching the reference (descriptor_validation.hpp:268-270).
    forward_scale / backward_scale:
        Scaling factor applied to the output of the respective direction.
        Note a forward+backward round trip with both scales 1 yields data
        scaled by the product of the lengths (descriptor.hpp:61-69).
    number_of_transforms:
        Batch count per compute call.
    complex_storage:
        INTERLEAVED_COMPLEX (AoS / native complex arrays) or SPLIT_COMPLEX
        (separate re / im buffers).
    placement:
        IN_PLACE or OUT_OF_PLACE.  In the functional JAX API, IN_PLACE means
        the compute functions take a single buffer and donate it to the
        compiled computation (buffer reuse on device).
    forward_strides / backward_strides:
        Element strides per dimension in each domain; element ``[i1..id]`` of
        batch ``b`` lives at ``offset + distance*b + sum(strides[k]*ik)``
        (descriptor.hpp:90-105).  Default: packed row-major.
    forward_distance / backward_distance:
        Elements between consecutive batches (default: product of lengths).
    forward_offset / backward_offset:
        Elements before the first used element of the buffer.
    """

    lengths: Sequence[int]
    precision: object = np.float32
    domain: Domain = Domain.COMPLEX
    forward_scale: float = 1.0
    backward_scale: float = 1.0
    number_of_transforms: int = 1
    complex_storage: ComplexStorage = ComplexStorage.INTERLEAVED_COMPLEX
    placement: Placement = Placement.OUT_OF_PLACE
    forward_strides: Optional[Sequence[int]] = None
    backward_strides: Optional[Sequence[int]] = None
    forward_distance: Optional[int] = None
    backward_distance: Optional[int] = None
    forward_offset: int = 0
    backward_offset: int = 0

    def __post_init__(self):
        self.lengths = [int(x) for x in self.lengths]
        if not self.lengths:
            # checked again in commit-time validation, but domain_lengths
            # below reads lengths[-1] for REAL — raise the typed error
            # instead of an IndexError
            raise InvalidConfiguration(
                "Invalid lengths, must have at least 1 dimension"
            )
        self.precision = _canonical_precision(self.precision)
        if self.forward_strides is None:
            self.forward_strides = default_strides(self.lengths)
        else:
            self.forward_strides = [int(s) for s in self.forward_strides]
        bwd_lengths = self.domain_lengths(Direction.BACKWARD)
        if self.backward_strides is None:
            self.backward_strides = default_strides(bwd_lengths)
        else:
            self.backward_strides = [int(s) for s in self.backward_strides]
        if self.forward_distance is None:
            if (
                self.domain == Domain.REAL
                and self.placement == Placement.IN_PLACE
                and len(self.lengths) == 1
            ):
                # FFTW in-place r2c layout: real rows padded to 2·(n/2+1)
                # so the half spectrum fits in the same buffer.
                self.forward_distance = 2 * (self.lengths[-1] // 2 + 1)
            else:
                self.forward_distance = flattened_length(self.lengths)
        if self.backward_distance is None:
            self.backward_distance = flattened_length(bwd_lengths)
        self.forward_distance = int(self.forward_distance)
        self.backward_distance = int(self.backward_distance)
        self.forward_offset = int(self.forward_offset)
        self.backward_offset = int(self.backward_offset)
        self.number_of_transforms = int(self.number_of_transforms)

    # -- accessors (reference descriptor.hpp:190-251) ------------------------

    def get_flattened_length(self) -> int:
        """Flattened single-batch length, ignoring strides
        (descriptor.hpp:161-163)."""
        return flattened_length(self.lengths)

    def domain_lengths(self, direction: Direction) -> list[int]:
        """Logical element grid of the given domain's buffers.

        COMPLEX: ``lengths`` in both domains.  REAL (extension — the
        reference validates this unsupported): the forward domain holds real
        elements of shape ``lengths``; the backward domain holds the
        conjugate-even half spectrum, last dimension ``n//2 + 1`` complex
        elements (FFTW/NumPy rfft convention)."""
        if self.domain == Domain.REAL and direction == Direction.BACKWARD:
            return list(self.lengths[:-1]) + [self.lengths[-1] // 2 + 1]
        return list(self.lengths)

    def get_strides(self, direction: Direction) -> list[int]:
        return list(
            self.forward_strides
            if direction == Direction.FORWARD
            else self.backward_strides
        )

    def get_distance(self, direction: Direction) -> int:
        return (
            self.forward_distance
            if direction == Direction.FORWARD
            else self.backward_distance
        )

    def get_offset(self, direction: Direction) -> int:
        return (
            self.forward_offset
            if direction == Direction.FORWARD
            else self.backward_offset
        )

    def get_scale(self, direction: Direction) -> float:
        return (
            self.forward_scale
            if direction == Direction.FORWARD
            else self.backward_scale
        )

    # -- buffer-count math (reference descriptor.hpp:166-270) ---------------

    def _buffer_count(
        self, lengths, strides: Sequence[int], distance: int, offset: int
    ) -> int:
        """Number of elements needed for a buffer with these strides
        (descriptor.hpp:262-270): offset + last accessed index + 1."""
        last = (self.number_of_transforms - 1) * distance
        for length, stride in zip(lengths, strides):
            last += (length - 1) * stride
        return offset + last + 1

    def get_input_count(self, direction: Direction) -> int:
        """Required element count of the input buffer for ``direction``
        (descriptor.hpp:172-174).  Complex elements for complex-domain
        buffers, real elements for the real domain of an R2C transform.

        In-place REAL shares one padded buffer between both domains (the
        FFTW layout), so the count covers whichever domain needs more —
        the half spectrum fills every padded row completely, two real
        elements past the last real sample of the last row."""
        from .enums import Placement, inv

        count = self._buffer_count(
            self.domain_lengths(direction),
            self.get_strides(direction),
            self.get_distance(direction),
            self.get_offset(direction),
        )
        if self.domain == Domain.REAL and self.placement == Placement.IN_PLACE:
            other = self._buffer_count(
                self.domain_lengths(inv(direction)),
                self.get_strides(inv(direction)),
                self.get_distance(inv(direction)),
                self.get_offset(inv(direction)),
            )
            if direction == Direction.FORWARD:
                return max(count, 2 * other)  # real units
            return max(count, (other + 1) // 2)  # complex units
        return count

    def get_output_count(self, direction: Direction) -> int:
        """Required element count of the output buffer for ``direction``
        (descriptor.hpp:183)."""
        from .enums import inv

        return self.get_input_count(inv(direction))

    # -- serialization (plan-reuse / checkpoint analogue, SURVEY §5.4) -------

    def to_dict(self) -> dict:
        """JSON-serializable problem description.  Committing an identical
        descriptor in a later process reproduces the same plan; pair with
        :func:`portfft_tpu.config.enable_persistent_cache` to also reuse the
        XLA executables across processes."""
        return {
            "lengths": list(self.lengths),
            "precision": str(np.dtype(self.precision)),
            "domain": self.domain.value,
            "forward_scale": float(self.forward_scale),
            "backward_scale": float(self.backward_scale),
            "number_of_transforms": self.number_of_transforms,
            "complex_storage": self.complex_storage.value,
            "placement": self.placement.value,
            "forward_strides": list(self.forward_strides),
            "backward_strides": list(self.backward_strides),
            "forward_distance": self.forward_distance,
            "backward_distance": self.backward_distance,
            "forward_offset": self.forward_offset,
            "backward_offset": self.backward_offset,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Descriptor":
        d = dict(d)
        d["domain"] = Domain(d["domain"])
        d["complex_storage"] = ComplexStorage(d["complex_storage"])
        d["placement"] = Placement(d["placement"])
        return cls(**d)

    # -- commit --------------------------------------------------------------

    def commit(self, device=None, mesh=None, **options):
        """Validate and plan the transform; returns a CommittedDescriptor.

        The JAX analogue of reference descriptor.hpp:152-156: validation, then
        plan construction (factorization + level selection), twiddle
        precomputation onto ``device``, and jit-specialization of the compute
        callables.

        ``mesh`` (a ``jax.sharding.Mesh``) commits a DISTRIBUTED plan
        instead (parallel.sharded.DistributedCommitted): the batch dimension
        shards over ``batch_axis`` (default "dp"), and passing
        ``seq_axis=...`` additionally shards the transform dimension via the
        all_to_all four-step.  Capability beyond the reference (single
        device, SURVEY.md §5.8).
        """
        from .validation import validate_descriptor

        validate_descriptor(self)
        if mesh is not None:
            from .parallel.sharded import DistributedCommitted

            return DistributedCommitted(
                dataclasses.replace(self), mesh, device=device, **options
            )
        from .committed import CommittedDescriptor

        return CommittedDescriptor(dataclasses.replace(self), device=device, **options)
