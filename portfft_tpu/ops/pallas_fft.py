"""Pallas TPU kernels for DIRECT and FUSED plan leaves.

Phase-2 module: `leaf_dispatch` intercepts plan leaves from the executor
(ops/xla_fft.py exec_plan) and runs them as hand-written Pallas kernels —
the analogue of the reference's specialized device kernels
(workitem_dispatcher.hpp, subgroup_dispatcher.hpp, workgroup_dispatcher.hpp).

Currently returns None for every leaf (XLA fallback); kernels land next.
"""

from __future__ import annotations


def leaf_dispatch(xr, xi, plan, sign, *, bank_keys, config):
    """Return (yr, yi) if a Pallas kernel covers this leaf, else None."""
    return None
