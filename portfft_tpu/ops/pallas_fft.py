"""Pallas TPU kernels for DIRECT and FUSED plan leaves.

The TPU analogue of the reference's specialized per-level device kernels
(workitem_dispatcher.hpp:99-350, subgroup_dispatcher.hpp:85-664,
workgroup_dispatcher.hpp:94-281): one Pallas kernel runs the *entire*
multi-factor Stockham chain of a leaf plan inside VMEM, so each element is
read from HBM once and written once, with all factor matmuls (MXU), twiddle
multiplies (VPU) and inter-stage transposes staying on-chip — where the
pure-XLA chain would materialize every stage in HBM.

The kernel body executes the same recursion as the XLA executor
(ops/xla_fft.py exec_chain_xla) on in-VMEM values; the factor DFT matrices
and inter-factor twiddles enter as pallas inputs whose grid index is
constant, so they are DMA'd into VMEM once and stay resident across the
batch grid (the analogue of the reference's twiddle USM buffers).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import Level
from ..planner import Plan1D, stage_shapes
from . import xla_fft


def _leaf_table_keys(plan: Plan1D, sign: int, bank_keys: dict) -> list[str]:
    """Ordered bank array names the chain of this leaf needs."""
    names = []
    seen = set()
    for f, m in stage_shapes(plan.factors):
        wkey = bank_keys[("W", f, sign)]
        for suffix in ("r", "i"):
            if wkey + suffix not in seen:
                seen.add(wkey + suffix)
                names.append(wkey + suffix)
        if m > 1:
            tkey = bank_keys[("T", f, m, sign)]
            for suffix in ("r", "i"):
                names.append(tkey + suffix)
                seen.add(tkey + suffix)
    return names


def _chain_kernel(factors, sign, bank_keys, table_names, n_tables, precision):
    """Build the kernel body: whole factor chain on one (bt, n) block."""

    def kernel(xr_ref, xi_ref, *rest):
        table_refs = rest[:n_tables]
        or_ref, oi_ref = rest[n_tables], rest[n_tables + 1]
        bank = {
            name: ref[...] for name, ref in zip(table_names, table_refs)
        }
        yr, yi = xla_fft.exec_chain_xla(
            xr_ref[...], xi_ref[...], factors, sign, bank_keys, bank, precision
        )
        or_ref[...] = yr
        oi_ref[...] = yi

    return kernel


@functools.lru_cache(maxsize=None)
def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def fused_chain(
    xr, xi, plan: Plan1D, sign: int, bank_keys, bank, config, precision=None
):
    """Run a DIRECT/FUSED leaf as one Pallas kernel over the batch grid.

    xr/xi: (..., n) planes.  Returns transformed planes of the same shape.
    """
    n = plan.n
    lead = xr.shape[:-1]
    b = math.prod(lead) if lead else 1
    xr2 = xr.reshape(b, n)
    xi2 = xi.reshape(b, n)

    bt = min(plan.batch_tile, config.batch_tile)
    # Shrink the tile rather than padding when the batch is small.
    while bt > config.sublane and b % bt:
        bt //= 2
    pad = (-b) % bt
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    bp = b + pad

    table_names = _leaf_table_keys(plan, sign, bank_keys)
    tables = [bank[name] for name in table_names]

    data_spec = pl.BlockSpec(
        (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_specs = [
        pl.BlockSpec(
            t.shape, (lambda *_: (0,) * t.ndim), memory_space=pltpu.VMEM
        )
        for t in tables
    ]

    kernel = _chain_kernel(
        tuple(plan.factors),
        sign,
        bank_keys,
        tuple(table_names),
        len(tables),
        xla_fft.resolve_precision(precision),
    )

    flops = 8 * bp * n * sum(plan.factors)
    bytes_accessed = 2 * 2 * bp * n * xr2.dtype.itemsize

    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[data_spec, data_spec] + table_specs,
        out_specs=[data_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((bp, n), xr2.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=_interpret_mode(),
    )(xr2, xi2, *tables)

    if pad:
        yr = yr[:b]
        yi = yi[:b]
    return yr.reshape(*lead, n), yi.reshape(*lead, n)


def leaf_dispatch(
    xr, xi, plan, sign, bank, *, bank_keys, config, precision=None
):
    """Executor hook: run DIRECT/FUSED leaves as Pallas kernels.

    Returns None to fall back to the XLA chain (e.g. fp64, which has no
    Mosaic support)."""
    if plan.level not in (Level.DIRECT, Level.FUSED):
        return None
    if xr.dtype != jnp.float32:
        return None
    return fused_chain(
        xr, xi, plan, sign, bank_keys, bank, config, precision
    )
