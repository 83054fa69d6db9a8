"""Parity tests for the butterfly-factored GLOBAL engine ({"eng": 7},
ops/pallas_global_bf.py) — the round-4 answer to the ladder's measured
compute-bound lane-DFT matmuls (logs/r4d_probe_eng6.log).

Reference behaviour being matched: the global engine's factor chain
(/root/reference/src/portfft/dispatcher/global_dispatcher.hpp:312-412),
oracle = np.fft (§4 of SURVEY.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

import portfft_tpu as pfft
from portfft_tpu.config import DeviceConfig
from portfft_tpu.enums import Direction, Level
from portfft_tpu.ops import pallas_global_bf, xla_fft
from portfft_tpu.planner import Plan1D, plan_1d


def _mk_plan(g1: int, g2: int, cfg: DeviceConfig) -> Plan1D:
    sub1, sub2 = plan_1d(g1, cfg, 4), plan_1d(g2, cfg, 4)
    return Plan1D(
        n=g1 * g2, level=Level.GLOBAL, factors=[], sub=(sub1, sub2)
    )


def _run(g1, g2, sign, batch=2, scale=1.0, t1=0, seed=7, bf2=None,
         ov=False):
    cfg = DeviceConfig(vmem_bytes=256 * 2**20)
    plan = _mk_plan(g1, g2, cfg)
    assert pallas_global_bf.global_bf_supported(plan, cfg)
    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, sign, bank)
    arrs = bank.device_arrays()
    n = g1 * g2
    rng = np.random.default_rng(seed)
    raw = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    if ov:
        out = pallas_global_bf.global_bf_ov_raw_call(
            jnp.asarray(raw), batch, plan, sign, keys, arrs, cfg,
            scale=scale, t1_override=t1,
        )
    elif bf2 is not None:
        out = pallas_global_bf.global_bf2_raw_call(
            jnp.asarray(raw), batch, plan, sign, keys, arrs, cfg,
            scale=scale, t1_override=t1, **bf2,
        )
    else:
        out = pallas_global_bf.global_bf_raw_call(
            jnp.asarray(raw), batch, plan, sign, keys, arrs, cfg,
            scale=scale, t1_override=t1,
        )
    assert out is not None
    got = np.asarray(out).view(np.complex64).reshape(batch, n)
    x = raw.view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(x) if sign < 0 else np.fft.ifft(x) * n
    rel = np.linalg.norm(got - ref * scale) / np.linalg.norm(ref * scale)
    assert rel < 1e-4, (g1, g2, sign, rel)


@pytest.mark.parametrize(
    "g1,g2,sign,scale",
    [
        (256, 256, -1, 1.0),   # A1=A2=2 (the 65536 headline split)
        (512, 256, -1, 0.5),   # A1=4, folded scale (ladder 2^17)
        (256, 512, +1, 1.0),   # backward, A2=4
        (128, 256, -1, 1.0),   # degenerate A1=1 (plain matmul pass 1)
    ],
)
def test_bf_engine_parity(g1, g2, sign, scale):
    _run(g1, g2, sign, scale=scale)


def test_bf_engine_multi_tile_phase_a():
    # t1=128 at g2=512 -> nA=4 phase-A steps; A2=4 DIF layers
    _run(512, 512, -1, batch=1, t1=128)


def test_bf_engine_deep_slab_dft():
    # A2=8: three in-place DIF layers + bit-reversed output index map
    _run(256, 1024, -1, batch=1)


@pytest.mark.parametrize(
    "g1,g2,sign,scale,st3,ta",
    [
        (512, 256, -1, 1.0, 1, 0),   # ladder 2^17 split, tile epilogue
        (512, 256, -1, 0.5, 0, 0),   # per-slab stores + folded scale
        (256, 256, -1, 1.0, 1, 1),   # whole-transpose phase A
        (256, 512, +1, 1.0, 1, 0),   # backward, A2=4
        (512, 512, -1, 1.0, 1, 0),   # multi-tile nA=2 at t1=256
    ],
)
def test_bf2_engine_parity(g1, g2, sign, scale, st3, ta):
    """bf2 (relayout-lean) variant matches np.fft across store/transpose
    modes — same math as bf, restructured data movement only."""
    _run(g1, g2, sign, scale=scale, bf2={"st3": st3, "ta": ta})


def test_bf2_t1_128_multi_tile():
    _run(512, 512, -1, batch=1, t1=128, bf2={"st3": 1, "ta": 0})


def test_bf_engine_via_fastpath_override():
    """{"eng": 7} through the registered fast path on a committed plan."""
    from portfft_tpu import fastpath

    n, batch = 65536, 2
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch
    ).commit(use_pallas=True)
    assert pallas_global_bf.global_bf_supported(plan.plans[n], plan.config)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "global2"
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 7, "t1": 128},
    )
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    gc = got.view(np.complex64).reshape(batch, n)
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_bf_variants_enumerated():
    """The autotuner's variant space includes {"eng": 7} for bf-able
    splits, so the tuner can race it against eng 2/5/6."""
    from portfft_tpu import tuning

    plan = pfft.Descriptor(
        lengths=[65536], number_of_transforms=2
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    variants = tuning._variants_for_entry(plan, entry)
    assert any(v.get("eng") == 7 for v in variants)


@pytest.mark.parametrize(
    "g1,g2,sign,scale,t1",
    [
        (512, 256, -1, 1.0, 128),   # nA=2 = a2=2, balanced overlay
        (512, 256, -1, 0.5, 256),   # the measured 2^17 winner shape
        (256, 512, +1, 1.0, 128),   # backward, a2=4 > nA
        (128, 256, -1, 1.0, 256),   # degenerate A1=1
    ],
)
def test_bf_ov_engine_parity(g1, g2, sign, scale, t1):
    """Phase-overlay variant ({"eng": 7, "ov": 1}): phase A of batch i
    and phase B of batch i-1 share a grid step over parity-dual scratch
    (probe_ov measured 15.7 -> 12.9 ms at n=2^17)."""
    _run(g1, g2, sign, batch=3, scale=scale, t1=t1, ov=True)


def test_bf_ov_variant_enumerated():
    from portfft_tpu import tuning

    plan = pfft.Descriptor(
        lengths=[131072], number_of_transforms=2
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    variants = tuning._variants_for_entry(plan, entry)
    assert any(
        v.get("eng") == 7 and v.get("ov") for v in variants
    )
