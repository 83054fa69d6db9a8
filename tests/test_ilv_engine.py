"""Parity tests for the interleaved-native GLOBAL engine ({"eng": 8},
ops/pallas_global_ilv.py) — the round-5 answer to the measured relayout
bound of eng-7 (deinterleave/interleave transposes, docs/ROUND5.md).

Reference behaviour being matched: the global engine's factor chain
(/root/reference/src/portfft/dispatcher/global_dispatcher.hpp:312-412),
oracle = np.fft (§4 of SURVEY.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

import portfft_tpu as pfft
from portfft_tpu.config import DeviceConfig
from portfft_tpu.enums import Direction, Level
from portfft_tpu.ops import pallas_global_ilv, xla_fft
from portfft_tpu.planner import Plan1D, plan_1d


def _run(g1, g2, sign, batch=2, scale=1.0, t1=0, seed=7):
    cfg = DeviceConfig(vmem_bytes=256 * 2**20)
    sub1, sub2 = plan_1d(g1, cfg, 4), plan_1d(g2, cfg, 4)
    plan = Plan1D(
        n=g1 * g2, level=Level.GLOBAL, factors=[], sub=(sub1, sub2)
    )
    assert pallas_global_ilv.global_ilv_supported(plan, cfg)
    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, sign, bank)
    arrs = bank.device_arrays()
    n = g1 * g2
    rng = np.random.default_rng(seed)
    raw = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = pallas_global_ilv.global_ilv_raw_call(
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
        (128, 256, -1, 1.0),   # degenerate A1=1 (plain stacked matmul)
    ],
)
def test_ilv_engine_parity(g1, g2, sign, scale):
    _run(g1, g2, sign, scale=scale)


def test_ilv_multi_tile_phase_a():
    # t1=128 at g2=512 -> nA=4 phase-A steps; A2=4 DIF layers
    _run(512, 512, -1, batch=1, t1=128)


def test_ilv_deep_slab_dft():
    # A2=8: three in-place interleaved DIF layers + bit-reversed output
    _run(256, 1024, -1, batch=1)


def test_ilv_via_fastpath_override():
    """{"eng": 8} through the registered fast path on a committed plan."""
    from portfft_tpu import fastpath

    n, batch = 65536, 2
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "global2"
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 8, "t1": 128},
    )
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    gc = got.view(np.complex64).reshape(batch, n)
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_ilv_variants_enumerated():
    """The autotuner's variant space includes {"eng": 8} for ilv-able
    splits, so the tuner can race it against eng 2/5/6/7."""
    from portfft_tpu import tuning

    plan = pfft.Descriptor(
        lengths=[65536], number_of_transforms=2
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    variants = tuning._variants_for_entry(plan, entry)
    assert any(v.get("eng") == 8 for v in variants)


def test_sps_is_multiply_by_i():
    """_sps on interleaved lanes == multiplying the complex view by +i."""
    import jax
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (8, 256)).astype(np.float32)

    out = pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., pallas_global_ilv._sps(x_ref[...])
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(jnp.asarray(x))
    got = np.asarray(out).view(np.complex64)
    ref = 1j * x.view(np.complex64)
    assert np.allclose(got, ref), np.abs(got - ref).max()


@pytest.mark.parametrize(
    "g1,g2,sign",
    [
        (384, 384, -1),    # A=3 both (the 9·2^14 Bluestein conv split)
        (384, 768, +1),    # A1=3, A2=6, backward
        (256, 1536, -1),   # A2=12 (deep mixed-radix DIF)
        (1536, 384, -1),   # A1=12 phase-A butterfly
    ],
)
def test_ilv_mixed_radix_parity(g1, g2, sign):
    """eng-8's mixed-radix (2^a·3^b) slab butterflies cover 3·2^k and
    9·2^k sub-lengths that eng-7's power-of-two bf_factor cannot."""
    _run(g1, g2, sign)


def test_digit_rev_traced_matches_dif_perm():
    from portfft_tpu.ops.pallas_global_ilv import (
        dif_perm,
        digit_rev_traced,
    )

    for a in (1, 2, 3, 4, 6, 8, 12, 16):
        perm = dif_perm(a)
        assert sorted(perm) == list(range(a))
        got = [int(digit_rev_traced(np.int32(p), a)) for p in range(a)]
        assert got == perm, (a, got, perm)
