"""Interpret-mode tests for the v3 interleaved-stage kernels.

Covers the round-3 performance kernels at the unit level (the kernels the
raw fast path prefers on TPU): ``fused2_raw_v3_call`` (ops/pallas_fft.py)
and the two-pass v3 engine (ops/pallas_global3.py).  Reference test
counterpart: the level-keyed suites of instantiate_fft_tests.hpp keyed at
WORKGroup/GLOBAL sizes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import portfft_tpu as pfft
from portfft_tpu.config import DeviceConfig
from portfft_tpu.enums import Direction, Level
from portfft_tpu.ops import pallas_fft, pallas_global3 as g3, xla_fft
from portfft_tpu.planner import plan_1d

CFG = DeviceConfig()


def _v3_tables(a, sign, scale=1.0):
    bank = xla_fft.TwiddleBank(np.float32)
    wa = bank.dft(a, sign)
    e = bank.twiddle_expanded(a, 128, sign)
    g = pallas_fft.fold_factor(a)
    vs = bank.vmat_split(128, sign, g, scale)
    arrs = bank.device_arrays()
    return [arrs[wa + "r"], arrs[wa + "i"], arrs[e + "r"], arrs[e + "i"],
            arrs[vs + "r"], arrs[vs + "i"]]


@pytest.mark.parametrize(
    "n,batch,sign,scale",
    [
        (1024, 16, -1, 1.0),   # a=8, fold g=8
        (4096, 8, -1, 1.0),    # a=32, g=2
        (4096, 8, +1, 2.0),    # backward + scale folded into Vs
        (16384, 4, -1, 1.0),   # a=128, g=1
        (32768, 2, -1, 0.5),   # a=256, g=1 (2a > 128)
    ],
)
def test_fused2_v3_kernel(n, batch, sign, scale):
    a = n // 128
    plan = plan_1d(n, CFG, 4)
    assert plan.factors == [a, 128]
    tabs = _v3_tables(a, sign, scale)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = pallas_fft.fused2_raw_v3_call(
        jnp.asarray(x), batch, plan, tabs, CFG, "highest"
    )
    assert out is not None
    got = np.asarray(out).view(np.complex64).reshape(batch, n)
    xc = x.view(np.complex64).reshape(batch, n)
    ref = (np.fft.fft(xc) if sign < 0 else np.fft.ifft(xc) * n) * scale
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-6, rel


@pytest.mark.parametrize(
    "n,batch,sign,scale",
    [
        (65536, 2, -1, 1.0),    # 256 x 256, both dense
        (65536, 1, +1, 0.25),   # backward + scale
        (131072, 2, -1, 1.0),   # 512 x 256 dense
        (524288, 1, -1, 1.0),   # 2048 = 16·128 fused pass-1
    ],
)
def test_global3_engine(n, batch, sign, scale):
    plan = plan_1d(n, CFG, 4)
    assert plan.level == Level.GLOBAL
    assert g3.global3_supported(plan, CFG)
    g1p, g2p = plan.sub
    bank = xla_fft.TwiddleBank(np.float32)
    t1 = g3._pick_t1(
        g2p.n, g1p.n, int(CFG.vmem_bytes * 3 / 4),
        g1p.level != Level.DIRECT,
    )
    names1 = g3.p1_table_names(g1p, n, t1, sign, bank)
    vs = bank.vmat_split(g2p.n, sign, 1, scale)
    arrs = bank.device_arrays()
    fn = g3.build_call(plan, sign, names1, vs, CFG, "highest", t1=t1)
    assert fn is not None
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = fn(jnp.asarray(x), batch, arrs)
    got = np.asarray(out).view(np.complex64).reshape(batch, n)
    xc = x.view(np.complex64).reshape(batch, n)
    ref = (np.fft.fft(xc) if sign < 0 else np.fft.ifft(xc) * n) * scale
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-6, rel


def test_global3_via_fastpath_override():
    """End-to-end through the public API with the v3 engine forced via a
    tuning override (the dispatch path TPU sessions take by default)."""
    n, batch = 65536, 2
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "global2"
    assert entry[4] is not None  # g3info registered
    from portfft_tpu import fastpath

    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 3, "t1": 256, "t2": 256},
    )
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(got.view(np.complex64).reshape(batch, n) - ref)
    rel /= np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_fused2_v3_via_fastpath_override():
    from portfft_tpu import fastpath

    n, batch = 4096, 8
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "fused2"
    assert len(entry[1]) == 4  # v1/v2/v3/mm table-name sets
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 3, "bt": 8},
    )
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(got.view(np.complex64).reshape(batch, n) - ref)
    rel /= np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_digit_split():
    assert g3.digit_split(256) == (16, 16)
    assert g3.digit_split(512) == (16, 32)
    assert g3.digit_split(128) == (8, 16)
    ga, gb = g3.digit_split(384)
    assert ga * gb == 384 and ga <= gb


def test_global2_factored_twiddle_via_fastpath():
    """The v2 raw engine's pass-1 factored-resident twiddle (Q tables)
    replaces the dense streamed slices; same results."""
    from portfft_tpu import fastpath

    n, batch = 65536, 2
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit(use_pallas=True)
    assert any(k[0] == "Q" for k in plan._bank_keys)
    entry = plan._raw_fast[Direction.FORWARD]
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 2, "ftw": 1},
    )
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(got.view(np.complex64).reshape(batch, n) - ref)
    rel /= np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_bluestein_fused_post_hooks():
    """Bluestein with a GLOBAL convolution folds b-hat and the final chirp
    into the engine's pass 2 (BPOST tables registered and exercised)."""
    n = 65537
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=1)
    plan = desc.commit(use_pallas=True)
    assert ("BPOST", n, -1) in plan._bank_keys
    # 9*2^14: smallest 128-aligned 3-smooth conv per bluestein_conv_n policy
    assert plan.plans[n].conv.n == 147456
    rng = np.random.default_rng(8)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    y = np.asarray(plan.compute_forward(x)).view(np.complex64)
    ref = np.fft.fft(x)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_v3_only_global_plan_does_not_crash(tmp_path, monkeypatch):
    """A GLOBAL plan whose fused G1 = a*128 has 128 % a != 0 is covered by
    the v3 engine only; the fast path must route it to eng 3 (or decline
    cleanly), never KeyError inside the v2 engine (round-3 review)."""
    from portfft_tpu import tuning

    monkeypatch.setattr(tuning, "_USER_PATH", str(tmp_path / "t.json"))
    tuning._reset_for_tests()
    try:
        n = 640 * 512  # G1=640 = fused [5, 128]: 128 % 5 != 0
        cfg_name = pfft.resolve_device_config().name
        tuning.record(cfg_name, "global_split", f"n{n}",
                      {"g1": 640, "g2": 512})
        plan = pfft.Descriptor(
            lengths=[n], number_of_transforms=1
        ).commit(use_pallas=True)
        p0 = plan.plans[n]
        assert p0.level == Level.GLOBAL and p0.sub[0].n == 640
        from portfft_tpu.ops import pallas_global

        assert not pallas_global.global2_raw_supported(
            p0, plan.config.direct_threshold
        )
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        y = np.asarray(plan.compute_forward(x))
        ref = np.fft.fft(x)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 1e-4, rel
    finally:
        tuning._reset_for_tests()
