"""Autotuner plumbing: lookup/record round trip, fastpath overrides, split
override, and end-to-end autotune on the interpreter backend."""

import numpy as np
import pytest

import oracle
from portfft_tpu import Descriptor, Direction, tuning
from portfft_tpu.enums import Level


@pytest.fixture
def tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(tuning, "_USER_PATH", str(tmp_path / "tune.json"))
    tuning._reset_for_tests()
    yield
    tuning._reset_for_tests()


def test_record_lookup_roundtrip(tmp_cache):
    assert tuning.lookup("cpu", "direct", "n16") is None
    tuning.record("cpu", "direct", "n16", {"rt": 2048})
    assert tuning.lookup("cpu", "direct", "n16") == {"rt": 2048}
    # persisted: a fresh load still sees it
    tuning._reset_for_tests()
    assert tuning.lookup("cpu", "direct", "n16") == {"rt": 2048}


def test_tuned_rt_is_used_and_validated(tmp_cache):
    desc = Descriptor(lengths=[16], number_of_transforms=1024)
    plan = desc.commit(use_pallas=True)
    # an rt that does not divide the buffer falls back to the computed one
    tuning.record(plan.config.name, "direct", "n16", {"rt": 999})
    x = oracle.gen_input(desc, 0)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_global_split_override(tmp_cache):
    from portfft_tpu.config import DeviceConfig
    from portfft_tpu.planner import plan_1d

    cfg = DeviceConfig()
    default = plan_1d(1 << 17, cfg, 4)
    assert (default.sub[0].n, default.sub[1].n) == (512, 256)
    tuning.record(cfg.name, "global_split", f"n{1 << 17}",
                  {"g1": 1024, "g2": 128})
    tuned = plan_1d(1 << 17, cfg, 4)
    assert (tuned.sub[0].n, tuned.sub[1].n) == (1024, 128)
    assert tuned.sub[0].level == Level.FUSED
    # an invalid split (g1*g2 != n) is ignored
    tuning.record(cfg.name, "global_split", f"n{1 << 17}",
                  {"g1": 999, "g2": 7})
    assert plan_1d(1 << 17, cfg, 4).sub[0].n == 512


def test_autotune_interpreter(tmp_cache):
    # end-to-end: measures variants (interpreter), records, recomputes
    desc = Descriptor(lengths=[16], number_of_transforms=8192)
    plan = desc.commit(use_pallas=True)
    params = plan.autotune(iters=1)
    # {} (the static-heuristic baseline) is a legitimate winner
    assert params is not None and (params == {} or "rt" in params)
    assert tuning.lookup(plan.config.name, "direct", "n16") == params
    x = oracle.gen_input(desc, 1)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_autotune_multidim_ct(tmp_cache):
    """Multi-dim entries enumerate the column-kernel lane tile ({"ct": …})
    and the tuned override computes identically."""
    desc = Descriptor(lengths=[8, 128], number_of_transforms=16)
    plan = desc.commit(use_pallas=True)
    from portfft_tpu.enums import Direction as _Dir

    entry = plan._raw_fast.get(_Dir.FORWARD)
    assert entry is not None and entry[0] == "multidim"
    variants = tuning._variants_for_entry(plan, entry)
    assert {"ct": 256} in variants and {"ct": 128} in variants
    params = plan.autotune(iters=1)
    assert params is not None
    assert tuning.lookup(plan.config.name, "multidim", "n8x128") == params
    x = oracle.gen_input(desc, 3)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_no_tuning_env_zero_means_on(tmp_cache, monkeypatch):
    """PORTFFT_NO_TUNING=0 must keep tuning lookups enabled (review fix)."""
    monkeypatch.setenv("PORTFFT_NO_TUNING", "0")
    tuning.record("cpu", "direct", "n99", {"rt": 512})
    assert tuning.lookup("cpu", "direct", "n99") == {"rt": 512}
    monkeypatch.setenv("PORTFFT_NO_TUNING", "1")
    assert tuning.lookup("cpu", "direct", "n99") is None


def test_forget_removes_entry(tmp_cache):
    tuning.record("cpu", "global_split", "n999", {"g1": 3, "g2": 333})
    tuning.forget("cpu", "global_split", "n999")
    assert tuning.lookup("cpu", "global_split", "n999") is None
    tuning.forget("cpu", "global_split", "never_there")  # no-op, no raise


def test_stale_bt_override_does_not_degrade(tmp_cache):
    """A tuned bt that does not divide the batch is ignored (the kernel
    picks its own tile) instead of silently dropping to the v1 kernel."""
    desc = Descriptor(lengths=[1024], number_of_transforms=100)
    plan = desc.commit(use_pallas=True)
    tuning.record(plan.config.name, "fused2", "n1024", {"bt": 32})
    x = oracle.gen_input(desc, 9)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_shipped_defaults_are_consistent():
    """The shipped tuning_defaults.json must load and its global splits
    must actually factor their sizes (a corrupt table would silently plan
    nonsense)."""
    import json
    import os

    import portfft_tpu.tuning as t

    with open(os.path.join(os.path.dirname(t.__file__),
                           "tuning_defaults.json")) as f:
        ship = json.load(f)
    for dev, tbl in ship.items():
        for key, params in tbl.get("global_split", {}).items():
            n = int(key[1:])
            assert params["g1"] * params["g2"] == n, (dev, key, params)
        for key, params in tbl.get("fused2", {}).items():
            assert params.get("bt", 1) >= 1
        for key, params in tbl.get("direct", {}).items():
            assert params.get("rt", 8) >= 8


def test_global2_ds_override_parity(tmp_cache):
    """A tuned {"eng": 2, "ds": 1} entry (parallel grid semantics) changes
    scheduling only — end-to-end results must be identical."""
    n, b = 65536, 2
    desc = Descriptor(lengths=[n], number_of_transforms=b)
    plan = desc.commit(use_pallas=True)
    if plan.plans[n].level != Level.GLOBAL:
        pytest.skip("shape did not plan GLOBAL on this config")
    key = tuning._entry_key(plan, "global2")
    tuning.record(plan.config.name, "global2", key, {"eng": 2, "ds": 1})
    plan2 = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 5)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan2.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_global2_stale_tile_override_falls_back(tmp_cache):
    """A tuned t1 that does not divide g2 (stale/hand-edited cache) must
    fall back to the static pick — the grid floors g2 // t1, so honoring
    it would leave tail tiles unwritten (silently wrong output)."""
    n, b = 65536, 2
    desc = Descriptor(lengths=[n], number_of_transforms=b)
    plan0 = desc.commit(use_pallas=True)
    key = tuning._entry_key(plan0, "global2")
    tuning.record(plan0.config.name, "global2", key,
                  {"eng": 2, "t1": 384, "t2": 384})
    plan = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 6)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_autotune_real_routes_to_sub_entry(tmp_cache):
    """autotune() on a REAL plan measures the half-length sub-kernel's
    variant space end-to-end through the wrapper and records the winner
    under the SUB kind/key (where build_fn's lookup reads it)."""
    from portfft_tpu import Domain

    n, b = 2048, 16  # half-length 1024 -> fused2 sub
    desc = Descriptor(
        lengths=[n], number_of_transforms=b, domain=Domain.REAL
    )
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "realf"
    variants = tuning._variants_for_entry(plan, entry)
    assert len(variants) > 1 and variants[0] == {}
    params = plan.autotune(iters=1)
    assert params is not None
    assert tuning.lookup(plan.config.name, "fused2", "n1024") == params
    # and the tuned plan still computes correctly
    x = np.random.default_rng(7).uniform(-1, 1, (b, n)).astype(np.float32)
    y = np.asarray(plan.compute_forward(x.reshape(-1)))
    ref = np.fft.rfft(x)
    assert np.allclose(y.reshape(b, -1), ref, atol=1e-3)

def test_autotune_drops_mismatching_variant(tmp_cache, monkeypatch):
    """A variant whose output diverges from the static baseline is dropped
    before timing (the tuner otherwise persists fast-but-wrong winners —
    device miscompiles are invisible to the CPU suite)."""

    from portfft_tpu import fastpath
    from portfft_tpu.utils import logging as plog

    desc = Descriptor(lengths=[16], number_of_transforms=8192)
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast[Direction.FORWARD]
    variants = tuning._variants_for_entry(plan, entry)
    assert len(variants) >= 2
    bad = variants[-1]

    real_build = fastpath.build_fn

    def corrupting_build(committed, direction, ent, flat_len,
                         overrides=None):
        fn = real_build(committed, direction, ent, flat_len,
                        overrides=overrides)
        if overrides == bad and fn is not None:
            return lambda x, bank, _f=fn: _f(x, bank) * 0.0
        return fn

    msgs = []
    monkeypatch.setattr(fastpath, "build_fn", corrupting_build)
    monkeypatch.setattr(plog, "trace", lambda m: msgs.append(str(m)))
    params = plan.autotune(iters=1)
    assert params is not None and params != bad
    assert any("output mismatch" in m for m in msgs), msgs
    # and the winner still computes correctly
    x = oracle.gen_input(desc, 4)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)

def test_mark_stale_masks_and_record_clears(tmp_cache):
    """A stale mark hides the entry from lookup (masking a shipped default
    too), persists across reloads, is listed by stale_entries(), and a
    fresh record() clears it."""
    tuning.record("cpu", "direct", "n77", {"rt": 512})
    tuning.mark_stale("cpu", "direct", "n77", "Mosaic failed: synthetic")
    assert tuning.lookup("cpu", "direct", "n77") is None
    tuning._reset_for_tests()
    assert tuning.lookup("cpu", "direct", "n77") is None
    stales = tuning.stale_entries("cpu")
    assert any(k == "n77" for (_, _, k, _) in stales)
    tuning.record("cpu", "direct", "n77", {"rt": 1024})
    assert tuning.lookup("cpu", "direct", "n77") == {"rt": 1024}
    assert not any(k == "n77" for (_, _, k, _) in tuning.stale_entries("cpu"))


def test_kernel_rejection_marks_tuned_entry_stale(tmp_cache, monkeypatch):
    """Runtime kernel rejection of a TUNED variant durably demotes the
    table entry (VERDICT r4 weak #8): the fallback still computes the
    right answer, and the rotted winner is masked for later commits
    instead of silently re-failing every process start."""
    from portfft_tpu import fastpath
    from portfft_tpu.utils import logging as plog

    desc = Descriptor(lengths=[16], number_of_transforms=1024)
    plan = desc.commit(use_pallas=True)
    key = tuning._entry_key(plan, "direct")
    tuning.record(plan.config.name, "direct", key, {"rt": 2048})

    real_build = fastpath.build_fn

    def rotted_build(committed, direction, ent, flat_len, overrides=None,
                     **kw):
        fn = real_build(committed, direction, ent, flat_len,
                        overrides=overrides, **kw)
        if fn is None:
            return None

        def boom(x, bank):
            raise RuntimeError("Mosaic failed: synthetic stale winner")

        return boom

    warns = []
    monkeypatch.setattr(fastpath, "build_fn", rotted_build)
    monkeypatch.setattr(plog, "warn", lambda m: warns.append(str(m)))
    x = oracle.gen_input(desc, 2)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)
    # the tuned entry is now masked, durably
    assert tuning.lookup(plan.config.name, "direct", key) is None
    assert any("stale tuned entry" in m for m in warns), warns
    stales = tuning.stale_entries(plan.config.name)
    assert any(k == key for (_, _, k, _) in stales)


def test_multidim_ds_variant_computes(tmp_cache):
    """{"ds": 1} (parallel column grid) variants are enumerated for
    multidim/bi_col entries and a tuned one computes identically."""
    desc = Descriptor(lengths=[8, 128], number_of_transforms=16)
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast[Direction.FORWARD]
    variants = tuning._variants_for_entry(plan, entry)
    assert {"ds": 1} in variants and {"ct": 256, "ds": 1} in variants
    tuning.record(plan.config.name, "multidim", "n8x128",
                  {"ct": 128, "ds": 1})
    plan2 = desc.commit(use_pallas=True)
    x = oracle.gen_input(desc, 6)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan2.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)
