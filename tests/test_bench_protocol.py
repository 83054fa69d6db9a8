"""The bench driver's round-robin group protocol (bench.bench_group).

The attached chip's streaming rate drifts minute-to-minute, so the bench
interleaves timing bursts across a group's configs instead of giving each
config one contiguous window (reference protocol: launch_bench.hpp:50-145
measures contiguously — the interleave is a deliberate deviation for a
noisy shared chip; the per-config min over rounds keeps the metric).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def test_bench_group_round_robin_results():
    configs = [("tiny16", 16, 8), ("tiny64", 64, 4)]
    results, ceiling = bench.bench_group(configs, 819.0, None, 0.0)
    assert set(results) == {"tiny16", "tiny64"}
    for r in results.values():
        assert r["gflops"] > 0 and 0 < r["eff"] < 1
        assert r["gbps"] > 0 and r["ms"] > 0
        # the device-time subtraction may legitimately come up empty on a
        # noisy host (t(2R) <= t(R)), but when present it must be positive
        if r["dev_ms"] is not None:
            assert r["dev_ms"] > 0 and r["dev_gbps"] > 0
    assert ceiling == 0.0


def test_bench_group_samples_interleaved(monkeypatch):
    order = []
    real_sample = bench.sample_config

    def spy(st):
        order.append(st["name"])
        real_sample(st)

    monkeypatch.setattr(bench, "sample_config", spy)
    bench.bench_group([("a16", 16, 4), ("b32", 32, 4)], 819.0, None, 0.0)
    # rounds alternate configs: a, b, a, b, ... never a,a,a..b,b,b
    assert order[: 2 * bench.SAMPLES] == ["a16", "b32"] * bench.SAMPLES


def test_bench_group_rotate_falls_back_to_singleton_groups(monkeypatch):
    prepared = []
    real_prepare = bench.prepare_config

    def spy(name, n, batch, rotate=0):
        prepared.append((name, rotate))
        return real_prepare(name, n, batch, rotate)

    monkeypatch.setattr(bench, "prepare_config", spy)
    results, _ = bench.bench_group(
        [("a16", 16, 4), ("b32", 32, 4)], 819.0, None, 0.0, rotate=2
    )
    assert set(results) == {"a16", "b32"}
    assert prepared == [("a16", 2), ("b32", 2)]


def test_bench_extra_round_robin(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "EXTRA_CONFIGS",
        [("backward_tiny", 64, 4), ("strided_tiny", 64, 4)],
    )
    monkeypatch.setattr(bench, "REAL_CONFIGS", [("real_tiny", 32, 4)])
    monkeypatch.setattr(bench, "MULTIDIM_CONFIGS", [("md_8x16", [8, 16], 2)])
    monkeypatch.setattr(bench, "RUNS_TO_AVERAGE", 2)

    class Cfg:
        hbm_gbps = 100.0

    recorded = bench.bench_extra(Cfg())
    err = capsys.readouterr().err
    for name in ("backward_tiny", "strided_tiny", "real_tiny", "md_8x16"):
        assert name in err, err
        # every extra-set config lands in the round JSON (VERDICT r3 #4)
        assert recorded[name]["ms"] > 0 and recorded[name]["gflops"] >= 0
    assert "FAILED" not in err, err


def test_bench_group_survives_failing_config(monkeypatch):
    real_prepare = bench.prepare_config

    def boom(name, n, batch, rotate=0):
        if name == "bad":
            raise RuntimeError("no plan")
        return real_prepare(name, n, batch, rotate)

    monkeypatch.setattr(bench, "prepare_config", boom)
    results, _ = bench.bench_group(
        [("bad", 7, 3), ("a16", 16, 4)], 819.0, None, 0.0
    )
    assert set(results) == {"a16"}


def test_prepare_config_device_loop_chain(monkeypatch):
    """The device-loop timer (prepare_config "chain"): RUNS_TO_AVERAGE
    raw-fastpath applications chained inside one executable — built
    whenever the plan has a shape-preserving raw fast path, and exercised
    by sample_config without error."""
    import portfft_tpu as pfft

    orig = pfft.Descriptor.commit

    def commit_pallas(self, **kw):
        kw.setdefault("use_pallas", True)  # interpret-mode kernels on CPU
        return orig(self, **kw)

    monkeypatch.setattr(pfft.Descriptor, "commit", commit_pallas)
    monkeypatch.setattr(bench, "RUNS_TO_AVERAGE", 2)
    st = bench.prepare_config("tiny", 256, 64)
    assert st["chain"] is not None, "raw fast path should chain at n=256"
    # chain_2r equals chain_r applied twice (statically unrolled pair)
    import numpy as np

    chain_r, chain_2r = st["chain"]
    one = np.asarray(chain_r(st["inputs"][0], st["bank"]))
    two = np.asarray(chain_2r(st["inputs"][0], st["bank"]))
    import jax.numpy as jnp

    again = np.asarray(chain_r(jnp.asarray(one), st["bank"]))
    assert np.allclose(two, again, rtol=1e-4, atol=1e-3)
    bench.sample_config(st)
    assert st["times"]
