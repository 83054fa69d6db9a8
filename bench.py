#!/usr/bin/env python
"""Benchmark driver — portFFT's headline configurations on TPU.

Mirrors the reference benchmark set and metrics
(test/bench/portfft/bench_float.cpp:49-52, test/bench/utils/
reference_dft_set.hpp:89-92 and ops_estimate.hpp:34-50):

* configs: C2C fp32 forward out-of-place
    N=16    batch=8Mi    (reference workitem level  / DIRECT here)
    N=256   batch=512Ki  (subgroup                  / FUSED)
    N=4096  batch=32Ki   (workgroup                 / FUSED)
    N=65536 batch=2048   (global                    / GLOBAL)
* flops counter:      5·batch·N·log2(N) / s   (radix-2 CT estimate)
* throughput counter: batch·(bytes_in+bytes_out) / s  (single-pass bytes)

Protocol follows the reference host-time measurement (launch_bench.hpp:
50-145): warm-up + verification on the first run, then the average of
``RUNS_TO_AVERAGE`` asynchronously-dispatched computes per sample.
Samples are interleaved ROUND-ROBIN across the configs of a group
(SAMPLES rounds, per-config min) because the attached chip's streaming
rate drifts minute-to-minute — contiguous per-config windows would tattoo
one slow minute onto one config.

Cache invalidation: the reference rewrites inputs each iteration and
rotates ≤10 input buffers (bench_utils.hpp:39-64) to defeat the GPU LLC.
TPUs have no last-level cache that could hold these multi-hundred-MB
buffers — every iteration streams from HBM — so one input buffer is
reused; the measured figure is genuine HBM throughput either way.
Run-to-run variance of the attached chip's effective HBM rate is large
(measured 150-340 GB/s for identical kernels across sessions), hence
min-of-samples; treat absolute GB/s with that context.

The default run also reports the GLOBAL-level ladder N=2^17..2^20 (the
north-star range top, BASELINE.json) on stderr; the JSON headline keeps
the reference's four-config set so the metric stays comparable across
rounds.

Prints ONE JSON line: the headline metric is the geometric-mean GFLOP/s
across the four configs; ``vs_baseline`` is the geomean single-pass
bandwidth efficiency divided by the 0.80-of-roofline target
(BASELINE.json north star) — 1.0 means the target is met exactly.
"""

import json
import math
import sys
import time

import numpy as np

CONFIGS = [
    ("small_1d", 16, 8 * 1024 * 1024),
    ("medium_small_1d", 256, 512 * 1024),
    ("medium_large_1d", 4096, 32 * 1024),
    ("large_1d", 65536, 2048),
]
# GLOBAL-level ladder to the north-star top (BASELINE.json: N=2^4..2^20);
# two-pass engine, so single-pass bandwidth caps at 50% of streaming rate.
LADDER_CONFIGS = [
    ("ladder_2^17", 1 << 17, 1024),
    ("ladder_2^18", 1 << 18, 512),
    ("ladder_2^19", 1 << 19, 256),
    ("ladder_2^20", 1 << 20, 128),
]
# The reference lists these as planned-but-unwired sets
# (reference_dft_set.hpp:43-47,93,104-113); we run them with --set full.
EXTRA_CONFIGS = [
    ("large_1d_prime", 65537, 2048),     # Bluestein (reference: planned)
    ("backward_medium", 4096, 32 * 1024),  # direction=backward
    # UNPACKED stride-2 input at GLOBAL size: exercises the regular-
    # rectangle gather (committed._regular_1d); target within 2x of the
    # PACKED large_1d rate (round-2 VERDICT #4)
    ("strided_large", 65536, 512),
]
MULTIDIM_CONFIGS = [  # BASELINE.json config row 5
    ("md_512x512", [512, 512], 256),
    ("md_1024x1024", [1024, 1024], 64),
    ("md_128^3", [128, 128, 128], 32),
]
REAL_CONFIGS = [  # real-domain set (reference planned N set:
    # {32, 512, 8192, 131072}, reference_dft_set.hpp:104-113)
    ("real_small", 32, 2 * 1024 * 1024),
    ("real_medium", 512, 256 * 1024),
    ("real_large", 8192, 16 * 1024),
    ("real_131072", 131072, 1024),
]
DF64_CONFIGS = [  # emulated-fp64 cost record (round-5 VERDICT missing #3)
    ("df64_4096", 4096, 512),
]
RUNS_TO_AVERAGE = 10
SAMPLES = 5


def _sync(arr):
    """True completion barrier.

    ``block_until_ready`` returns immediately on tunneled runtimes (axon),
    so force a tiny host readback of data dependent on the result."""
    import jax

    jax.device_get(arr.ravel()[0:1])


def make_ceiling_probe(peak_gbps: float = 819.0):
    """In-process HBM streaming-ceiling sampler, GB/s (read+write of one
    pass).

    The attached chip's effective streaming rate varies 150-340 GB/s
    between sessions AND minute-to-minute within one (a one-shot probe at
    start has read 100 GB/s while kernels later sustained 290), so
    roofline percentages against the nominal peak — or against one cold
    sample — conflate engine quality with chip weather.  This returns a
    ``sample(rounds)`` closure over pre-warmed probe kernels; the bench
    re-samples before every config and reports against the RUNNING MAX.
    Reference counterpart: the bench harness's global_mem_transactions
    throughput counter (ops_estimate.hpp:47-50).
    """
    import jax
    import jax.numpy as jnp

    x = jnp.arange(192 * 2**20 // 4, dtype=jnp.float32)  # 192 MiB
    # P / 2P HBM passes per jitted call, statically UNROLLED (a fori_loop
    # carry pins the loop state and costs an extra copy sweep per
    # iteration), each pass a PALLAS copy: Pallas calls are opaque to XLA
    # fusion, so the chain cannot collapse into fewer memory passes — an
    # unrolled XLA elementwise chain DOES fuse (measured 1064 "GB/s"
    # from a +1 fori_loop, scripts/probe_dma.py round 5), which silently
    # inflated the probe.  The rate is the SUBTRACTED (t(2P) - t(P)) / P
    # device time — dividing the wall time of a single burst leaves the
    # tunneled dispatch/readback constant in the denominator, which read
    # 143 GB/s while library kernels sustained 490 in the same window
    # (BENCH r5 first run, 2026-08-21).
    passes = 8

    candidates = []
    if jax.default_backend() == "tpu":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        rows = x.size // 128

        def make_copy(bt):
            spec = pl.BlockSpec(
                (bt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            )

            def copy_once(v):
                return pl.pallas_call(
                    lambda x_ref, o_ref: o_ref.__setitem__(
                        ..., x_ref[...]
                    ),
                    grid=(rows // bt,),
                    in_specs=[spec],
                    out_specs=spec,
                    out_shape=jax.ShapeDtypeStruct((rows, 128), v.dtype),
                )(v)

            def make_chain(k):
                @jax.jit
                def chained(v):
                    y = v.reshape(rows, 128)
                    for _ in range(k):
                        y = copy_once(y)
                    return y

                return chained

            return make_chain(passes), make_chain(2 * passes)

        # two block sizes: the faster of the two has varied by window
        candidates += [make_copy(8192), make_copy(4096)]
    else:

        def make_stream(k):
            @jax.jit
            def stream(v):
                return jax.lax.fori_loop(0, k, lambda i, a: a + 1.0, v)

            return stream

        candidates.append((make_stream(passes), make_stream(2 * passes)))

    warmed = []
    for fns in candidates:
        try:
            for fn in fns:
                _sync(fn(x))
            warmed.append(fns)
        except Exception:
            continue

    def sample(rounds: int = 1) -> float:
        # min-filter each burst length SEPARATELY before subtracting: a
        # tunnel hiccup inflating one t(P) sample makes the per-pair
        # delta arbitrarily small, and max-of-rates rode that noise to a
        # physically impossible 1517 GB/s (185% of nominal peak, BENCH r5
        # second run).  Subtracting the per-length floors is robust, and
        # anything still above nominal peak is discarded as noise — a
        # copy cannot outrun the HBM.
        best = 0.0
        for fn_p, fn_2p in warmed:
            tp_min = t2p_min = None
            for _ in range(max(2, rounds + 1)):
                t0 = time.perf_counter()
                _sync(fn_p(x))
                t_p = time.perf_counter() - t0
                t0 = time.perf_counter()
                _sync(fn_2p(x))
                t_2p = time.perf_counter() - t0
                tp_min = t_p if tp_min is None else min(tp_min, t_p)
                t2p_min = t_2p if t2p_min is None else min(t2p_min, t_2p)
            if t2p_min <= tp_min:
                continue
            t = (t2p_min - tp_min) / passes
            rate = 2 * x.size * 4 / t / 1e9
            if rate <= peak_gbps:
                best = max(best, rate)
        return best

    return sample


def prepare_config(name, n, batch, rotate=0):
    """Commit + verify one config; returns the timing state (device buffers
    stay resident so samples can interleave across configs)."""
    import jax.numpy as jnp

    import portfft_tpu as pfft

    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit()
    # document what runs: plan shape + any tuned override in effect
    try:
        from portfft_tpu import tuning

        entry = plan._raw_fast.get(pfft.Direction.FORWARD)
        tuned = (
            tuning.lookup(plan.config.name, entry[0],
                          tuning._entry_key(plan, entry[0]))
            if entry else None
        )
        print(
            f"  {name}: {plan.plans[n].describe()}"
            + (f" tuned={tuned}" if tuned else ""),
            file=sys.stderr,
        )
    except Exception:
        pass

    rng = np.random.default_rng(0)
    # Raw interleaved float buffer — the zero-conversion device path.
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    xd = jnp.asarray(x)
    # --rotate: cycle distinct input buffers between iterations, the
    # reference's LLC-defeat protocol (bench_utils.hpp:39-64, ≤10 rotating
    # buffers).  TPUs have no data cache in front of HBM, so this should
    # not change the numbers — the flag exists to prove that claim on the
    # attached chip rather than assert it.
    inputs = [xd]
    for i in range(1, rotate):
        inputs.append(
            jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
        )

    # Device-loop timer: RUNS_TO_AVERAGE applications of the raw fast-path
    # kernel chained INSIDE one executable (lax.fori_loop), so a burst is
    # ONE dispatch.  Host-side per-iteration dispatch cost — the dominant
    # noise of the tunneled runtime, which the python-loop subtraction
    # cannot cancel (it only cancels the per-sync constant) — never enters
    # the measurement; t(2R)-t(R) over two chained calls is pure device
    # time.  This is the reference's event_profiling device-time protocol
    # (launch_bench.hpp:171-234) for a runtime with no event timestamps.
    # Chained FFTs overflow f32 after ~15 applications (|y| grows ~sqrt(n)
    # per pass); inf/nan arithmetic runs at full speed on TPU VPU/MXU, so
    # the timing stays valid.
    chain = None
    try:
        from portfft_tpu import fastpath as _fp

        entry = plan._raw_fast.get(pfft.Direction.FORWARD)
        if entry is not None:
            traced = _fp.build_fn(
                plan, pfft.Direction.FORWARD, entry, 2 * batch * n
            )
            if traced is not None:
                import jax

                if traced(xd, plan._bank_arrays).shape == xd.shape:
                    # statically UNROLLED chains (python loop inside jit):
                    # a lax.fori_loop carry pins the loop state to a fixed
                    # buffer and costs a per-iteration copy (~one extra
                    # HBM sweep — measured +1.7 ms/iter at N=16), which
                    # unrolling avoids; two executables (R and 2R) per
                    # config, both persistent-cached.
                    def make_chain(k):
                        @jax.jit
                        def chained(raw, bank):
                            y = raw
                            for _ in range(k):
                                y = traced(y, bank)
                            return y

                        return chained

                    chain = (
                        make_chain(RUNS_TO_AVERAGE),
                        make_chain(2 * RUNS_TO_AVERAGE),
                    )
    except Exception:
        chain = None

    # First run verifies against the oracle on a slice (reference
    # PORTFFT_VERIFY_BENCHMARKS, launch_bench.hpp:94-102).
    y = plan.compute_forward(xd)
    check_b = min(batch, 4)
    got = np.asarray(y[: 2 * check_b * n]).view(np.complex64).reshape(check_b, n)
    ref = np.fft.fft(
        x[: 2 * check_b * n].view(np.complex64).reshape(check_b, n), axis=1
    )
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    if not rel < 1e-2:
        raise AssertionError(f"{name}: verification failed, rel={rel}")
    return {
        "name": name, "n": n, "batch": batch,
        "compute": plan.compute_forward,
        "chain": chain, "bank": plan._bank_arrays if chain else None,
        "inputs": inputs, "y": y, "rel": rel, "times": [],
    }


def sample_config(st):
    """One timing burst for a prepared config.

    Each burst times the SAME work at two iteration counts (R and 2R
    asynchronously-dispatched computes in one sync window).  The host
    wall-clock of a burst is ``t(k) = c + k·d`` where ``c`` is the
    per-sync dispatch/readback overhead of the tunneled runtime and ``d``
    the true per-iteration device time; the difference cancels ``c``:

        d = (t(2R) - t(R)) / R

    This is the reference's device-time protocol
    (event_profiling::command_start/end, launch_bench.hpp:171-234)
    translated to a runtime with no event timestamps.  Both the wall
    average (t(2R)/2R, comparable to earlier rounds) and the subtracted
    device estimate are recorded."""
    y = st["y"]
    compute, inputs = st["compute"], st["inputs"]
    _sync(y)
    t0 = time.perf_counter()
    for it in range(RUNS_TO_AVERAGE):
        y = compute(inputs[it % len(inputs)])
    _sync(y)
    t_r = time.perf_counter() - t0
    t0 = time.perf_counter()
    for it in range(2 * RUNS_TO_AVERAGE):
        y = compute(inputs[it % len(inputs)])
    _sync(y)
    t_2r = time.perf_counter() - t0
    st["times"].append(t_2r / (2 * RUNS_TO_AVERAGE))
    if st.get("chain") is not None:
        # device-loop: R and 2R chained applications, ONE dispatch each —
        # the subtraction cancels the whole host/tunnel dispatch path
        x0 = st["inputs"][0]
        bank = st["bank"]
        chain_r, chain_2r = st["chain"]
        t0 = time.perf_counter()
        yc = chain_r(x0, bank)
        _sync(yc)
        c_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        yc = chain_2r(x0, bank)
        _sync(yc)
        c_2r = time.perf_counter() - t0
        # store both burst lengths; the device time is computed at
        # report time from the per-length MIN floors — subtracting
        # per-pair lets one noise-inflated c_r sample produce a
        # physically impossible rate that then wins the min (observed:
        # large_1d "1412 GB/s" against a 710 GB/s copy ceiling)
        st.setdefault("chain_r_times", []).append(c_r)
        st.setdefault("chain_2r_times", []).append(c_2r)
    elif t_2r > t_r:
        st.setdefault("chain_r_times", []).append(t_r)
        st.setdefault("chain_2r_times", []).append(t_2r)
    st["y"] = y


def sample_states(states, samples, on_round=None):
    """``samples`` interleaved rounds of sample_config over ``states``;
    failures mark the state and drop it.  Returns the surviving states."""
    for _ in range(samples):
        if on_round is not None:
            on_round()
        for st in states:
            if st.get("failed"):
                continue
            try:
                sample_config(st)
            except Exception as exc:
                print(f"  {st['name']}: FAILED {exc}", file=sys.stderr)
                st["failed"] = True
    return [st for st in states if not st.get("failed") and st["times"]]


def report_config(st, hbm_gbps, ceiling_gbps=None):
    n, batch = st["n"], st["batch"]
    t = min(st["times"])
    flops = 5.0 * batch * n * math.log2(n)
    bytes_moved = batch * n * 8 * 2  # complex64 in + out, single-pass
    gflops = flops / t / 1e9
    gbps = bytes_moved / t / 1e9
    eff = gbps / hbm_gbps
    # device time from the per-burst-length MIN floors (robust to a
    # single noisy sample, see sample_config); a result implying more
    # than the nominal HBM peak is noise — report no device time rather
    # than an impossible one
    dev_t = None
    if st.get("chain_r_times") and st.get("chain_2r_times"):
        c_r = min(st["chain_r_times"])
        c_2r = min(st["chain_2r_times"])
        if c_2r > c_r:
            cand = (c_2r - c_r) / RUNS_TO_AVERAGE
            if bytes_moved / cand / 1e9 <= hbm_gbps:
                dev_t = cand
    dev_gbps = bytes_moved / dev_t / 1e9 if dev_t else None
    ceil_txt = ""
    if ceiling_gbps:
        ceil_txt = f"  {100*gbps/ceiling_gbps:5.1f}% of ceiling"
    dev_txt = f"  dev {dev_t*1e3:.3f} ms {dev_gbps:.1f} GB/s" if dev_t else ""
    print(
        f"  {st['name']:18s} N={n:<7d} b={batch:<9d} {t*1e3:8.3f} ms  "
        f"{gflops:9.1f} GFLOP/s  {gbps:8.1f} GB/s  {100*eff:5.1f}% roofline"
        f"{ceil_txt}{dev_txt}  rel_err={st['rel']:.1e}",
        file=sys.stderr,
    )
    return {
        "gflops": gflops, "eff": eff, "gbps": gbps, "ms": t * 1e3,
        "dev_gbps": dev_gbps,
        "dev_ms": dev_t * 1e3 if dev_t else None,
        "dev_gflops": flops / dev_t / 1e9 if dev_t else None,
        "dev_eff": dev_gbps / hbm_gbps if dev_t else None,
    }


GROUP_BUDGET_BYTES = 7 << 30  # resident buffers per round-robin group


def _chunk_by_budget(configs, rotate):
    """Split configs into groups whose resident device bytes (inputs +
    output + engine intermediates, ~3 buffers per config, more with
    --rotate) fit GROUP_BUDGET_BYTES, preserving order."""
    groups, cur, cur_bytes = [], [], 0
    for item in configs:
        n, batch = item[1], item[2]
        est = 2 * batch * n * 4 * (max(1, rotate) + 2)
        if cur and cur_bytes + est > GROUP_BUDGET_BYTES:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(item)
        cur_bytes += est
    if cur:
        groups.append(cur)
    return groups


def bench_group(configs, hbm_gbps, ceiling_sample, ceiling, rotate=0):
    """Bench configs with timing bursts interleaved round-robin within
    HBM-budget-sized groups (SAMPLES rounds, per-config min): the chip's
    streaming rate drifts minute-to-minute, so contiguous per-config
    timing windows conflate config quality with chip weather (same
    protocol the autotuner uses).  A group's buffers stay device-resident,
    so groups are chunked to GROUP_BUDGET_BYTES (--rotate multiplies the
    input buffers and shrinks groups accordingly).

    Returns (results, ceiling): results maps name -> (gflops, eff)."""
    results = {}
    ceil_box = [ceiling]
    for group in _chunk_by_budget(configs, rotate):
        states = []
        for name, n, batch in group:
            try:
                states.append(prepare_config(name, n, batch, rotate))
            except Exception as exc:
                print(f"  {name}: FAILED {exc}", file=sys.stderr)

        def resample():
            if ceiling_sample is not None:
                ceil_box[0] = max(ceil_box[0], ceiling_sample())

        for st in sample_states(states, SAMPLES, on_round=resample):
            results[st["name"]] = report_config(st, hbm_gbps, ceil_box[0])
    return results, ceil_box[0]


def bench_extra(cfg):
    """Extended sets: backward, Bluestein prime, strided, real-domain,
    multi-dim (the reference's planned sets, reference_dft_set.hpp:37-113).
    Each set is prepared up front and timed round-robin.  Returns a dict
    name -> {ms, gflops, dev_ms} recorded in the round JSON so regressions
    in non-headline paths stay visible round-over-round."""
    import jax.numpy as jnp

    import portfft_tpu as pfft
    from portfft_tpu import Domain

    rng = np.random.default_rng(0)
    recorded = {}

    def run_set(prepare, configs):
        states = []
        for item in configs:
            name = item[0]
            try:
                states.append(prepare(*item))
            except Exception as e:
                print(f"  {name}: FAILED {e}", file=sys.stderr)
        for st in sample_states(states, samples=3):
            t = min(st["times"])
            dev_t = None
            if st.get("chain_r_times") and st.get("chain_2r_times"):
                c_r = min(st["chain_r_times"])
                c_2r = min(st["chain_2r_times"])
                if c_2r > c_r:
                    dev_t = (c_2r - c_r) / RUNS_TO_AVERAGE
            print(
                f"  {st['name']:18s} {st['label']:12s} {t*1e3:8.3f} ms "
                f"{st['flops']/t/1e9:9.1f} GFLOP/s" + st["tail"](t),
                file=sys.stderr,
            )
            recorded[st["name"]] = {
                "ms": round(t * 1e3, 3),
                "gflops": round(st["flops"] / t / 1e9, 1),
                "dev_ms": round(dev_t * 1e3, 3) if dev_t else None,
            }

    def prep_extra(name, n, batch):
        if "strided" in name:
            desc = pfft.Descriptor(
                lengths=[n],
                number_of_transforms=batch,
                forward_strides=[2],
                forward_distance=2 * n,
                backward_strides=[1],
                backward_distance=n,
            )
            count = 2 * batch * 2 * n
        else:
            desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
            count = 2 * batch * n
        plan = desc.commit()
        x = jnp.asarray(rng.uniform(-1, 1, count).astype(np.float32))
        compute = (
            plan.compute_backward if "backward" in name
            else plan.compute_forward
        )
        return {
            "name": name, "label": f"N={n}", "compute": compute, "inputs": [x],
            "y": compute(x), "times": [],
            "flops": 5 * batch * n * math.log2(n), "tail": lambda t: "",
        }

    def prep_real(name, n, batch):
        desc = pfft.Descriptor(
            lengths=[n], number_of_transforms=batch, domain=Domain.REAL
        )
        plan = desc.commit()
        x = jnp.asarray(rng.uniform(-1, 1, batch * n).astype(np.float32))
        return {
            "name": name, "label": f"N={n}", "compute": plan.compute_forward,
            "inputs": [x], "y": plan.compute_forward(x), "times": [],
            "flops": 2.5 * batch * n * math.log2(n), "tail": lambda t: "",
        }

    def prep_md(name, lengths, batch):
        desc = pfft.Descriptor(
            lengths=list(lengths), number_of_transforms=batch
        )
        plan = desc.commit()
        n = math.prod(lengths)
        x = jnp.asarray(rng.uniform(-1, 1, 2 * batch * n).astype(np.float32))
        y = plan.compute_forward(x)
        check_b = min(batch, 2)
        got = (
            np.asarray(y[: 2 * check_b * n])
            .view(np.complex64)
            .reshape(check_b, *lengths)
        )
        ref = np.fft.fftn(
            np.asarray(x[: 2 * check_b * n])
            .view(np.complex64)
            .reshape(check_b, *lengths),
            axes=tuple(range(1, 1 + len(lengths))),
        )
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 1e-2, rel
        gbytes = batch * n * 16 / 1e9
        return {
            "name": name, "label": "x".join(map(str, lengths)),
            "compute": plan.compute_forward, "inputs": [x], "y": y, "times": [],
            "flops": 5 * batch * n * math.log2(n),
            "tail": lambda t, g=gbytes, r=rel: (
                f" {g/t:7.1f} GB/s rel_err={r:.1e}"
            ),
        }

    def prep_df64(name, n, batch):
        import jax

        desc = pfft.Descriptor(
            lengths=[n], number_of_transforms=batch, precision="float64"
        )
        plan = desc.commit(emulate_fp64=True)
        xr = rng.standard_normal((batch, n))
        xi = rng.standard_normal((batch, n))
        rh = xr.astype(np.float32)
        rl = (xr - rh.astype(np.float64)).astype(np.float32)
        ih = xi.astype(np.float32)
        il = (xi - ih.astype(np.float64)).astype(np.float32)
        planes = tuple(jnp.asarray(p) for p in (rh, rl, ih, il))

        @jax.jit
        def f(a, b, c, d):
            (orh, orl), (oih, oil) = plan.apply((a, b), (c, d))
            # one plane that depends on all four outputs (bench _sync
            # reads a single array; a bare tuple would break it and a
            # partial output would let XLA dead-code the rest)
            return (orh + orl) + (oih + oil)

        compute = lambda tup: f(*tup)  # noqa: E731
        y = compute(planes)
        # accuracy record: df64 must actually be double-accurate
        ref = np.fft.fft(
            (xr[:2] + 1j * xi[:2]).astype(np.complex128), axis=1
        )
        got = np.asarray(y[:2]).astype(np.float64)
        rel = np.linalg.norm(
            got - (ref.real + ref.imag)
        ) / np.linalg.norm(ref.real + ref.imag)
        return {
            "name": name, "label": f"N={n}", "compute": compute,
            "inputs": [planes], "y": y, "times": [],
            "flops": 5 * batch * n * math.log2(n),
            "tail": lambda t, r=rel: f" rel_err={r:.1e} (df64)",
        }

    run_set(prep_extra, EXTRA_CONFIGS)
    run_set(prep_real, REAL_CONFIGS)
    run_set(prep_md, MULTIDIM_CONFIGS)
    run_set(prep_df64, DF64_CONFIGS)
    return recorded


def main():
    import jax
    import portfft_tpu as pfft

    # repeated bench runs (and the driver's re-run) hit the persistent XLA
    # cache instead of paying ~20-40 s Mosaic compiles per shape
    try:
        from portfft_tpu.config import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass

    dev = jax.devices()[0]
    cfg = pfft.resolve_device_config(dev)
    # Device context dump (reference bench metadata, device_context.hpp:30-51)
    print(
        f"device: {dev.device_kind} ({cfg.name}), platform {dev.platform}, "
        f"peak HBM {cfg.hbm_gbps} GB/s, VMEM {cfg.vmem_bytes >> 20} MiB, "
        f"jax {jax.__version__}",
        file=sys.stderr,
    )

    try:
        ceiling_sample = make_ceiling_probe(cfg.hbm_gbps)
        ceiling = ceiling_sample(rounds=2)
        print(
            f"session streaming ceiling (first sample): {ceiling:.1f} GB/s "
            f"({100 * ceiling / cfg.hbm_gbps:.0f}% of nominal peak; "
            f"re-sampled before every config, running max reported)",
            file=sys.stderr,
        )
    except Exception as exc:
        ceiling_sample = None
        ceiling = 0.0
        print(f"ceiling probe failed: {exc}", file=sys.stderr)

    rotate = 4 if "--rotate" in sys.argv else 0

    results, ceiling = bench_group(
        CONFIGS, cfg.hbm_gbps, ceiling_sample, ceiling, rotate
    )
    gflops_list = [r["gflops"] for r in results.values()]
    eff_list = [r["eff"] for r in results.values()]
    # north-star ladder top (not in the headline geomean — see docstring)
    ladder_results, ceiling = bench_group(
        LADDER_CONFIGS, cfg.hbm_gbps, ceiling_sample, ceiling, rotate
    )

    if not gflops_list:
        # keep the one-JSON-line contract alive even with no working config
        print(
            json.dumps(
                {
                    "metric": "batched 1D C2C fp32 fwd GFLOP/s",
                    "value": 0.0,
                    "unit": "GFLOP/s",
                    "vs_baseline": 0.0,
                }
            )
        )
        return

    # full surface recorded by default (VERDICT r3 missing #4): backward,
    # Bluestein prime, strided, REAL, multi-dim all land in the round JSON.
    # --set headline skips them (quick runs).
    extra_results = {}
    if not ("--set" in sys.argv and "headline" in sys.argv):
        try:
            extra_results = bench_extra(cfg)
        except Exception as exc:
            print(f"  extra sets FAILED: {exc}", file=sys.stderr)

    geo_gflops = math.exp(sum(math.log(g) for g in gflops_list) / len(gflops_list))
    geo_eff = math.exp(sum(math.log(e) for e in eff_list) / len(eff_list))
    # Headline basis: DEVICE time when every headline config produced a
    # device-loop measurement (the reference's roofline comparisons are
    # device-time comparisons; our wall numbers carry 2-5 ms of tunneled
    # per-dispatch overhead that measures the harness, not the library).
    # Wall-based numbers stay in the JSON ("wall_*") for round-over-round
    # continuity.
    dev_g = [r["dev_gflops"] for r in results.values()]
    dev_e = [r["dev_eff"] for r in results.values()]
    basis = "wall"
    if all(g is not None for g in dev_g) and dev_g:
        basis = "device"
        wall_gflops, wall_eff = geo_gflops, geo_eff
        geo_gflops = math.exp(sum(math.log(g) for g in dev_g) / len(dev_g))
        geo_eff = math.exp(sum(math.log(e) for e in dev_e) / len(dev_e))
    out = {
        "metric": "batched 1D C2C fp32 fwd GFLOP/s (geomean of portFFT bench set)",
        "value": round(geo_gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(geo_eff / 0.80, 4),
        "time_basis": basis,
    }
    if basis == "device":
        out["wall_value"] = round(wall_gflops, 2)
        out["wall_vs_baseline"] = round(wall_eff / 0.80, 4)
    # efficiency denominator: the session ceiling comes from the PURE
    # DATA-MOVEMENT probe only (round-5 VERDICT weak #5: folding the
    # best kernel into the denominator made small_1d 100% of ceiling by
    # definition).  The probe re-samples before every config and the
    # running max rides the chip's fast windows; if a kernel still
    # outruns every probe sample (drift between its window and the
    # probe's), that is recorded explicitly instead of silently raising
    # the bar.
    best_seen = max(
        (
            max(r["gbps"], r["dev_gbps"] or 0.0)
            for r in {**results, **ladder_results}.values()
        ),
        default=0.0,
    )
    if ceiling:
        out["session_ceiling_gbps"] = round(ceiling, 1)
        out["pct_of_session_ceiling"] = round(
            100 * geo_eff * cfg.hbm_gbps / ceiling, 1
        )
        if best_seen > ceiling:
            out["kernel_exceeds_ceiling_gbps"] = round(best_seen, 1)
    sets = {}
    for name, r in {**results, **ladder_results}.items():
        sets[name] = {
            "ms": round(r["ms"], 3),
            "gbps": round(r["gbps"], 1),
            "dev_ms": round(r["dev_ms"], 3) if r["dev_ms"] else None,
            "dev_gbps": round(r["dev_gbps"], 1) if r["dev_gbps"] else None,
        }
    sets.update(extra_results)
    out["sets"] = sets
    print(json.dumps(out))


if __name__ == "__main__":
    main()
