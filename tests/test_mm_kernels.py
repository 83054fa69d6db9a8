"""Interpret-mode tests for the matmul-widened (mm) fused2 kernel.

The mm kernel (ops/pallas_fft.py ``fused2_raw_mm_call``) is the raw
fast path's default fused2 engine on TPU: stage A as one K/M-stacked
bf16 matmul (TwiddleBank.dft_kstack), stage B as Karatsuba with presplit
tables (TwiddleBank.mat_kara).  Reference counterpart of this suite:
the WORKGROUP-size rows of instantiate_fft_tests.hpp:133-137.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import portfft_tpu as pfft
from portfft_tpu.config import DeviceConfig
from portfft_tpu.enums import Direction
from portfft_tpu.ops import pallas_fft, xla_fft
from portfft_tpu.planner import plan_1d

CFG = DeviceConfig()


def _mm_tables(a, sign, scale=1.0):
    bank = xla_fft.TwiddleBank(np.float32)
    g = pallas_fft.fold_factor(a)
    ks = bank.dft_kstack(a, sign)
    tu = bank.twiddle_fm(a, 128, sign)
    wb = bank.dft_permuted(128, sign, g) if g > 1 else bank.dft(128, sign)
    kq = bank.mat_kara(wb, scale)
    arrs = bank.device_arrays()
    names = [ks + "k", tu + "r", tu + "i"] + [
        kq + str(j) for j in range(1, 7)
    ]
    return [arrs[nm] for nm in names]


@pytest.mark.parametrize(
    "n,batch,sign,scale",
    [
        (1024, 16, -1, 1.0),
        (2048, 8, -1, 1.0),
        (4096, 4, -1, 1.0),
        (4096, 4, +1, 1.0 / 4096.0),
        (8192, 4, -1, 2.0),
    ],
)
def test_fused2_mm_kernel(n, batch, sign, scale):
    plan = plan_1d(n, CFG, 4)
    a = plan.factors[0]
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    tables = _mm_tables(a, sign, scale)
    got = pallas_fft.fused2_raw_mm_call(
        jnp.asarray(x), batch, plan, tables, CFG
    )
    assert got is not None
    gc = np.asarray(got).view(np.complex64).reshape(batch, n)
    xc = x.view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(xc) if sign < 0 else np.fft.ifft(xc) * n
    ref = ref * scale
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


@pytest.mark.parametrize("n,batch", [(1024, 16), (4096, 4)])
def test_fused2_mm_flat_stage_b_parity(n, batch):
    """The flat={"flat": 1} variant (stage-B Karatsuba on the (a·bt, 128)
    2D view instead of a-many M=bt batched matmuls) is numerically
    identical to the batched form."""
    plan = plan_1d(n, CFG, 4)
    a = plan.factors[0]
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    tables = _mm_tables(a, -1)
    got = pallas_fft.fused2_raw_mm_call(
        jnp.asarray(x), batch, plan, tables, CFG, flat=True
    )
    assert got is not None
    gc = np.asarray(got).view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_fused2_mm_ds_variant_parity():
    """The {"ds": 1} variant (grid dimension declared parallel) is a pure
    scheduling hint — results identical (compiler params are skipped in
    interpret mode; this pins the plumbing and the TPU-side call shape)."""
    n, batch = 4096, 4
    plan = plan_1d(n, CFG, 4)
    a = plan.factors[0]
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    tables = _mm_tables(a, -1)
    got = pallas_fft.fused2_raw_mm_call(
        jnp.asarray(x), batch, plan, tables, CFG, ds=True
    )
    assert got is not None
    gc = np.asarray(got).view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_fused2_mm_declines_highest_precision():
    plan = plan_1d(4096, CFG, 4)
    a = plan.factors[0]
    x = np.zeros(2 * 4 * 4096, np.float32)
    tables = _mm_tables(a, -1)
    got = pallas_fft.fused2_raw_mm_call(
        jnp.asarray(x), 4, plan, tables, CFG, precision="highest"
    )
    assert got is None  # caller falls back to the v2 x3/HIGHEST kernel


def test_fused2_mm_is_fastpath_default():
    from portfft_tpu import fastpath

    n, batch = 4096, 8
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "fused2"
    names_mm = entry[1][3]
    assert names_mm is not None and names_mm[0].startswith("K")
    fn = fastpath.build_fn(plan, Direction.FORWARD, entry, 2 * batch * n)
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(got.view(np.complex64).reshape(batch, n) - ref)
    rel /= np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_fused2_mm_scale_in_tables():
    """Backward direction folds the user scale into the Q tables."""
    n, batch = 2048, 4
    desc = pfft.Descriptor(lengths=[n], number_of_transforms=batch)
    desc.backward_scale = 1.0 / n
    plan = desc.commit(use_pallas=True)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((batch, n)) + 1j * rng.standard_normal(
        (batch, n))).astype(np.complex64)
    y = np.asarray(plan.compute_backward(x)).view(np.complex64).reshape(
        batch, n
    )
    ref = np.fft.ifft(x)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global2_mm_override_parity():
    """The autotuner's {"mm": 0} (narrow-matmul) engine variant matches
    the mm default within the x3 error floor."""
    from portfft_tpu import fastpath

    n, batch = 65536, 8
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch
    ).commit(use_pallas=True)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "global2"
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    outs = {}
    for mm in (0, 1):
        fn = fastpath.build_fn(
            plan, Direction.FORWARD, entry, 2 * batch * n,
            overrides={"eng": 2, "mm": mm},
        )
        outs[mm] = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    for mm, got in outs.items():
        gc = got.view(np.complex64).reshape(batch, n)
        rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
        assert rel < 1e-4, (mm, rel)


def test_global_sq_single_pass_parity():
    """The single-pass square engine variant ({"eng": 5}) matches the
    two-pass default within the x3 error floor, including the folded
    scale, and declines shapes whose subs are not both DIRECT."""
    from portfft_tpu import fastpath
    from portfft_tpu.ops import pallas_global

    n, batch = 65536, 4
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, forward_scale=0.5
    ).commit(use_pallas=True)
    p0 = plan.plans[n]
    assert pallas_global.global_sq_supported(p0, plan.config)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "global2"
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 5, "bt": 1},
    )
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n)) * 0.5
    gc = got.view(np.complex64).reshape(batch, n)
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global_sq_declines_oversized():
    from portfft_tpu.config import DeviceConfig
    from portfft_tpu.ops import pallas_global
    from portfft_tpu.planner import plan_1d

    cfg = DeviceConfig()
    # 2^20's default split has a DIRECT-512 sub (not lane-solvable) and a
    # working-set estimate far past the VMEM cap — must decline
    p = plan_1d(1 << 20, cfg, 4)
    assert not pallas_global.global_sq_supported(p, cfg)


def test_global_sq_distinct_direct_subs_parity():
    """512x256 (the default 2^17 split): two DIFFERENT DIRECT table sets
    (names1 != names2 indexing) through the single-pass kernel."""
    from portfft_tpu.enums import Level
    from portfft_tpu.ops import pallas_global
    from portfft_tpu.planner import plan_1d

    cfg = DeviceConfig(vmem_bytes=64 * 2**20)
    n = 1 << 17
    plan = plan_1d(n, cfg, 4)
    assert plan.level == Level.GLOBAL
    g1p, g2p = plan.sub
    assert (g1p.n, g2p.n) == (512, 256)
    assert pallas_global.global_sq_supported(plan, cfg)

    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, -1, bank)
    arrs = bank.device_arrays()
    batch = 1
    rng = np.random.default_rng(13)
    raw = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = pallas_global.global_sq_raw_call(
        jnp.asarray(raw), batch, plan, -1, keys, arrs, cfg, scale=2.0
    )
    assert out is not None
    gc = np.asarray(out).view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(raw.view(np.complex64).reshape(batch, n)) * 2.0
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global_sq_fused_sub_parity():
    """The single-pass kernel on a GLOBAL plan whose g1 is FUSED [8, 128]
    (the _lane_dft two-stage path) matches np.fft in interpret mode."""
    from portfft_tpu.enums import Level
    from portfft_tpu.ops import pallas_global
    from portfft_tpu.planner import Plan1D, plan_1d

    cfg = DeviceConfig(vmem_bytes=64 * 2**20)
    n1, n2 = 1024, 128
    n = n1 * n2
    sub1, sub2 = plan_1d(n1, cfg, 4), plan_1d(n2, cfg, 4)
    assert sub1.level == Level.FUSED and sub2.level == Level.DIRECT
    plan = Plan1D(n=n, level=Level.GLOBAL, factors=[], sub=(sub1, sub2))
    assert pallas_global.global_sq_supported(plan, cfg)

    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, -1, bank)
    arrs = bank.device_arrays()
    batch = 2
    rng = np.random.default_rng(7)
    raw = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = pallas_global.global_sq_raw_call(
        jnp.asarray(raw), batch, plan, -1, keys, arrs, cfg
    )
    assert out is not None
    gc = np.asarray(out).view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(raw.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global_sq_bt2_parity():
    """The {"eng": 5, "bt": 2} variant (two batch rows per block — the
    autotuner enumerates it) stays correct: a fast-but-wrong variant
    would be persisted untested, the tuner never checks outputs."""
    from portfft_tpu import fastpath
    from portfft_tpu.ops import pallas_global

    n, batch = 65536, 4
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch
    ).commit(use_pallas=True)
    assert pallas_global.global_sq_supported(plan.plans[n], plan.config)
    entry = plan._raw_fast.get(Direction.FORWARD)
    rng = np.random.default_rng(17)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 5, "bt": 2},
    )
    if fn is None:
        import pytest

        pytest.skip("bt=2 block does not fit this config's VMEM estimate")
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n))
    gc = got.view(np.complex64).reshape(batch, n)
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global_fused_engine_parity():
    """The fused persistent-scratch engine ({"eng": 6}) matches np.fft with
    multi-tile phases (nA=4, nB=2 at t1=64, t2=128) including the folded
    scale — exercises the clamped block index maps and the scratch planes
    persisting across grid steps."""
    from portfft_tpu import fastpath
    from portfft_tpu.ops import pallas_global

    n, batch = 65536, 3
    plan = pfft.Descriptor(
        lengths=[n], number_of_transforms=batch, forward_scale=0.5
    ).commit(use_pallas=True)
    assert pallas_global.global_fused_supported(plan.plans[n], plan.config)
    entry = plan._raw_fast.get(Direction.FORWARD)
    assert entry is not None and entry[0] == "global2"
    rng = np.random.default_rng(23)
    x = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    fn = fastpath.build_fn(
        plan, Direction.FORWARD, entry, 2 * batch * n,
        overrides={"eng": 6, "t1": 64, "t2": 128},
    )
    got = np.asarray(fn(jnp.asarray(x), plan._bank_arrays))
    ref = np.fft.fft(x.view(np.complex64).reshape(batch, n)) * 0.5
    gc = got.view(np.complex64).reshape(batch, n)
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global_fused_engine_fused_sub_parity():
    """eng 6 on a GLOBAL plan whose g1 is FUSED [8, 128] — the streamed
    Z-table phase-A path with clamped twiddle index maps."""
    from portfft_tpu.enums import Level
    from portfft_tpu.ops import pallas_global
    from portfft_tpu.planner import Plan1D

    cfg = DeviceConfig(vmem_bytes=64 * 2**20)
    n1, n2 = 1024, 128
    n = n1 * n2
    sub1, sub2 = plan_1d(n1, cfg, 4), plan_1d(n2, cfg, 4)
    assert sub1.level == Level.FUSED and sub2.level == Level.DIRECT
    plan = Plan1D(n=n, level=Level.GLOBAL, factors=[], sub=(sub1, sub2))
    assert pallas_global.global_fused_supported(plan, cfg)

    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, -1, bank)
    arrs = bank.device_arrays()
    batch = 2
    rng = np.random.default_rng(29)
    raw = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = pallas_global.global_fused_raw_call(
        jnp.asarray(raw), batch, plan, -1, keys, arrs, cfg,
        t1_override=64, t2_override=128,
    )
    assert out is not None
    gc = np.asarray(out).view(np.complex64).reshape(batch, n)
    ref = np.fft.fft(raw.view(np.complex64).reshape(batch, n))
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_global_fused_engine_backward_distinct_subs():
    """eng 6 backward (sign=+1) on the 512x256 split: distinct DIRECT
    table sets and the non-shared tabs2 indexing."""
    from portfft_tpu.enums import Level
    from portfft_tpu.ops import pallas_global

    cfg = DeviceConfig(vmem_bytes=64 * 2**20)
    n = 1 << 17
    plan = plan_1d(n, cfg, 4)
    assert plan.level == Level.GLOBAL
    assert pallas_global.global_fused_supported(plan, cfg)

    bank = xla_fft.TwiddleBank(np.float32)
    keys = xla_fft.collect_bank_keys(plan, +1, bank)
    arrs = bank.device_arrays()
    batch = 1
    rng = np.random.default_rng(31)
    raw = rng.uniform(-1, 1, 2 * batch * n).astype(np.float32)
    out = pallas_global.global_fused_raw_call(
        jnp.asarray(raw), batch, plan, +1, keys, arrs, cfg
    )
    assert out is not None
    gc = np.asarray(out).view(np.complex64).reshape(batch, n)
    ref = np.fft.ifft(raw.view(np.complex64).reshape(batch, n)) * n
    rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_kstackr_matmul_matches_kara():
    """The one-matmul stacked right-DFT (mat_kstack_r + kstackr_matmul_last)
    matches the Karatsuba form and the f64 reference at the x3 error floor,
    including a folded scale."""
    import jax.numpy as jnp

    from portfft_tpu.ops import xla_fft
    from portfft_tpu.ops.pallas_fft import (
        kara_matmul_last,
        kstackr_matmul_last,
    )

    bank = xla_fft.TwiddleBank(np.float32)
    w = bank.dft(256, -1)
    kk = bank.mat_kara(w)
    ks = bank.mat_kstack_r(w, scale=0.5)
    arrs = bank.device_arrays()
    rng = np.random.default_rng(0)
    ar = jnp.asarray(rng.uniform(-1, 1, (64, 256)).astype(np.float32))
    ai = jnp.asarray(rng.uniform(-1, 1, (64, 256)).astype(np.float32))
    kr, ki = kara_matmul_last(ar, ai, [arrs[kk + str(j)] for j in range(1, 7)])
    sr, si = kstackr_matmul_last(ar, ai, arrs[ks + "k"])
    ref = (np.asarray(ar) + 1j * np.asarray(ai)) @ (
        bank.host[w + "r"] + 1j * bank.host[w + "i"]
    )

    def rel(x, r):
        return np.linalg.norm(np.asarray(x) - r) / np.linalg.norm(r)

    assert rel(sr * 2, ref.real) < 1e-5
    assert rel(si * 2, ref.imag) < 1e-5
    assert rel(sr * 2, np.asarray(kr)) < 2e-5


def test_global_fused_engine_ftw_parity():
    """eng 6 with the factored-resident twiddle ({"ftw": 1}): both the
    DIRECT-G1 (Q tables) and FUSED-G1 (ZQ tables) paths match the dense
    default — the variant the autotuner races to drop the fused engine's
    third HBM stream."""
    from portfft_tpu.enums import Level
    from portfft_tpu.ops import pallas_global
    from portfft_tpu.planner import Plan1D

    cfg = DeviceConfig(vmem_bytes=64 * 2**20)
    for n1, n2 in ((512, 128), (1024, 128)):
        n = n1 * n2
        sub1, sub2 = plan_1d(n1, cfg, 4), plan_1d(n2, cfg, 4)
        plan = Plan1D(n=n, level=Level.GLOBAL, factors=[], sub=(sub1, sub2))
        assert pallas_global.global_fused_supported(plan, cfg)
        bank = xla_fft.TwiddleBank(np.float32)
        keys = xla_fft.collect_bank_keys(plan, -1, bank)
        arrs = bank.device_arrays()
        rng = np.random.default_rng(41 + n1)
        raw = rng.uniform(-1, 1, 2 * n).astype(np.float32)
        kw = dict(t1_override=64, t2_override=128)
        ref = np.fft.fft(raw.view(np.complex64).reshape(1, n))
        for use_ftw in (False, True):
            out = pallas_global.global_fused_raw_call(
                jnp.asarray(raw), 1, plan, -1, keys, arrs, cfg,
                use_ftw=use_ftw, **kw,
            )
            assert out is not None
            gc = np.asarray(out).view(np.complex64).reshape(1, n)
            rel = np.linalg.norm(gc - ref) / np.linalg.norm(ref)
            assert rel < 1e-4, (n1, use_ftw, rel)
