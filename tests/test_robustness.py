"""Executor robustness: batch chunking and kernel-rejection fallback."""

import dataclasses

import numpy as np
import pytest

import oracle
from portfft_tpu import Descriptor, Direction


def test_batch_chunking_matches_oracle():
    desc = Descriptor(lengths=[1024], number_of_transforms=8)
    plan = desc.commit()
    # Budget small enough for 2 transforms per chunk -> lax.map over 4 chunks
    plan.config = dataclasses.replace(
        plan.config, hbm_chunk_bytes=2 * 16 * 4 * 1024
    )
    x = oracle.gen_input(desc, 0)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_batch_chunking_at_global_size():
    """The lax.map chunking path on a GLOBAL-level plan (two-pass engine
    intermediates inside the mapped body) — round-2 review flagged that
    the weakest paths had the thinnest tests."""
    n = 65536
    desc = Descriptor(lengths=[n], number_of_transforms=4)
    plan = desc.commit()
    plan._raw_fast.clear()  # force the plane executor (the chunked path)
    plan.config = dataclasses.replace(
        plan.config, hbm_chunk_bytes=2 * 16 * 4 * n
    )
    x = oracle.gen_input(desc, 5)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_chunking_skips_non_divisible_batches():
    desc = Descriptor(lengths=[256], number_of_transforms=7)
    plan = desc.commit()
    plan.config = dataclasses.replace(plan.config, hbm_chunk_bytes=16 * 4 * 256)
    x = oracle.gen_input(desc, 1)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)


def test_pallas_rejection_falls_back(monkeypatch):
    """A leaf kernel rejected at trace/compile time must not break compute:
    the affected entry retries on the XLA executor and still returns
    correct results — while the plan as a whole keeps Pallas enabled."""
    desc = Descriptor(lengths=[256], number_of_transforms=4)
    plan = desc.commit(use_pallas=True)

    from portfft_tpu.ops import pallas_fft

    def exploding_leaf(*a, **k):
        raise RuntimeError("synthetic Mosaic rejection")

    monkeypatch.setattr(pallas_fft, "leaf_dispatch", exploding_leaf)
    # also kill the raw fast path so the leaf is actually reached
    plan._raw_fast.clear()

    x = oracle.gen_input(desc, 2)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)
    assert plan.use_pallas is True  # fallback is per-entry, not global
    assert len(plan._xla_only_keys) == 1


def test_pallas_rejection_is_per_entry_key(monkeypatch):
    """One rejected shape pins only ITS entry to XLA; a subsequent entry of
    the same plan still runs Pallas (reference narrows per kernel,
    committed_descriptor_impl.hpp:568-572)."""
    desc = Descriptor(lengths=[512], number_of_transforms=4)
    plan = desc.commit(use_pallas=True)
    plan._raw_fast.clear()

    from portfft_tpu.ops import pallas_fft

    real_dispatch = pallas_fft.leaf_dispatch
    calls = {"n": 0, "pallas_after": 0}

    def flaky_leaf(*a, **k):
        calls["n"] += 1
        raise RuntimeError("synthetic Pallas block shape rejection")

    monkeypatch.setattr(pallas_fft, "leaf_dispatch", flaky_leaf)
    x = oracle.gen_input(desc, 3)
    ref = oracle.reference_output(desc, x, Direction.FORWARD)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    out = np.asarray(plan.compute_forward(flat))
    oracle.verify(desc, out, ref, Direction.FORWARD, check_padding=False)
    assert calls["n"] >= 1 and plan._xla_only_keys

    # second entry (backward direction = a different key): Pallas again
    def counting_leaf(*a, **k):
        calls["pallas_after"] += 1
        return real_dispatch(*a, **k)

    monkeypatch.setattr(pallas_fft, "leaf_dispatch", counting_leaf)
    refb = oracle.reference_output(desc, x, Direction.BACKWARD)
    outb = np.asarray(plan.compute_backward(flat))
    oracle.verify(desc, outb, refb, Direction.BACKWARD, check_padding=False)
    assert calls["pallas_after"] >= 1  # Pallas leaf reached, not disabled


def test_non_compile_bug_reraises(monkeypatch):
    """Exceptions that are not kernel-compiler rejections must surface, not
    silently fall back."""
    desc = Descriptor(lengths=[128], number_of_transforms=2)
    plan = desc.commit(use_pallas=True)
    plan._raw_fast.clear()

    from portfft_tpu.ops import pallas_fft

    def buggy_leaf(*a, **k):
        raise TypeError("a genuine bug, not a kernel rejection")

    monkeypatch.setattr(pallas_fft, "leaf_dispatch", buggy_leaf)
    x = oracle.gen_input(desc, 4)
    flat = oracle.materialize(desc, x, Direction.FORWARD)
    with pytest.raises(TypeError, match="genuine bug"):
        plan.compute_forward(flat)


def test_workspace_len_accounts_for_bluestein():
    desc = Descriptor(lengths=[65537], number_of_transforms=1)
    plan = desc.commit()
    # the padded convolution dominates (9·2^14 = 147456 ≥ 2n-1)
    conv_n = plan.plans[65537].conv.n
    assert conv_n >= 2 * 65537 - 1
    assert plan._workspace_len() >= conv_n


def test_vmem_exhaustion_matcher_excludes_hbm_oom():
    """HBM allocation failures also print RESOURCE_EXHAUSTED / 'Ran out of
    memory' but are NOT the typed on-chip (VMEM) exhaustion — rebranding
    them as OutOfVmemError (an UnsupportedConfiguration subclass) would let
    capability probes swallow genuine out-of-memory conditions."""
    from portfft_tpu.committed import _is_vmem_exhaustion

    assert _is_vmem_exhaustion(
        RuntimeError("Mosaic: Ran out of memory in memory space vmem")
    )
    assert _is_vmem_exhaustion(RuntimeError("scoped VMEM limit exceeded"))
    assert not _is_vmem_exhaustion(
        RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 17179869184 "
            "bytes (HBM)"
        )
    )
    assert not _is_vmem_exhaustion(
        RuntimeError("Ran out of memory while allocating device buffer")
    )
