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
    """A leaf kernel blowing up at trace/compile time must not break
    compute: the plan flips to the XLA executor and still returns correct
    results."""
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
    assert plan.use_pallas is False


def test_workspace_len_accounts_for_bluestein():
    desc = Descriptor(lengths=[65537], number_of_transforms=1)
    plan = desc.commit()
    # padded convolution of 2^18 dominates
    assert plan._workspace_len() >= 1 << 18
