"""Fused trailing-2D multi-dim kernel (md2) in interpreter mode.

``ops/pallas_multidim.md2_fused_raw_call`` runs BOTH trailing axes of a
multi-dim transform in one Pallas kernel (one HBM round trip instead of
two) via the GLOBAL fused engine's persistent-scratch structure.  It is
the default whenever both trailing-axis plans have lane-DFT shapes and
128-multiple lengths; these tests pin parity against the NumPy oracle
for the default, the ``{"m2": 0}`` per-axis fallback, the tile
overrides, and the declining shapes."""


import numpy as np

import oracle
from portfft_tpu import Descriptor, Direction, fastpath
from portfft_tpu.ops import pallas_multidim

F = Direction.FORWARD
B = Direction.BACKWARD


def _run(desc, direction=F, overrides=None, seed=31):
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast[direction]
    assert entry[0] == "multidim"
    x = oracle.gen_input(desc, seed)
    ref = oracle.reference_output(desc, x, direction)
    flat = oracle.materialize(desc, x, direction)
    if overrides is None:
        compute = (
            plan.compute_forward if direction == F
            else plan.compute_backward
        )
        out = np.asarray(compute(flat))
    else:
        import jax.numpy as jnp

        total = desc.number_of_transforms * desc.get_flattened_length()
        fn = fastpath.build_fn(
            plan, direction, entry, 2 * total, overrides=overrides
        )
        raw = np.ascontiguousarray(flat).view(np.float32)
        out = np.asarray(fn(jnp.asarray(raw), plan._bank_arrays)).view(
            np.complex64
        )
    oracle.verify(desc, out, ref, direction, check_padding=False)
    return plan


def test_md2_supported_gate():
    desc = Descriptor(lengths=[256, 128], number_of_transforms=1)
    plan = desc.commit(use_pallas=True)
    cfg = plan.config
    assert pallas_multidim.md2_supported(
        plan.plans[256], plan.plans[128], cfg
    )
    # non-128-multiple axis declines
    desc2 = Descriptor(lengths=[96, 128], number_of_transforms=1)
    plan2 = desc2.commit(use_pallas=True)
    assert not pallas_multidim.md2_supported(
        plan2.plans[96], plan2.plans[128], cfg
    )


def test_md2_default_matches_oracle_2d():
    # DIRECT x DIRECT, square and non-square, forward and backward
    for lengths, b in ([128, 128], 3), ([256, 128], 2), ([128, 256], 2):
        _run(Descriptor(lengths=lengths, number_of_transforms=b))
        _run(Descriptor(lengths=lengths, number_of_transforms=b), B)


def test_md2_fused_axis_plans():
    # 1024 = FUSED [8, 128] as the leading (phase-A) and trailing
    # (phase-B) axis plan
    _run(Descriptor(lengths=[1024, 128], number_of_transforms=1))
    _run(Descriptor(lengths=[128, 1024], number_of_transforms=1))


def test_md2_m2_off_matches():
    # the per-axis pipeline ({"m2": 0}) and the fused default agree
    desc = Descriptor(lengths=[256, 128], number_of_transforms=2)
    _run(desc, overrides={"m2": 0})
    _run(desc, overrides={})


def test_md2_tile_overrides():
    for mt1, mt2 in ((64, 64), (128, 128), (64, 128)):
        _run(
            Descriptor(lengths=[256, 256], number_of_transforms=1),
            overrides={"mt1": mt1, "mt2": mt2},
            seed=mt1 + mt2,
        )


def test_md2_3d_trailing_pair():
    # 3D: md2 fuses the trailing pair, the leading axis keeps its column
    # pass (4 HBM sweeps total instead of 6)
    _run(Descriptor(lengths=[32, 128, 128], number_of_transforms=1))


def test_md2_scale_paths():
    # scale lands inside md2 for pure-2D, in the axis-0 column pass for
    # 3D, and in the trailing end-multiply when every outer axis is a skip
    _run(
        Descriptor(
            lengths=[128, 128], number_of_transforms=2, forward_scale=0.5
        )
    )
    _run(
        Descriptor(
            lengths=[32, 128, 128],
            number_of_transforms=1,
            forward_scale=0.25,
        )
    )
    _run(
        Descriptor(
            lengths=[1, 128, 128],
            number_of_transforms=2,
            forward_scale=2.0,
        )
    )


def test_md2_variants_enumerated():
    from portfft_tpu import tuning

    desc = Descriptor(lengths=[256, 256], number_of_transforms=1)
    plan = desc.commit(use_pallas=True)
    entry = plan._raw_fast[F]
    variants = tuning._variants_for_entry(plan, entry)
    assert {"m2": 0} in variants
    assert {"m2": 0, "cm": 1} in variants
    assert any("mt1" in v for v in variants)
    # every mt variant fits the VMEM estimate
    for v in variants:
        if "mt1" in v:
            assert pallas_multidim.md2_est_bytes(
                plan.plans[256], plan.plans[256], v["mt1"], v["mt2"]
            ) <= 2 * plan.config.vmem_bytes
