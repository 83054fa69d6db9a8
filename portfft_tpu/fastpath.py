"""Raw-I/O fast-path registry and dispatch.

1D PACKED interleaved fp32 transforms — the hot production shapes and the
reference's headline benchmark configurations — bypass the generic
gather/compute/scatter executor and run as single-buffer Pallas kernels
(ops/pallas_fft.py, ops/pallas_global.py), saving the separate
de/interleaving HBM passes:

| plan level | kernel | mechanism |
|---|---|---|
| DIRECT  | ``direct_raw_call``    | interleaved block-diagonal DFT matmul |
| FUSED   | ``fused2_raw_v2_call`` | layout-L two-stage pipeline, in-kernel de/interleave |
| GLOBAL  | ``global2_raw_call``   | two passes, interleave folded into tile transposes |

Registration happens at commit time (conditions: layouts PACKED both
domains, zero offsets, fp32, scale folded into tables/epilogues); dispatch
happens per compute call and silently declines on buffer-shape mismatch or
kernel rejection.
"""

from __future__ import annotations

from .enums import Direction, Domain, Layout, Level, Placement
from .enums import inv as _inv
from .utils.layout import get_layout


class RawFastUnavailable(Exception):
    """Raised during tracing when a fast-path kernel declines the shape
    (e.g. batch not divisible by any viable tile); caller falls back."""


_SIGNS = {Direction.FORWARD: -1, Direction.BACKWARD: +1}


def _entry_1d(committed, plan0, n0: int, batch: int, sign: int,
              scale: float):
    """Build the raw fast-path entry for one 1D PACKED transform (DIRECT /
    GLOBAL / fused2), or None when no raw kernel covers it.  Shared by the
    COMPLEX registration and the REAL half-length wrapper (which runs the
    n/2-point sub-transform through the same kernels)."""
    from .ops import pallas_fft, pallas_global

    bank = committed._bank
    keys = committed._bank_keys
    total = batch * n0
    if plan0.level == Level.DIRECT:
        # this kernel has no extra scratch: allow a larger share of
        # VMEM than the general budget (restores 4096-lane blocks at
        # N=256 while keeping the 512-point V table in bounds)
        sup = pallas_fft.direct_raw_supported(
            n0, total, int(committed.config.vmem_bytes * 0.75)
        )
        if sup:
            chunk, rt = sup
            key = bank.vmat(n0, sign, chunk, scale)
            return ("direct", key, chunk, rt, total)
        return None
    if plan0.level == Level.GLOBAL:
        from .ops import pallas_global3

        g3info = None
        if pallas_global3.global3_supported(plan0, committed.config):
            g1p, g2p = plan0.sub
            names_by_t1 = {}
            for t1 in pallas_global3.T1_CANDIDATES:
                if g2p.n % t1:
                    continue
                names_by_t1[t1] = pallas_global3.p1_table_names(
                    g1p, n0, t1, sign, bank
                )
            if names_by_t1:
                vs = bank.vmat_split(g2p.n, sign, 1, scale)
                g3info = (names_by_t1, vs)
        if g3info or pallas_global.global2_raw_supported(
            plan0, committed.config.direct_threshold
        ):
            return ("global2", sign, scale, total, g3info)
        return None
    if plan0.level == Level.FUSED and pallas_fft.fused2_raw_supported(
        n0, plan0, batch
    ):
        a0 = plan0.factors[0]
        wa = keys[("W", a0, sign)]
        tk = keys[("T", a0, 128, sign)]
        tu = bank.twiddle_fm(a0, 128, sign)
        wb = keys[("W", 128, sign)]
        # v2 folds g output rows into dense lanes; its stage-B table has
        # columns pre-permuted to land the fold in natural order.
        g = pallas_fft.fold_factor(a0)
        wb2 = bank.dft_permuted(128, sign, g) if g > 1 else wb
        names_v1 = [
            wa + "r", wa + "i", tk + "r", tk + "i", wb + "r", wb + "i",
        ]
        names_v2 = [
            wa + "r", wa + "i", tu + "r", tu + "i", wb2 + "r", wb2 + "i",
        ]
        # v3 (interleaved stages): pair-expanded twiddle + split-output
        # stage-B tables with the fold permutation and scale folded in.
        te = bank.twiddle_expanded(a0, 128, sign)
        vs = bank.vmat_split(128, sign, max(g, 1), scale)
        names_v3 = [
            wa + "r", wa + "i", te + "r", te + "i", vs + "r", vs + "i",
        ]
        # mm (default): one-matmul K/M-stacked stage A + Karatsuba
        # stage B with presplit bf16 tables, scale folded into Q.
        names_mm = None
        if g > 0:
            ks = bank.dft_kstack(a0, sign)
            kq = bank.mat_kara(wb2, scale)
            names_mm = [ks + "k", tu + "r", tu + "i"] + [
                kq + str(j) for j in range(1, 7)
            ]
        return (
            "fused2", (names_v1, names_v2, names_v3, names_mm), scale,
            total,
        )
    return None


def register(committed) -> dict:
    """Build the per-direction fast-path table for a committed plan."""
    d = committed.descriptor
    out: dict = {}
    if not (
        committed.use_pallas
        and committed.precision.name == "float32"
    ):
        return out
    if d.domain != Domain.COMPLEX:
        return _register_real(committed)
    if len(d.lengths) >= 2:
        return _register_multidim(committed)
    n0 = d.lengths[0]
    plan0 = committed.plans[n0]
    if plan0.level not in (Level.DIRECT, Level.FUSED, Level.GLOBAL):
        return out

    bank = committed._bank
    for direction, sign in (
        (Direction.FORWARD, -1),
        (Direction.BACKWARD, +1),
    ):
        out_dir = _inv(direction)
        if d.get_offset(direction) or d.get_offset(out_dir):
            continue
        lin = get_layout(d, direction)
        lout = get_layout(d, out_dir)
        scale = float(d.get_scale(direction))
        if (
            lin == Layout.BATCH_INTERLEAVED
            and lout == Layout.BATCH_INTERLEAVED
        ):
            # BI layout (n, 2·batch) IS a column transform: the sublane-
            # major kernel covers DIRECT and fused [a, 128] sizes with the
            # re/im lane pairs untouched (ops/pallas_multidim.py).
            from .ops import pallas_multidim

            if pallas_multidim.col_axis_supported(
                plan0, committed.config.direct_threshold
            ):
                names = pallas_multidim.col_table_names(plan0, sign, bank)
                names_mm = pallas_multidim.col_mm_table_names(
                    plan0, sign, bank
                )
                out[direction] = (
                    "bi_col", names, scale, d.number_of_transforms * n0,
                    names_mm,
                )
            continue
        in_reg = out_reg = None
        if lin != Layout.PACKED or lout != Layout.PACKED:
            # regular strided rectangles run the PACKED kernels behind
            # streaming Pallas destride/restride passes (pallas_io) —
            # the XLA strided-slice path costs ~15x the packed rate
            # (round-4 VERDICT weak #3).  Reference: in-kernel md_view
            # strided copies, memory_views.hpp:126-229.
            from .ops import pallas_io

            if d.placement != Placement.OUT_OF_PLACE:
                continue
            b = d.number_of_transforms
            if lin != Layout.PACKED:
                reg = (
                    committed._regular_1d(direction)
                    if lin == Layout.UNPACKED else None
                )
                if reg is None or b <= 1:
                    continue
                _, s_i, dist_i, _, _ = reg
                if not pallas_io.destride_supported(n0, s_i, dist_i, b):
                    continue
                in_reg = (s_i, dist_i)
            if lout != Layout.PACKED:
                reg = (
                    committed._regular_1d(out_dir)
                    if lout == Layout.UNPACKED else None
                )
                if reg is None or b <= 1:
                    continue
                _, s_o, dist_o, _, _ = reg
                if not pallas_io.restride_supported(n0, s_o, dist_o, b):
                    continue
                out_reg = (s_o, dist_o)
        entry = _entry_1d(
            committed, plan0, n0, d.number_of_transforms, sign, scale
        )
        if entry is not None:
            if in_reg or out_reg:
                entry = ("strided1d", entry, in_reg, out_reg)
            out[direction] = entry
    return out


def _register_real(committed) -> dict:
    """REAL-domain raw fast path: the PACKED real buffer doubles as the
    interleaved raw buffer of the half-length transform; a single Pallas
    un/retangle pass replaces the strided slices, spectrum flips and
    interleaves of the plane path (committed._core_real_forward).
    Registered only when the half-length packing is active (even n ≥ 1024,
    committed.py) and its plan has a raw kernel."""
    from .ops import pallas_real

    d = committed.descriptor
    out: dict = {}
    if (
        d.domain != Domain.REAL
        or len(d.lengths) != 1
        or d.complex_storage.name != "INTERLEAVED_COMPLEX"
    ):
        return out
    n0 = d.lengths[0]
    batch = d.number_of_transforms
    if ("R", n0, -1) not in committed._bank_keys:
        # half-length packing inactive (small or odd-half n): small-n
        # transforms run as ONE constant block-diagonal matmul
        # (pallas_real.small_real_raw_call) — the plane path's separate
        # slice/flip/untangle sweeps ran N=32 at ~5% of ceiling
        if not pallas_real.small_supported(n0, batch):
            return out
        g = pallas_real.small_group(n0)
        for direction, sign in (
            (Direction.FORWARD, -1),
            (Direction.BACKWARD, +1),
        ):
            out_dir = _inv(direction)
            if d.get_offset(direction) or d.get_offset(out_dir):
                continue
            if not (
                get_layout(d, direction) == Layout.PACKED
                and get_layout(d, out_dir) == Layout.PACKED
            ):
                continue
            scale = float(d.get_scale(direction))
            tkey = committed._bank.real_small(n0, g, sign, scale)
            kind = (
                "realsf" if direction == Direction.FORWARD else "realsb"
            )
            out[direction] = (kind, tkey, scale)
        return out
    if not pallas_real.supported(n0, batch):
        return out
    if pallas_real._pick_bt(
        batch, n0 // 2, committed.config.vmem_budget
    ) is None:
        # no viable un/retangle tiling (bt·h must be a 128²-multiple,
        # bt divisible by 8 per Mosaic's block rule, working set in
        # VMEM): registering would only decline at run time.  Wide
        # spectra (h ≥ 2^15) fall here and keep the XLA plane path —
        # the column-chunked wide untangle measured 5x SLOWER than the
        # plane path on chip (round-5 negative result, pallas_real
        # untangle_raw_call comment).
        return out
    h = n0 // 2
    plan_h = committed.plans[h]
    for direction, sign in (
        (Direction.FORWARD, -1),
        (Direction.BACKWARD, +1),
    ):
        out_dir = _inv(direction)
        if d.get_offset(direction) or d.get_offset(out_dir):
            continue
        if not (
            get_layout(d, direction) == Layout.PACKED
            and get_layout(d, out_dir) == Layout.PACKED
        ):
            continue
        sub = _entry_1d(committed, plan_h, h, batch, sign, 1.0)
        if sub is None:
            continue
        rkey = committed._bank_keys[("R", n0, sign)]
        scale = float(d.get_scale(direction))
        kind = "realf" if direction == Direction.FORWARD else "realb"
        out[direction] = (kind, sub, [rkey + "r", rkey + "i"], scale)
    return out


def _register_multidim(committed) -> dict:
    """Multi-dim raw pipeline: the last axis runs through the 1D raw
    kernels at batch B·prod(lengths[:-1]); every outer axis runs the
    sublane-major column kernel (ops/pallas_multidim.py) — one HBM round
    trip per axis, no separate de/interleave passes (reference counterpart:
    dispatch_dimensions' per-slice BATCH_INTERLEAVED kernels,
    committed_descriptor_impl.hpp:899-950)."""
    from .ops import pallas_fft, pallas_multidim

    d = committed.descriptor
    out: dict = {}
    bank = committed._bank
    n_last = d.lengths[-1]
    plan_last = committed.plans[n_last]
    if not all(
        pallas_multidim.col_axis_supported(
            committed.plans[ln], committed.config.direct_threshold
        )
        for ln in d.lengths[:-1]
        if ln > 1
    ):
        return out
    total = d.number_of_transforms * d.get_flattened_length()
    batch_last = total // n_last
    for direction, sign in (
        (Direction.FORWARD, -1),
        (Direction.BACKWARD, +1),
    ):
        out_dir = _inv(direction)
        if d.get_offset(direction) or d.get_offset(out_dir):
            continue
        if not (
            get_layout(d, direction) == Layout.PACKED
            and get_layout(d, out_dir) == Layout.PACKED
        ):
            continue
        scale = float(d.get_scale(direction))
        # NOTE: deliberately narrower than _entry_1d — the multidim row
        # pass keeps only the mm/v2 kernels (no v1/v3 fallbacks) and
        # declines fused plans without a fold factor; 1D-only variants
        # would complicate the per-axis pipeline for no measured gain.
        last = None
        if plan_last.level == Level.DIRECT:
            sup = pallas_fft.direct_raw_supported(
                n_last, total, int(committed.config.vmem_bytes * 0.75)
            )
            if sup:
                chunk, rt = sup
                key = bank.vmat(n_last, sign, chunk, 1.0)
                last = ("direct", key, chunk, rt)
        elif plan_last.level == Level.FUSED and pallas_fft.fused2_raw_supported(
            n_last, plan_last, batch_last
        ):
            a0 = plan_last.factors[0]
            g = pallas_fft.fold_factor(a0)
            if g > 0:
                wa = bank.dft(a0, sign)
                tu = bank.twiddle_fm(a0, 128, sign)
                wb = (
                    bank.dft_permuted(128, sign, g)
                    if g > 1
                    else bank.dft(128, sign)
                )
                ks = bank.dft_kstack(a0, sign)
                kq = bank.mat_kara(wb, 1.0)
                last = ("fused2", [
                    wa + "r", wa + "i", tu + "r", tu + "i", wb + "r",
                    wb + "i",
                ], [ks + "k", tu + "r", tu + "i"] + [
                    kq + str(j) for j in range(1, 7)
                ])
        if last is None:
            continue
        cols = [
            pallas_multidim.col_table_names(committed.plans[ln], sign, bank)
            if ln > 1
            else None
            for ln in d.lengths[:-1]
        ]
        cols_mm = [
            pallas_multidim.col_mm_table_names(
                committed.plans[ln], sign, bank
            )
            if ln > 1
            else None
            for ln in d.lengths[:-1]
        ]
        out[direction] = (
            "multidim", sign, scale, total, last, cols, cols_mm
        )
    return out


def build_fn(committed, direction, entry, flat_len: int, overrides=None,
             plan_n: int | None = None):
    """Return a traced callable ``fn(raw, bank) -> raw`` for this entry, or
    None when the buffer length does not match the registered shape.

    Tile parameters come from ``overrides`` (autotune measuring a variant),
    else the tuned table for this device/shape (tuning.py), else the static
    heuristics in the kernel modules.  ``plan_n`` overrides the transform
    length (the REAL wrapper runs its n/2 sub-entry through here)."""
    from . import tuning
    from .ops import pallas_fft, pallas_global

    d = committed.descriptor
    kind = entry[0]
    explicit = overrides is not None  # autotune measuring a variant
    if overrides is None:
        overrides = tuning.lookup(
            committed.config.name, kind, tuning._entry_key(committed, kind)
        ) or {}
    if kind in ("realf", "realb"):
        from .ops import pallas_real

        _, sub, rnames, scale = entry
        n0 = d.lengths[0]
        h = n0 // 2
        batch = d.number_of_transforms
        if kind == "realf" and flat_len != batch * n0:
            return None
        if kind == "realb" and flat_len != batch * (n0 + 2):
            return None
        # the sub-transform reuses any 1D tuning measured at its length
        # (global2 winners are keyed by split: n{h}_g{G1}x{G2}); an
        # explicit overrides= from the autotuner applies to the sub —
        # REAL entries enumerate (and record) the sub's variant space
        if explicit:
            sub_over = overrides
        else:
            if sub[0] == "global2":
                hp = committed.plans[h]
                sub_key = f"n{h}_g{hp.sub[0].n}x{hp.sub[1].n}"
            else:
                sub_key = f"n{h}"
            sub_over = tuning.lookup(
                committed.config.name, sub[0], sub_key
            ) or {}
        subfn = build_fn(
            committed, direction, sub, 2 * batch * h,
            overrides=sub_over, plan_n=h,
        )
        if subfn is None:
            return None
        if kind == "realf":

            def fn(raw, bank):
                z = subfn(raw, bank)
                res = pallas_real.untangle_raw_call(
                    z, batch, n0, [bank[nm] for nm in rnames],
                    committed.config, scale,
                )
                if res is None:
                    raise RawFastUnavailable()
                return res

        else:

            def fn(raw, bank):
                zin = pallas_real.retangle_raw_call(
                    raw, batch, n0, [bank[nm] for nm in rnames],
                    committed.config, scale,
                )
                if zin is None:
                    raise RawFastUnavailable()
                return subfn(zin, bank)

        return fn
    if kind in ("realsf", "realsb"):
        from .ops import pallas_real

        _, tkey, scale = entry
        n0 = d.lengths[0]
        b = d.number_of_transforms
        expect = b * n0 if kind == "realsf" else b * (n0 + 2)
        if flat_len != expect:
            return None
        sgn = -1 if kind == "realsf" else +1

        def fn(raw, bank):
            res = pallas_real.small_real_raw_call(
                raw, b, n0, sgn, bank[tkey + "k"], committed.config
            )
            if res is None:
                raise RawFastUnavailable()
            return res

        return fn
    if kind == "strided1d":
        import jax
        import jax.numpy as jnp

        from .ops import pallas_io

        _, inner, in_reg, out_reg = entry
        n0 = plan_n or d.lengths[0]
        b = d.number_of_transforms
        if in_reg is not None:
            s_i, dist_i = in_reg
            full = 2 * b * dist_i
            span = (n0 - 1) * s_i + 1
            need_in = 2 * ((b - 1) * dist_i + span)
            if flat_len not in (full, need_in):
                return None
        else:
            full = need_in = 2 * b * n0
            if flat_len != full:
                return None
        subfn = build_fn(
            committed, direction, inner, 2 * b * n0,
            overrides=overrides if explicit else None, plan_n=n0,
        )
        if subfn is None:
            return None
        interp = jax.default_backend() != "tpu"
        need_out = 2 * committed.descriptor.get_output_count(direction)

        def fn(raw, bank):
            x = raw
            if in_reg is not None:
                if flat_len != full:
                    x = jnp.pad(x, (0, full - flat_len))
                x = pallas_io.destride(
                    x.reshape(b, 2 * in_reg[1]), n0, in_reg[0],
                    interpret=interp,
                ).reshape(-1)
            y = subfn(x, bank)
            if out_reg is not None:
                s_o, dist_o = out_reg
                y = pallas_io.restride(
                    y.reshape(b, 2 * n0), n0, s_o, dist_o,
                    interpret=interp,
                ).reshape(-1)
            if y.shape[0] > need_out:
                y = y[:need_out]
            return y

        return fn
    if kind == "bi_col":
        _, names, scale, total, names_mm = entry
        if flat_len != 2 * total:
            return None
        from .ops import pallas_multidim

        n0 = d.lengths[0]
        plan0 = committed.plans[n0]
        sign = _SIGNS[direction]
        rest2 = 2 * d.number_of_transforms
        ct_bi = overrides.get("ct", 0)
        ds_bi = bool(overrides.get("ds"))
        cm_bi = bool(overrides.get("cm")) and names_mm is not None

        def fn(raw, bank):
            res = None
            if cm_bi:
                res = pallas_multidim.col_raw_mm_call(
                    raw, 1, plan0, rest2, sign, names_mm, bank,
                    committed.config, committed.matmul_precision, scale,
                    ct_override=ct_bi, ds=ds_bi,
                )
            if res is None:
                res = pallas_multidim.col_raw_call(
                    raw, 1, plan0, rest2, sign, names, bank,
                    committed.config, committed.matmul_precision, scale,
                    ct_override=ct_bi, ds=ds_bi,
                )
            if res is None:
                raise RawFastUnavailable()
            return res

        return fn
    if kind == "multidim":
        import math

        _, sign, scale, total, last, cols, cols_mm = entry
        if flat_len != 2 * total:
            return None
        from .ops import pallas_multidim

        lengths = d.lengths
        batch_last = total // lengths[-1]
        plan_last = committed.plans[lengths[-1]]
        # the row pass reuses any 1D tuning for its length
        row_tuned = tuning.lookup(
            committed.config.name, "fused2", f"n{lengths[-1]}"
        ) or {}
        bt_row = row_tuned.get("bt")
        if bt_row and (
            batch_last % bt_row
            or last[0] != "direct"
            and (bt_row * plan_last.factors[0]) % 128
        ):
            bt_row = None  # stale/invalid tuning: let the kernel pick
        ct_col = overrides.get("ct", 0)  # column-pass lane tile
        ds_col = bool(overrides.get("ds"))
        cm_col = bool(overrides.get("cm"))
        # fused trailing-2D kernel (md2): both trailing axes in ONE HBM
        # round trip via the eng-6 persistent-scratch structure — default
        # when supported ({"m2": 0} disables; mt1/mt2 tile overrides)
        plan_a = (
            committed.plans[lengths[-2]]
            if len(lengths) >= 2 and lengths[-2] > 1
            else None
        )
        mt1 = overrides.get("mt1", 0)
        mt2 = overrides.get("mt2", 0)
        use_m2 = (
            overrides.get("m2", 1)
            and plan_a is not None
            and pallas_multidim.md2_supported(
                plan_a, plan_last, committed.config,
                # tuned/raced tile overrides were device-verified and may
                # use the kernel's 2x VMEM slack; the default stays strict
                slack=2.0 if (mt1 or mt2) else 1.0,
            )
        )

        def fn(raw, bank):
            if use_m2:
                x = pallas_multidim.md2_fused_raw_call(
                    raw, total // (lengths[-2] * lengths[-1]), plan_a,
                    plan_last, sign, committed._bank_keys, bank,
                    committed.config, committed.matmul_precision,
                    scale if len(lengths) == 2 else 1.0, mt1, mt2,
                )
                if x is not None:
                    for axis in range(len(lengths) - 3, -1, -1):
                        ln = lengths[axis]
                        if ln == 1:
                            continue
                        rest2 = 2 * math.prod(lengths[axis + 1 :])
                        bpre = d.number_of_transforms * math.prod(
                            lengths[:axis]
                        )
                        sc = scale if axis == 0 else 1.0
                        xc = None
                        if cm_col and cols_mm[axis] is not None:
                            xc = pallas_multidim.col_raw_mm_call(
                                x, bpre, committed.plans[ln], rest2, sign,
                                cols_mm[axis], bank, committed.config,
                                committed.matmul_precision, sc,
                                ct_override=ct_col, ds=ds_col,
                            )
                        if xc is None:
                            xc = pallas_multidim.col_raw_call(
                                x, bpre, committed.plans[ln], rest2, sign,
                                cols[axis], bank, committed.config,
                                committed.matmul_precision, sc,
                                ct_override=ct_col, ds=ds_col,
                            )
                        if xc is None:
                            raise RawFastUnavailable()
                        x = xc
                    if (
                        scale != 1.0
                        and len(lengths) > 2
                        and lengths[0] == 1
                    ):
                        x = x * scale  # the axis-0 column pass was a skip
                    return x
            if last[0] == "direct":
                _, key, chunk, rt = last
                x = pallas_fft.direct_raw_call(
                    raw, lengths[-1], bank[key + "v"], chunk, rt,
                    committed.config, committed.matmul_precision,
                )
            else:
                x = pallas_fft.fused2_raw_mm_call(
                    raw, batch_last, plan_last,
                    [bank[nm] for nm in last[2]], committed.config,
                    committed.matmul_precision, bt_override=bt_row,
                )
                if x is None:
                    x = pallas_fft.fused2_raw_v2_call(
                        raw, batch_last, plan_last,
                        [bank[nm] for nm in last[1]], committed.config,
                        committed.matmul_precision, 1.0, bt_override=bt_row,
                    )
                if x is None:
                    raise RawFastUnavailable()
            for axis in range(len(lengths) - 2, -1, -1):
                ln = lengths[axis]
                if ln == 1:
                    continue
                rest2 = 2 * math.prod(lengths[axis + 1 :])
                bpre = (
                    d.number_of_transforms * math.prod(lengths[:axis])
                )
                sc = scale if axis == 0 else 1.0
                xc = None
                if cm_col and cols_mm[axis] is not None:
                    xc = pallas_multidim.col_raw_mm_call(
                        x, bpre, committed.plans[ln], rest2, sign,
                        cols_mm[axis], bank, committed.config,
                        committed.matmul_precision, sc,
                        ct_override=ct_col, ds=ds_col,
                    )
                if xc is None:
                    xc = pallas_multidim.col_raw_call(
                        x, bpre, committed.plans[ln], rest2, sign,
                        cols[axis], bank, committed.config,
                        committed.matmul_precision, sc,
                        ct_override=ct_col, ds=ds_col,
                    )
                if xc is None:
                    raise RawFastUnavailable()
                x = xc
            if scale != 1.0 and lengths[0] == 1:
                x = x * scale  # every column pass was a length-1 skip
            return x

        return fn
    if kind == "direct":
        _, key, chunk, rt, total = entry
        if flat_len != 2 * total:
            return None
        rt_t = overrides.get("rt", rt)
        if (2 * total) % (chunk * rt_t):
            rt_t = rt

        n_direct = plan_n or d.lengths[0]

        def fn(raw, bank):
            return pallas_fft.direct_raw_call(
                raw, n_direct, bank[key + "v"], chunk, rt_t,
                committed.config, committed.matmul_precision,
            )

        return fn
    if kind == "global2":
        _, sign, scale, total, g3info = entry
        if flat_len != 2 * total:
            return None
        plan0 = committed.plans[plan_n or d.lengths[0]]
        batch = total // plan0.n
        keys = committed._bank_keys
        t1 = overrides.get("t1", 0)
        t2 = overrides.get("t2", 0)
        # engine selection: 2 = the plane two-pass engine (default — it
        # won every round-3 A/B, see docs/ROUND3.md), 3 = the interleaved
        # v3 engine, reachable via the autotuner's {"eng": 3} variants.
        # Plans only v3 covers (fused G1 with 128 % a != 0) force eng 3 —
        # the v2 engine declines them and the XLA executor is slower.
        v2_ok = pallas_global.global2_raw_supported(
            plan0, committed.config.direct_threshold
        )
        eng = overrides.get("eng", 2 if v2_ok else 3)
        fn3 = None
        if eng == 3 and g3info is not None:
            from .ops import pallas_global3

            names_by_t1, vs_name = g3info
            g1p, g2p = plan0.sub
            t1c = t1 or pallas_global3._pick_t1(
                g2p.n, g1p.n, int(committed.config.vmem_bytes * 3 / 4),
                g1p.level != Level.DIRECT,
            )
            names1 = names_by_t1.get(t1c)
            if names1:
                fn3 = pallas_global3.build_call(
                    plan0, sign, names1, vs_name, committed.config,
                    committed.matmul_precision, t1c, t2,
                )

        if fn3 is not None:

            def fn(raw, bank):
                return fn3(raw, batch, bank)

            return fn

        ftw = bool(overrides.get("ftw"))
        mm_o = overrides.get("mm")  # None = default-on at x3 precision

        sq_ok = eng == 5 and pallas_global.global_sq_supported(
            plan0, committed.config
        )
        f6_ok = eng == 6 and pallas_global.global_fused_supported(
            plan0, committed.config
        )
        from .ops import pallas_global_bf, pallas_global_ilv

        bf_ok = eng == 7 and pallas_global_bf.global_bf_supported(
            plan0, committed.config
        )
        ilv_ok = eng == 8 and pallas_global_ilv.global_ilv_supported(
            plan0, committed.config
        )
        bt5 = overrides.get("bt", 0)

        def fn(raw, bank):
            res = None
            if ilv_ok:
                res = pallas_global_ilv.global_ilv_raw_call(
                    raw, batch, plan0, sign, keys, bank, committed.config,
                    committed.matmul_precision, scale, t1_override=t1,
                )
            if sq_ok:
                res = pallas_global.global_sq_raw_call(
                    raw, batch, plan0, sign, keys, bank, committed.config,
                    committed.matmul_precision, scale, bt_override=bt5,
                )
            if bf_ok:
                if overrides.get("bf2"):
                    res = pallas_global_bf.global_bf2_raw_call(
                        raw, batch, plan0, sign, keys, bank,
                        committed.config, committed.matmul_precision, scale,
                        t1_override=t1, st3=overrides.get("st3", 1),
                        ta=overrides.get("ta", 0),
                    )
                if res is None and overrides.get("ov"):
                    # phase-overlay restructure (A(i) + B(i-1) per step);
                    # declines at shapes whose dual scratch overflows VMEM
                    res = pallas_global_bf.global_bf_ov_raw_call(
                        raw, batch, plan0, sign, keys, bank,
                        committed.config, committed.matmul_precision, scale,
                        t1_override=t1,
                    )
                if res is None:
                    res = pallas_global_bf.global_bf_raw_call(
                        raw, batch, plan0, sign, keys, bank, committed.config,
                        committed.matmul_precision, scale, t1_override=t1,
                    )
            if f6_ok:
                res = pallas_global.global_fused_raw_call(
                    raw, batch, plan0, sign, keys, bank, committed.config,
                    committed.matmul_precision, scale, t1, t2, use_ftw=ftw,
                )
            if res is None:
                # eng 5 declined (non-x3 precision / missing bf16 tables /
                # working set): the two-pass engine handles those cases —
                # a tuned {"eng": 5} must not disable the raw path
                res = pallas_global.global2_raw_call(
                    raw, batch, plan0, sign, keys, bank, committed.config,
                    committed.matmul_precision, scale,
                    t1 if eng == 2 else 0, t2 if eng == 2 else 0,
                    use_ftw=ftw,
                    use_mm=None if mm_o is None else bool(mm_o),
                    use_ds=bool(overrides.get("ds")),
                )
            if res is None:  # no viable pass tiling for this shape
                raise RawFastUnavailable()
            return res

        return fn
    # fused2
    _, (names_v1, names_v2, names_v3, names_mm), scale, total = entry
    if flat_len != 2 * total:
        return None
    plan0 = committed.plans[plan_n or d.lengths[0]]
    batch = total // plan0.n
    bt = overrides.get("bt")
    # engine default: 4 = the matmul-widened mm kernel (stacked stage A +
    # Karatsuba stage B) — the fused2 family measured MATMUL-bound, not
    # XPOSE-bound (probe_fused2_parts, 2026-08-17: mm_only 10.5 ms vs
    # full 12.25 at N=4096); widening the stage matmuls gained 171-179 →
    # 209 GB/s.  2 = the plane x3 kernel (fallback for HIGHEST
    # precision), 3 = the interleaved v3 kernel (lane rolls; loses at
    # most shapes).  The autotuner measures all and records per-shape
    # winners.
    eng = overrides.get("eng", 4)
    if bt and batch % bt:
        bt = None  # stale tuning (different batch): let the kernel pick
    if bt and eng in (2, 4) and (bt * plan0.factors[0]) % 128:
        bt = None

    def fn(raw, bank):
        res = None
        if eng == 3:
            res = pallas_fft.fused2_raw_v3_call(
                raw, batch, plan0, [bank[nm] for nm in names_v3],
                committed.config, committed.matmul_precision,
                bt_override=bt,
            )
        elif eng == 4 and names_mm is not None:
            res = pallas_fft.fused2_raw_mm_call(
                raw, batch, plan0, [bank[nm] for nm in names_mm],
                committed.config, committed.matmul_precision,
                bt_override=bt, flat=bool(overrides.get("flat")),
                ds=bool(overrides.get("ds")),
            )
        if res is None:
            res = pallas_fft.fused2_raw_v2_call(
                raw, batch, plan0, [bank[nm] for nm in names_v2],
                committed.config, committed.matmul_precision, scale,
                bt_override=bt if eng == 2 else None,
            )
        if res is None:
            res = pallas_fft.fused2_raw_call(
                raw, batch, plan0, [bank[nm] for nm in names_v1],
                committed.config, committed.matmul_precision, scale,
            )
        if res is None:
            raise RawFastUnavailable()
        return res

    return fn
