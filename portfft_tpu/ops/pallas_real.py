"""Raw-I/O kernels for the packed half-length REAL transforms.

The plane-domain R2C path (committed._core_real_forward) spends several
HBM sweeps outside the FFT itself: even/odd strided slices, the
flip/roll spectrum reversal, the Hermitian untangle, and the final
interleave.  These kernels collapse all of that around the existing raw
complex kernels:

* **forward**: the PACKED real buffer (b, n) *is* the interleaved raw
  buffer of z = x_even + i·x_odd — the half-length FFT runs the normal
  raw fast-path kernel with zero staging; ``untangle_raw_call`` then
  produces the final interleaved half spectrum (b, n+2) in ONE pass.
* **backward**: ``retangle_raw_call`` turns the half spectrum into the
  conjugate-packed Z spectrum in one pass; the raw backward kernel's
  interleaved output is the real result buffer directly.

The spectrum reversal Z[(h−k) mod h] inside the kernels is exact-by-
construction: it decomposes into a tile permutation (left-matmul with an
anti-identity / shifted anti-identity) and a lane permutation
(right-matmul), both 0/1 matrices applied with the bf16x3 scheme (the
two-term operand split reconstructs the fp32 value; the tables add no
rounding).  Reference counterpart: none (REAL throws,
committed_descriptor.hpp:134-137); the untangle math mirrors
committed._core_real_forward/_backward.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import xla_fft
from .pallas_fft import _const_spec, _interpret_mode, dump


def supported(n: int, batch: int) -> bool:
    """Even n with a 128-multiple half length (the in-kernel de/interleave
    and tile-permutation reversal walk 128-lane tiles)."""
    h = n // 2
    return n % 2 == 0 and h % 128 == 0 and h >= 256


def _perm_tables(h: int):
    """Reversal-permutation constants for R[k] = Z[(h−k) mod h] with
    k = kt·128 + kl: lanes kl ≥ 1 come from tile hh−1−kt, lane 128−kl
    (anti-identity J / lane matrix M1); lane kl = 0 comes from tile
    (hh−kt) mod hh, lane 0 (shifted anti-identity P / selector M0)."""
    hh = h // 128
    j = np.zeros((hh, hh), np.float32)
    p = np.zeros((hh, hh), np.float32)
    for t in range(hh):
        j[t, hh - 1 - t] = 1.0
        p[t, (hh - t) % hh] = 1.0
    m1 = np.zeros((128, 128), np.float32)
    for o in range(1, 128):
        m1[128 - o, o] = 1.0
    m0 = np.zeros((128, 128), np.float32)
    m0[0, 0] = 1.0
    return (
        jnp.asarray(j), jnp.asarray(p), jnp.asarray(m1), jnp.asarray(m0)
    )


def _perm_mm_l(w, data):
    """Permutation matmul (perm on the left), x2: J/P/M1/M0 are exactly
    bf16-representable 0/1 matrices, so the x3 scheme's w_lo term is
    identically zero — splitting only the DATA operand (two bf16 passes)
    reproduces the x3 result bit-for-bit at 2/3 the MXU cost (verified
    rel=0.0 vs x3, scripts/probe_unt.py round 5).  A single bf16 pass is
    NOT enough: the MXU rounds the data operand (measured 2e-3 rel)."""
    from .pallas_fft import _mm_f32, _split2

    dh, dl = _split2(data)
    wb = w.astype(jnp.bfloat16)
    return _mm_f32(wb, dh) + _mm_f32(wb, dl)


def _perm_mm_r(data, w):
    """Permutation matmul (perm on the right), x2 — see _perm_mm_l."""
    from .pallas_fft import _mm_f32, _split2

    dh, dl = _split2(data)
    wb = w.astype(jnp.bfloat16)
    return _mm_f32(dh, wb) + _mm_f32(dl, wb)


def _reverse_planes(pv, jm, pm, m1, m0, bt, hh):
    """(bt·hh, 128) planes -> R[k] = Z[(h−k) mod h], same shape."""
    z3 = pv.reshape(bt, hh, 128)
    z2 = jnp.transpose(z3, (1, 0, 2)).reshape(hh, bt * 128)
    t1 = _perm_mm_l(jm[...], z2).reshape(hh, bt, 128)
    t2 = _perm_mm_l(pm[...], z2).reshape(hh, bt, 128)
    t1 = jnp.transpose(t1, (1, 0, 2)).reshape(bt * hh, 128)
    t2 = jnp.transpose(t2, (1, 0, 2)).reshape(bt * hh, 128)
    return _perm_mm_r(t1, m1[...]) + _perm_mm_r(t2, m0[...])


def _pick_bt(batch: int, h: int, vmem_budget: int) -> int | None:
    """Rows per block: the deinterleave loop needs bt·h ≡ 0 (mod 128²);
    the working set (~14 arrays of bt·h scalars) must fit VMEM; and
    Mosaic requires block sublane dims divisible by 8 (or equal to the
    array dim) — bt ∈ {1, 2, 4} at large h compiled to "Slice shape
    must be aligned to tiling" rejections on chip (round 5), which
    silently pinned n=131072 REAL to the XLA plane path.  Picks the
    largest viable divisor of ``batch`` up to a 2²¹-scalar block."""
    best = None
    bt = 1
    while bt <= batch:
        if (
            batch % bt == 0
            and (bt % 8 == 0 or bt == batch)
            and bt * h % (128 * 128) == 0
            and 14 * bt * h * 4 <= vmem_budget
            and bt * h <= 1 << 21
        ):
            best = bt
        bt *= 2
    return best


def untangle_raw_call(z, batch, n, rtabs, config, scale: float = 1.0):
    """Raw Z spectrum (2·batch·h,) -> interleaved half spectrum
    (batch·(2h+2),): X[k] = E[k] + W^k·O[k] for k < h from Z and its
    reversal, X[h] = Re Z[0] − Im Z[0].  Returns None when no block
    tiling fits."""
    h = n // 2
    if not supported(n, batch):
        return None
    hh = h // 128
    bt = _pick_bt(batch, h, config.vmem_budget)
    if bt is None:
        # whole-h blocks stop compiling for wide spectra (Mosaic needs
        # sublane dims divisible by 8; bt=8 overflows VMEM at h >= 2^15).
        # The column-chunked untangle_wide_raw_call compiles and is
        # parity-correct but measured 196-310 ms vs the XLA plane
        # path's 38 at n=131072 b=1024 (its per-b dynamic-offset VMEM
        # gathers are pathological) — so wide spectra DECLINE here and
        # keep the plane path (docs/ROUND5.md round-5 negative result).
        return None
    wr, wi = rtabs
    wr2 = wr.reshape(hh, 128)
    wi2 = wi.reshape(hh, 128)
    jm, pm, m1, m0 = _perm_tables(h)
    rows_v = bt * h // 128
    dt = z.dtype

    def kernel(x_ref, wrr, wii, jmr, pmr, m1r, m0r, o_ref, pr, pi, s3, so):
        x = x_ref[...].reshape(rows_v, 256)
        for t in range(rows_v // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = x[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T
        rr = _reverse_planes(pr[...], jmr, pmr, m1r, m0r, bt, hh)
        ri = _reverse_planes(pi[...], jmr, pmr, m1r, m0r, bt, hh)
        zr, zi = pr[...], pi[...]
        er = 0.5 * (zr + rr)
        ei = 0.5 * (zi - ri)
        our = 0.5 * (zi + ri)
        oui = -0.5 * (zr - rr)
        w_r = jnp.broadcast_to(
            wrr[...].reshape(1, hh, 128), (bt, hh, 128)
        ).reshape(rows_v, 128)
        w_i = jnp.broadcast_to(
            wii[...].reshape(1, hh, 128), (bt, hh, 128)
        ).reshape(rows_v, 128)
        tr, ti = xla_fft.complex_mul(our, oui, w_r, w_i)
        xr = (er + tr) * scale
        xi = (ei + ti) * scale
        dump("untangle.body", xr)
        for t in range(rows_v // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[0::2, :] = xr[sl, :].T
            s3[1::2, :] = xi[sl, :].T
            so[sl, :] = s3[...].T
        o_ref[:, : 2 * h] = so[...].reshape(bt, 2 * h)
        # Nyquist bin: X[h] = Re Z[0] − Im Z[0] (imag 0); Z[0] sits at
        # lane 0 of each row's tile 0 (sublane stride hh in the planes)
        z0 = (pr[0::hh, :] - pi[0::hh, :]) * scale  # (bt, 128), lane 0
        ny = _perm_mm_r(z0, m0r[...])  # zero all lanes but 0
        o_ref[:, 2 * h : 2 * h + 2] = ny[:, 0:2]

    spec_in = pl.BlockSpec(
        (bt, 2 * h), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    spec_out = pl.BlockSpec(
        (bt, 2 * h + 2), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch // bt,),
        in_specs=[spec_in]
        + [_const_spec(t) for t in (wr2, wi2, jm, pm, m1, m0)],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((batch, 2 * h + 2), dt),
        scratch_shapes=[
            pltpu.VMEM((rows_v, 128), dt),
            pltpu.VMEM((rows_v, 128), dt),
            pltpu.VMEM((256, 128), dt),
            pltpu.VMEM((rows_v, 256), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * batch * h,
            bytes_accessed=4 * batch * (4 * h + 2),
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(z.reshape(batch, 2 * h), wr2, wi2, jm, pm, m1, m0)
    return out.reshape(batch * (2 * h + 2))


def wide_bt_ct(n: int, batch: int, config) -> tuple[int, int] | None:
    """(bt, chunk-tiles) for the column-chunked wide untangle, or None.

    The whole-h kernel's (bt, 2h) IO blocks stop compiling once bt
    drops below 8 (Mosaic requires block sublane dims divisible by 8)
    while 14·bt·h scalars overflow VMEM at bt=8 for h ≥ 2^15 — exactly
    the REAL GLOBAL sizes (n=131072 previously fell back to the XLA
    plane path at ~38.5 ms device, BENCH r5).  The wide form keeps only
    the four (bt·h/128, 128) planes persistent (Z and X, re/im) and
    streams IO in column chunks."""
    h = n // 2
    if n % 2 or h % 128 or h < 256:
        return None
    hh = h // 128
    bt = 8
    if batch % bt:
        return None
    if 4 * bt * h * 4 + 2 * hh * 128 * 4 > config.vmem_bytes * 3 // 4:
        return None
    # bt·ct must be a 128-multiple (the de/interleave walks 128-row
    # groups) and 128 % ct == 0 (each group holds whole per-b chunk rows)
    for ct in (32, 16):
        if hh % ct == 0:
            return bt, ct
    return None


def untangle_wide_raw_call(z, batch, n, rtabs, config, scale: float = 1.0):
    """Column-chunked untangle for wide spectra (see wide_bt_ct).

    grid (batch/bt, 2·nc): the first nc steps deinterleave input chunks
    into persistent Z planes; each of the last nc steps gathers the
    chunk's MIRROR tile rows from the planes, reverses them with a
    small block-diagonal flip matmul (I_bt ⊗ J_ct) + the M1/M0 lane
    perms, applies the E/O/W combine for that chunk only, and
    reinterleaves to an ALIGNED (batch, 2h) main output plus a
    (batch, 128) Nyquist block.  A whole-plane combine step was the
    first cut and Mosaic-rejected at h=65536 — its SSA working set
    (eight plane temporaries + (hh, hh) permutation tables) sat on top
    of the persistent scratch; the per-chunk form keeps only the two
    Z planes persistent and spreads the combine across the store steps
    (which also overlaps it with the output DMA).  The caller-side
    concat to the public ragged (batch·(2h+2),) buffer is an XLA
    repack — measured cheaper than any in-kernel ragged write
    (scripts/probe_unt.py round 5)."""
    h = n // 2
    pick = wide_bt_ct(n, batch, config)
    if pick is None:
        return None
    bt, ct = pick
    hh = h // 128
    nc = hh // ct
    cw = 128 * ct            # complex per chunk
    rows_v = bt * hh
    rows_c = bt * ct         # plane rows per chunk
    wr, wi = rtabs
    wr2 = wr.reshape(hh, 128)
    wi2 = wi.reshape(hh, 128)
    _, _, m1, m0 = _perm_tables(h)
    # block-diagonal per-b flip of the ct gathered tile rows
    jct = np.zeros((ct, ct), np.float32)
    for t in range(ct):
        jct[t, ct - 1 - t] = 1.0
    fl = jnp.asarray(np.kron(np.eye(bt, dtype=np.float32), jct))
    dt = z.dtype
    gct = ct + 8             # gathered rows per b (J range + P shift)

    def kernel(x_ref, wrr, wii, m1r, m0r, flr, o_ref, ny_ref,
               pr, pi, s3, sc, sgr, sgi):
        s = pl.program_id(1)
        s2 = s - nc

        @pl.when(s < nc)
        def _load():
            x = x_ref[...].reshape(rows_c, 256)
            for t in range(rows_c // 128):
                sl = slice(t * 128, (t + 1) * 128)
                s3[...] = x[sl, :].T
                sc[sl, :] = s3[0::2, :].T
                sc[rows_c + t * 128 : rows_c + (t + 1) * 128, :] = (
                    s3[1::2, :].T
                )
            col = pl.multiple_of(s * ct, ct)
            for b in range(bt):
                dst = b * hh
                pr[pl.ds(dst + col, ct), :] = sc[
                    b * ct : (b + 1) * ct, :
                ]
                pi[pl.ds(dst + col, ct), :] = sc[
                    rows_c + b * ct : rows_c + (b + 1) * ct, :
                ]

        @pl.when(s >= nc)
        def _store():
            col = pl.multiple_of(jnp.maximum(s2, 0) * ct, ct)
            roff = hh - col - ct  # ascending mirror range start (per b)
            for b in range(bt):
                sgr[b, :, :] = pr[pl.ds(b * hh + roff, gct), :]
                sgi[b, :, :] = pi[pl.ds(b * hh + roff, gct), :]
                sc[b * ct : (b + 1) * ct, :] = pr[
                    pl.ds(b * hh + col, ct), :
                ]
                sc[rows_c + b * ct : rows_c + (b + 1) * ct, :] = pi[
                    pl.ds(b * hh + col, ct), :
                ]
            smj_r = sgr[:, 0:ct, :].reshape(rows_c, 128)
            smj_i = sgi[:, 0:ct, :].reshape(rows_c, 128)
            smp_r = sgr[:, 1 : ct + 1, :].reshape(rows_c, 128)
            smp_i = sgi[:, 1 : ct + 1, :].reshape(rows_c, 128)
            # wrap fix: pre-flip P row j = ct-1 maps to tile hh (only
            # the col == 0 chunk) — the true source is tile 0
            ri0 = jax.lax.broadcasted_iota(
                jnp.int32, (rows_c, 128), 0
            )
            t0r = jnp.broadcast_to(
                pr[0:rows_v:hh, :].reshape(bt, 1, 128), (bt, ct, 128)
            ).reshape(rows_c, 128)
            t0i = jnp.broadcast_to(
                pi[0:rows_v:hh, :].reshape(bt, 1, 128), (bt, ct, 128)
            ).reshape(rows_c, 128)
            wrap = (ri0 % ct == ct - 1) & (col == 0)
            smp_r = jnp.where(wrap, t0r, smp_r)
            smp_i = jnp.where(wrap, t0i, smp_i)
            # lane perms then the row flip (they commute)
            pre_r = _perm_mm_r(smj_r, m1r[...]) + _perm_mm_r(
                smp_r, m0r[...]
            )
            pre_i = _perm_mm_r(smj_i, m1r[...]) + _perm_mm_r(
                smp_i, m0r[...]
            )
            rr = _perm_mm_l(flr[...], pre_r)
            ri = _perm_mm_l(flr[...], pre_i)
            zr = sc[0:rows_c, :]
            zi = sc[rows_c : 2 * rows_c, :]
            er = 0.5 * (zr + rr)
            ei = 0.5 * (zi - ri)
            our = 0.5 * (zi + ri)
            oui = -0.5 * (zr - rr)
            w_r = jnp.broadcast_to(
                wrr[pl.ds(col, ct), :].reshape(1, ct, 128),
                (bt, ct, 128),
            ).reshape(rows_c, 128)
            w_i = jnp.broadcast_to(
                wii[pl.ds(col, ct), :].reshape(1, ct, 128),
                (bt, ct, 128),
            ).reshape(rows_c, 128)
            tr, ti = xla_fft.complex_mul(our, oui, w_r, w_i)
            xr = (er + tr) * scale
            xi = (ei + ti) * scale
            bpg = 128 // ct  # whole per-b chunk rows per 128-row group
            for t in range(rows_c // 128):
                sl = slice(t * 128, (t + 1) * 128)
                s3[0::2, :] = xr[sl, :].T
                s3[1::2, :] = xi[sl, :].T
                o_ref[0, t * bpg : (t + 1) * bpg, :] = (
                    s3[...].T.reshape(bpg, 2 * cw)
                )

            @pl.when(s2 == 0)
            def _nyquist():
                z0 = (
                    pr[0:rows_v:hh, :] - pi[0:rows_v:hh, :]
                ) * scale
                ny_ref[...] = _perm_mm_r(z0, m0r[...])

    in_spec = pl.BlockSpec(
        (1, bt, 2 * cw),
        lambda i, s: (0, i, jnp.minimum(s, nc - 1)),
        memory_space=pltpu.VMEM,
    )
    out_main = pl.BlockSpec(
        (1, bt, 2 * cw),
        lambda i, s: (0, i, jnp.maximum(s - nc, 0)),
        memory_space=pltpu.VMEM,
    )
    out_ny = pl.BlockSpec(
        (bt, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    main, ny = pl.pallas_call(
        kernel,
        grid=(batch // bt, 2 * nc),
        in_specs=[in_spec]
        + [_const_spec(t) for t in (wr2, wi2, m1, m0, fl)],
        out_specs=[out_main, out_ny],
        out_shape=[
            jax.ShapeDtypeStruct((1, batch, 2 * h), dt),
            jax.ShapeDtypeStruct((batch, 128), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_v + 8, 128), dt),
            pltpu.VMEM((rows_v + 8, 128), dt),
            pltpu.VMEM((256, 128), dt),
            pltpu.VMEM((2 * rows_c, 128), dt),
            pltpu.VMEM((bt, gct, 128), dt),
            pltpu.VMEM((bt, gct, 128), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * batch * h,
            bytes_accessed=4 * batch * (4 * h + 2),
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(z.reshape(1, batch, 2 * h), wr2, wi2, m1, m0, fl)
    flat = jnp.concatenate(
        [main[0], ny[:, :2]], axis=1
    ).reshape(batch * (2 * h + 2))
    return flat



def retangle_raw_call(x, batch, n, rtabs, config, scale: float = 1.0):
    """Interleaved half spectrum (batch·(2h+2),) -> raw conjugate-packed
    spectrum (2·batch·h,) ready for the half-length backward kernel:
    Z[k] = (X[k]+conj(X[h−k])) + W₊^k·i·... (the retangle of
    committed._core_real_backward with the reversal's k = 0 term injected
    from the Nyquist bin).  Returns None when no tiling fits."""
    h = n // 2
    if not supported(n, batch):
        return None
    hh = h // 128
    bt = _pick_bt(batch, h, config.vmem_budget)
    if bt is None:
        return None
    wr, wi = rtabs  # W₊^k tables (sign = +1 bank entry)
    wr2 = wr.reshape(hh, 128)
    wi2 = wi.reshape(hh, 128)
    jm, pm_full, m1, m0 = _perm_tables(h)
    # zero the k = 0 row of the P term: the reversal at k = 0 must come
    # from the Nyquist bin X[h], not from X[0]
    pm = pm_full.at[0, 0].set(0.0)
    rows_v = bt * h // 128
    dt = x.dtype

    er_np = np.zeros((2, 128), np.float32)
    er_np[0, 0] = 1.0
    ei_np = np.zeros((2, 128), np.float32)
    ei_np[1, 0] = 1.0
    er_t, ei_t = jnp.asarray(er_np), jnp.asarray(ei_np)

    def kernel(x_ref, wrr, wii, jmr, pmr, m1r, m0r, err, eri, o_ref,
               pr, pi, s3):
        v = x_ref[...]  # (bt, 2h+2)
        body = v[:, : 2 * h].reshape(rows_v, 256)
        for t in range(rows_v // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[...] = body[sl, :].T
            pr[sl, :] = s3[0::2, :].T
            pi[sl, :] = s3[1::2, :].T
        rr = _reverse_planes(pr[...], jmr, pmr, m1r, m0r, bt, hh)
        ri = _reverse_planes(pi[...], jmr, pmr, m1r, m0r, bt, hh)
        # inject X[h] at k = 0 (tile 0, lane 0 of every row)
        nyq = v[:, 2 * h : 2 * h + 2]  # (bt, 2) = [Xh_r, Xh_i]
        inj_r = _perm_mm_r(nyq, err[...])  # (bt, 128), lane 0 = Xh_r
        inj_i = _perm_mm_r(nyq, eri[...])
        kt = jax.lax.broadcasted_iota(jnp.int32, (bt, hh, 128), 1)
        rr = jnp.where(
            kt == 0,
            rr.reshape(bt, hh, 128) + inj_r.reshape(bt, 1, 128),
            rr.reshape(bt, hh, 128),
        ).reshape(rows_v, 128)
        ri = jnp.where(
            kt == 0,
            ri.reshape(bt, hh, 128) + inj_i.reshape(bt, 1, 128),
            ri.reshape(bt, hh, 128),
        ).reshape(rows_v, 128)
        xr, xi = pr[...], pi[...]
        e2r = xr + rr
        e2i = xi - ri
        n2r = xr - rr
        n2i = xi + ri
        w_r = jnp.broadcast_to(
            wrr[...].reshape(1, hh, 128), (bt, hh, 128)
        ).reshape(rows_v, 128)
        w_i = jnp.broadcast_to(
            wii[...].reshape(1, hh, 128), (bt, hh, 128)
        ).reshape(rows_v, 128)
        o2r, o2i = xla_fft.complex_mul(n2r, n2i, w_r, w_i)
        zr = (e2r - o2i) * scale
        zi = (e2i + o2r) * scale
        dump("retangle.z", zr)
        for t in range(rows_v // 128):
            sl = slice(t * 128, (t + 1) * 128)
            s3[0::2, :] = zr[sl, :].T
            s3[1::2, :] = zi[sl, :].T
            o_ref[sl, :] = s3[...].T

    spec_in = pl.BlockSpec(
        (bt, 2 * h + 2), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    spec_out = pl.BlockSpec(
        (rows_v, 256), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch // bt,),
        in_specs=[spec_in]
        + [_const_spec(t) for t in (wr2, wi2, jm, pm, m1, m0, er_t, ei_t)],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((batch * h // 128, 256), dt),
        scratch_shapes=[
            pltpu.VMEM((rows_v, 128), dt),
            pltpu.VMEM((rows_v, 128), dt),
            pltpu.VMEM((256, 128), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * batch * h,
            bytes_accessed=4 * batch * (4 * h + 2),
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
    )(x.reshape(batch, 2 * h + 2), wr2, wi2, jm, pm, m1, m0, er_t, ei_t)
    return out.reshape(2 * batch * h)


# ---------------------------------------------------------------------------
# Small-n REAL transforms as one constant matmul (round-5 VERDICT weak #2)
# ---------------------------------------------------------------------------
#
# For n <= 512 the whole R2C / C2R transform of a row is a constant REAL
# matrix over the row's raw floats (conjugation is real-linear), so g
# transforms pack block-diagonally into a single streaming MXU matmul —
# no deinterleave, no spectrum reversal, no untangle passes.  The plane
# path this replaces ran N=32 x 2M at ~25 GB/s effective (~5% of the
# session ceiling) because its even/odd slices, flip/roll and untangle
# are each separate HBM sweeps.  Reference counterpart: none (REAL
# throws, committed_descriptor.hpp:134-137).

SMALL_REAL_MAX_N = 512  # MXU cost is 3n MAC/point; beyond 512 the matmul
#                         would become compute-bound on v5e (~120 MAC/byte)


def small_supported(n: int, batch: int) -> bool:
    """Even 4 <= n <= 512 with a lane-groupable batch."""
    if n % 2 or n < 4 or n > SMALL_REAL_MAX_N:
        return False
    g = small_group(n)
    return batch % g == 0 and (batch // g) % 8 == 0


def small_group(n: int) -> int:
    """Transforms per matmul row: fill ~128+ lanes for tiny n."""
    return max(1, 128 // n)


def _pick_rows(rows: int, k: int) -> int:
    for bt in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % bt == 0 and bt * k * 4 * 5 <= 12 * 2**20:
            return bt
    return 0


def small_real_raw_call(
    raw, batch, n, direction_sign, tab, config, interpret=None
):
    """Flat raw floats -> flat raw floats through the stacked constant
    matmul (TwiddleBank.real_small).  forward (sign<0): (batch*n,) real
    -> (batch*(n+2),) interleaved half spectra.  backward: the reverse."""
    g = small_group(n)
    in_cols = n if direction_sign < 0 else n + 2
    out_cols = n + 2 if direction_sign < 0 else n
    rows = batch // g
    k = g * in_cols
    nn = g * out_cols
    bt = _pick_rows(rows, k)
    if not bt:
        return None
    x2 = raw.reshape(rows, k)

    def kern(x_ref, t_ref, o_ref):
        xv = x_ref[...]
        xh = xv.astype(jnp.bfloat16)
        xl = (xv - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        st = jnp.concatenate([xh, xl, xh], axis=1)
        o_ref[...] = jnp.matmul(
            st, t_ref[...], preferred_element_type=jnp.float32
        )
        dump("real_small.mm", o_ref[...])

    out = pl.pallas_call(
        kern,
        grid=(rows // bt,),
        in_specs=[
            pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _const_spec(tab),
        ],
        out_specs=pl.BlockSpec(
            (bt, nn), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, nn), raw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * rows * k * nn,
            bytes_accessed=(rows * (k + nn)) * 4,
            transcendentals=0,
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(x2, tab)
    return out.reshape(rows * nn)
