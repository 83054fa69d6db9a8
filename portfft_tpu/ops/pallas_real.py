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
from .pallas_fft import _const_spec, _interpret_mode, _mm, dump


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
    the working set (~14 arrays of bt·h scalars) must fit VMEM.  Picks the
    largest viable divisor of ``batch`` up to a 2²¹-scalar block."""
    best = None
    bt = 1
    while bt <= batch:
        if (
            batch % bt == 0
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
