"""REAL-domain transforms: out-of-place R2C/C2R and the in-place FFTW
padded layout (extension — the reference throws for REAL,
committed_descriptor.hpp:134-137)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import portfft_tpu as pfft
from portfft_tpu import Domain, Placement

N, BATCH = 2048, 8
H1 = N // 2 + 1

# --- out-of-place: real (BATCH, N) -> half spectrum (BATCH, N//2+1) -----
plan = pfft.Descriptor(
    lengths=[N], number_of_transforms=BATCH, domain=Domain.REAL
).commit()
rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, N)).astype(np.float32)
spec = np.asarray(plan.compute_forward(x.reshape(-1))).reshape(BATCH, H1)
ref = np.fft.rfft(x, axis=1)
print("r2c rel:", np.linalg.norm(spec - ref) / np.linalg.norm(ref))

back = np.asarray(plan.compute_backward(spec.reshape(-1))).reshape(BATCH, N)
print("c2r roundtrip rel:", np.linalg.norm(back / N - x) / np.linalg.norm(x))

# --- in-place: rows padded to 2*(N//2+1) reals share the buffer ---------
ip = pfft.Descriptor(
    lengths=[N],
    number_of_transforms=BATCH,
    domain=Domain.REAL,
    placement=Placement.IN_PLACE,  # forward_distance defaults to 2*(N//2+1)
).commit()
buf = np.zeros((BATCH, 2 * H1), np.float32)
buf[:, :N] = x
spec_ip = np.asarray(ip.compute_forward(buf.reshape(-1))).reshape(BATCH, H1)
print("in-place r2c rel:",
      np.linalg.norm(spec_ip - ref) / np.linalg.norm(ref))
rows = np.asarray(
    ip.compute_backward(np.ascontiguousarray(spec_ip).reshape(-1))
).reshape(BATCH, 2 * H1)[:, :N]
print("in-place c2r roundtrip rel:",
      np.linalg.norm(rows / N - x) / np.linalg.norm(x))
