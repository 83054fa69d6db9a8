"""Round-2 features: commit-time autotuning and emulated fp64.

Autotune measures this plan's kernel variants on the attached device once
and persists the winner (~/.cache/portfft_tpu_tuning.json); emulated fp64
runs double-double arithmetic on f32 hardware (~5e-15 relative error)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import portfft_tpu as pfft

# --- autotune (effective on TPU; measures in interpreter mode elsewhere)
desc = pfft.Descriptor(lengths=[4096], number_of_transforms=4096)
plan = desc.commit()
won = plan.autotune(iters=2)
print("autotuned params:", won)

x = (np.random.randn(4096 * 4096) + 1j * np.random.randn(4096 * 4096)).astype(
    np.complex64
)
y = plan.compute_forward(x)
print("fp32 max err:",
      np.abs(np.asarray(y) - np.fft.fft(x.reshape(-1, 4096), axis=1).reshape(-1)).max())

# --- emulated fp64 (opt-in; sizes need prime factors <= 13)
d64 = pfft.Descriptor(
    lengths=[360], number_of_transforms=8, precision="float64"
)
p64 = d64.commit(emulate_fp64=True)
x64 = (np.random.randn(8 * 360) + 1j * np.random.randn(8 * 360)).astype(
    np.complex128
)
y64 = p64.compute_forward(x64)
ref = np.fft.fft(x64.reshape(8, 360), axis=1).reshape(-1)
print("fp64 rel err:", np.linalg.norm(y64 - ref) / np.linalg.norm(ref))
