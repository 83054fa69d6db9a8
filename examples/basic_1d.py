"""Basic batched 1D C2C transform, forward + inverse round trip."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

import portfft_tpu as pfft

N, BATCH = 4096, 256

desc = pfft.Descriptor(lengths=[N], number_of_transforms=BATCH)
plan = desc.commit()
print("plan:", plan.plan_description())

rng = np.random.default_rng(0)
x = (rng.standard_normal(BATCH * N) + 1j * rng.standard_normal(BATCH * N)).astype(
    np.complex64
)

y = plan.compute_forward(x)
x2 = np.asarray(plan.compute_backward(np.asarray(y))) / N  # unnormalized inverse

print("max round-trip error:", np.abs(x2 - x).max())
