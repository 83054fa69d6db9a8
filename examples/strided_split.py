"""Split-complex storage with strided layout and an output buffer."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

import portfft_tpu as pfft

N, BATCH, STRIDE = 64, 8, 3

desc = pfft.Descriptor(
    lengths=[N],
    number_of_transforms=BATCH,
    complex_storage=pfft.ComplexStorage.SPLIT_COMPLEX,
    forward_strides=[STRIDE],
    forward_distance=STRIDE * N,
)
plan = desc.commit()

count_in = desc.get_input_count(pfft.Direction.FORWARD)
count_out = desc.get_output_count(pfft.Direction.FORWARD)
rng = np.random.default_rng(1)
re = rng.standard_normal(count_in).astype(np.float32)
im = rng.standard_normal(count_in).astype(np.float32)

out_re = np.full(count_out, -1.0, np.float32)  # preserved where not written
out_im = np.full(count_out, -1.0, np.float32)
yr, yi = plan.compute_forward(re, im, out=(out_re, out_im))
print("output shape:", np.asarray(yr).shape)
