"""The JAX-native surfaces: numpy.fft-style functional API and the pure
traceable ``plan.apply`` embedded in a user jit program."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import portfft_tpu as pfft
from portfft_tpu import functional as F

rng = np.random.default_rng(0)

# --- functional API: no plan objects, internal LRU plan cache -------------
x = (rng.standard_normal((8, 1024)) + 1j * rng.standard_normal((8, 1024))
     ).astype(np.complex64)
y = F.fft(x)
x2 = F.ifft(y)                       # numpy normalization (1/n)
print("fft/ifft round trip:", np.abs(np.asarray(x2) - x).max())

r = rng.standard_normal((4, 512)).astype(np.float32)
spec = F.rfft(r)                     # (4, 257) half spectrum
back = F.irfft(spec, 512)
print("rfft/irfft round trip:", np.abs(np.asarray(back) - r).max())

print("ortho norm parity:",
      np.abs(np.asarray(F.fft(x, norm="ortho"))
             - np.fft.fft(x, norm="ortho")).max())

# --- plan.apply: pure function, composable inside user jit programs ------
plan = pfft.Descriptor(lengths=[1024], number_of_transforms=8).commit()


@jax.jit
def power_spectrum(v):
    """FFT + |.|^2 + mean, all in ONE fused XLA program."""
    return jnp.mean(jnp.abs(plan.apply(v)) ** 2, axis=0)


p = power_spectrum(jnp.asarray(x))
print("power spectrum shape:", p.shape)

# the DFT is linear, so apply() differentiates exactly
g = jax.grad(lambda v: jnp.sum(jnp.abs(plan.apply(v, jnp.zeros_like(v))[0]) ** 2))(
    jnp.asarray(x.real)
)
print("grad shape:", g.shape)
