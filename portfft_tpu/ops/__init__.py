from . import xla_fft  # noqa: F401
