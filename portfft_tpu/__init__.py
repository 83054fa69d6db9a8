"""portfft_tpu — a TPU-native batched FFT framework.

From-scratch rebuild of the capabilities of portFFT
(codeplaysoftware/portFFT, reference at /root/reference) on the TPU compute
stack: a describe → commit (plan) → execute API over JAX/XLA with Pallas
kernels on the hot paths.

Quick start::

    import portfft_tpu as pfft
    desc = pfft.Descriptor(lengths=[4096], number_of_transforms=1024)
    plan = desc.commit()
    y = plan.compute_forward(x)          # x: complex64, 4096*1024 elements
    x2 = plan.compute_backward(y)        # unnormalized inverse
"""

from . import functional
from .committed import CommittedDescriptor
from .config import DeviceConfig, resolve_device_config
from .descriptor import Descriptor
from .enums import (
    ComplexStorage,
    Direction,
    Domain,
    Layout,
    Level,
    Placement,
    inv,
)
from .exceptions import (
    InternalError,
    InvalidConfiguration,
    OutOfVmemError,
    PortFFTError,
    UnsupportedConfiguration,
)

__all__ = [
    "CommittedDescriptor",
    "ComplexStorage",
    "Descriptor",
    "DeviceConfig",
    "Direction",
    "Domain",
    "InternalError",
    "InvalidConfiguration",
    "Layout",
    "Level",
    "OutOfVmemError",
    "Placement",
    "PortFFTError",
    "UnsupportedConfiguration",
    "functional",
    "inv",
    "resolve_device_config",
]

__version__ = "0.1.0"
