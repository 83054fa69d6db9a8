"""Device configuration and tuning knobs.

TPU analogue of the reference's compile-time CMake cache variables
(CMakeLists.txt:38-59 — PORTFFT_REGISTERS_PER_WI, PORTFFT_SUBGROUP_SIZES,
PORTFFT_VEC_LOAD_BYTES, ...) plus commit-time device introspection
(committed_descriptor_impl.hpp:716-731: compute units, subgroup sizes, local
memory, LLC size).  Here the introspected quantities are the TPU generation's
lane/sublane geometry, VMEM capacity and HBM bandwidth, resolved from
``jax.devices()`` at commit time and overridable for tests.
"""

from __future__ import annotations

import dataclasses
import functools


@dataclasses.dataclass(frozen=True)
class DeviceConfig:
    """Hardware parameters that shape the plan."""

    name: str = "tpu"
    #: Vector lane count (last-dim tile) — 128 on all current TPUs.
    lane: int = 128
    #: Sublane count (second-to-last-dim tile) for fp32.
    sublane: int = 8
    #: Usable VMEM per core in bytes (hardware ~16 MiB; leave headroom for
    #: Mosaic's own buffers and semaphores).
    vmem_bytes: int = 16 * 2**20
    #: Fraction of VMEM the planner may budget for one kernel's working set.
    vmem_budget_fraction: float = 0.55
    #: Peak HBM bandwidth in GB/s (roofline denominator only).
    hbm_gbps: float = 819.0
    #: Largest DFT factor solved as a single MXU matmul.  128 fills the MXU's
    #: contraction dimension exactly; every factor ≤ this is one matmul pass.
    max_factor: int = 128
    #: Sizes at or below this are planned as ONE direct DFT matmul
    #: (level DIRECT), regardless of primality.  512 keeps the tiny-split
    #: fused kernels (which Mosaic compiles poorly) out of the plan space
    #: and lets the two-pass global engine cover n up to 512·512 = 262144.
    direct_threshold: int = 512
    #: Any prime factor above this triggers the Bluestein chirp-z path.
    bluestein_threshold: int = 128
    #: Preferred batch-tile (rows per Pallas grid step) for fused kernels.
    batch_tile: int = 128
    #: HBM working-set budget per executed batch chunk; bigger transforms
    #: run under ``lax.map`` over batch chunks (the analogue of the
    #: reference's L2-resident chunking, committed_descriptor_impl.hpp:605).
    hbm_chunk_bytes: int = 2 << 30

    @property
    def vmem_budget(self) -> int:
        return int(self.vmem_bytes * self.vmem_budget_fraction)


_KNOWN = {
    # device_kind substring -> (name, vmem_bytes, hbm GB/s)
    "v5 lite": ("tpu_v5e", 16 * 2**20, 819.0),
    "v5e": ("tpu_v5e", 16 * 2**20, 819.0),
    "v5p": ("tpu_v5p", 16 * 2**20, 2765.0),
    "v5": ("tpu_v5p", 16 * 2**20, 2765.0),
    "v4": ("tpu_v4", 16 * 2**20, 1228.0),
    "v6": ("tpu_v6e", 32 * 2**20, 1640.0),
    "v3": ("tpu_v3", 16 * 2**20, 900.0),
}


@functools.lru_cache(maxsize=8)
def _config_for_kind(device_kind: str, platform: str) -> DeviceConfig:
    kind = device_kind.lower()
    if platform != "tpu":
        # CPU / interpreter runs: same geometry so plans are identical to TPU,
        # nominal bandwidth (roofline numbers are meaningless off-TPU).
        return DeviceConfig(name=platform, hbm_gbps=100.0)
    for key, (name, vmem, bw) in _KNOWN.items():
        if key in kind:
            return DeviceConfig(name=name, vmem_bytes=vmem, hbm_gbps=bw)
    return DeviceConfig(name="tpu_unknown")


def enable_persistent_cache(path: str = "~/.cache/portfft_tpu_xla") -> None:
    """Persist compiled executables across processes (the framework's
    plan-reuse story, replacing the reference's in-memory kernel-bundle
    sharing, committed_descriptor_impl.hpp:774-803: identical descriptors
    re-committed in a new process hit the XLA compilation cache instead of
    recompiling)."""
    import os

    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def resolve_device_config(device=None) -> DeviceConfig:
    """Introspect the target device (commit-time, like
    committed_descriptor_impl.hpp:716-731)."""
    import jax

    if isinstance(device, DeviceConfig):
        return device
    if device is None:
        device = jax.devices()[0]
    return _config_for_kind(
        getattr(device, "device_kind", "cpu"), getattr(device, "platform", "cpu")
    )
