"""Device runtime: the TPU-native replacement for ICICLE's device abstraction.

Reference layer L0 (include/icicle/{device,device_api,runtime}.h) exists to
hide vendor runtimes behind malloc/copy/stream calls. On TPU the platform
runtime is PJRT via JAX: arrays carry their device and sharding, streams are
XLA's async dispatch, and a "backend" is a kernel implementation choice
(pure-XLA vs Pallas-TPU) rather than a DSO. This module keeps the reference's
*surface* (set_device / get_device / device_count / synchronize / memory copy
helpers) mapped onto those primitives, plus mesh construction for multi-chip.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Optional

import jax
import numpy as np

from icicle_tpu.runtime.errors import IcicleError, IcicleException
from icicle_tpu.runtime.log import logger


@dataclasses.dataclass(frozen=True)
class Device:
    """(type, id) value struct; reference include/icicle/device.h:14-48."""

    type: str = "tpu"
    id: int = 0


@dataclasses.dataclass(frozen=True)
class DeviceProperties:
    """Reference device.h:53-58."""

    using_host_memory: bool
    num_memory_regions: int
    supports_pinned_memory: bool
    platform: str


_state = threading.local()


def _platform_of(dev_type: str) -> str:
    t = dev_type.lower()
    if t in ("tpu", "axon"):
        return "tpu"
    if t in ("cpu", "host"):
        return "cpu"
    return t


def get_registered_devices() -> list[Device]:
    """All JAX devices as Device values (reference icicle_get_registered_devices)."""
    return [Device(d.platform, d.id) for d in jax.devices()]


def _jax_device(device: Device):
    plat = _platform_of(device.type)
    try:
        devs = jax.devices(plat)
    except RuntimeError:
        devs = [d for d in jax.devices() if d.platform == plat]
    if device.id >= len(devs):
        raise IcicleException(IcicleError.INVALID_DEVICE,
                              f"{device.type}:{device.id} (have {len(devs)})")
    return devs[device.id]


def set_device(device: Device) -> None:
    """Select the thread-local active device (reference icicle_set_device,
    src/runtime.cpp:15; thread-local like device_api.h:185-187)."""
    _state.device = device
    _state.jax_device = _jax_device(device)
    logger.info("active device set to %s:%d", device.type, device.id)


def get_active_device() -> Device:
    if not hasattr(_state, "device"):
        d = jax.devices()[0]
        _state.device = Device(d.platform, d.id)
        _state.jax_device = d
    return _state.device


def active_jax_device():
    get_active_device()
    return _state.jax_device


def device_count(device_type: str | None = None) -> int:
    if device_type is None:
        return len(jax.devices())
    return len([d for d in jax.devices() if d.platform == _platform_of(device_type)])


def get_device_properties(device: Optional[Device] = None) -> DeviceProperties:
    device = device or get_active_device()
    plat = _platform_of(device.type)
    return DeviceProperties(
        using_host_memory=(plat == "cpu"),
        num_memory_regions=1,
        supports_pinned_memory=(plat != "cpu"),
        platform=plat,
    )


def synchronize(*arrays) -> None:
    """Block until queued work completes (reference icicle_device_synchronize).

    XLA dispatch is async; with no handle we can only block on given arrays.
    """
    for a in arrays:
        jax.block_until_ready(a)


# -- memory helpers (reference icicle_malloc/icicle_copy family) -------------
def to_device(host_array, device: Optional[Device] = None):
    """Host -> device transfer (reference icicle_copy_to_device)."""
    dev = _jax_device(device) if device else active_jax_device()
    return jax.device_put(host_array, dev)


def to_host(device_array) -> np.ndarray:
    """Device -> host transfer (reference icicle_copy_to_host)."""
    return np.asarray(jax.device_get(device_array))


def copy(array, device: Optional[Device] = None):
    """Direction-inferred copy (reference icicle_copy, src/runtime.cpp:163-223).

    JAX arrays carry their device, so no MemoryTracker is needed: device_put
    resolves the direction itself.
    """
    if isinstance(array, np.ndarray):
        return to_device(array, device)
    return jax.device_put(array, _jax_device(device) if device else active_jax_device())
