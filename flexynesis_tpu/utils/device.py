"""Device management (JAX flavor of reference utils.py:2182-2304).

The reference picks cuda > mps > cpu; here the hierarchy is tpu > gpu > cpu
and "device" means a jax.Device. ``to_device_safe`` handles the float64
coercion concern the reference has for MPS — TPUs likewise default to
float32, so float64 arrays are downcast unless x64 is explicitly enabled.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


_PRIORITY = ("tpu", "axon", "gpu", "cuda", "rocm", "cpu")


def get_optimal_device(device_preference: Optional[str] = None):
    """Best available device honoring an optional preference.

    Returns (jax.Device, platform_str).
    """
    devices = jax.devices()
    by_platform = {}
    for d in devices:
        by_platform.setdefault(d.platform.lower(), []).append(d)

    if device_preference and device_preference != "auto":
        want = device_preference.lower()
        aliases = {"cuda": ["gpu", "cuda"], "tpu": ["tpu", "axon"]}
        for alias in aliases.get(want, [want]):
            if alias in by_platform:
                dev = by_platform[alias][0]
                print(f"[INFO] Using requested device: {dev}")
                return dev, dev.platform
        print(
            f"[WARNING] Requested device '{device_preference}' not available; "
            "falling back to auto-detection."
        )

    for platform in _PRIORITY:
        if platform in by_platform:
            dev = by_platform[platform][0]
            print(f"[INFO] Using device: {dev}")
            return dev, dev.platform
    dev = devices[0]
    return dev, dev.platform


def create_device_from_string(device_str: Optional[str]):
    """jax.Device from a preference string ('auto'/'tpu'/'cpu'/...)."""
    dev, _ = get_optimal_device(device_str)
    return dev


def to_device_safe(array, device) -> jax.Array:
    """device_put with float64 -> float32 coercion unless x64 is enabled."""
    arr = np.asarray(array)
    if arr.dtype == np.float64 and not jax.config.jax_enable_x64:
        arr = arr.astype(np.float32)
    return jax.device_put(arr, device)


def get_device_memory_info(device=None) -> dict:
    """Bytes in use / limit for a device, where the backend reports them."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "device": str(device),
        "platform": device.platform,
        "bytes_in_use": stats.get("bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
    }
