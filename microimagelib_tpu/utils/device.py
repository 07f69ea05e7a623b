"""Device census and selection — the TPU analog of the reference's CUDA
device utilities (``queryDevice`` reference:src/apifunc.cpp:328-394 and the
per-call ``deviceNum``/``cudaSetDevice`` convention, e.g.
reference:src/api_reg.cpp:319).

On TPU there is no per-call device binding: JAX places arrays explicitly.
``get_device(device_num)`` returns the jax.Device to use with
``jax.device_put``; ``query_device`` prints an inventory the way
``checkGPUDevice`` did.
"""

from __future__ import annotations

import jax


def query_device(verbose=True):
    """Return a list of device-description dicts; print them if verbose."""
    devs = jax.devices()
    infos = []
    if verbose:
        print(" \n ===========================================")
        print(f"Detected {len(devs)} accelerator device(s):")
    for d in devs:
        info = {
            "id": d.id,
            "platform": d.platform,
            "device_kind": d.device_kind,
            "process_index": d.process_index,
        }
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        if "bytes_limit" in stats:
            info["memory_total_mb"] = stats["bytes_limit"] / 1048576.0
            info["memory_used_mb"] = stats.get("bytes_in_use", 0) / 1048576.0
        infos.append(info)
        if verbose:
            line = f"  Device {d.id}: {d.device_kind} ({d.platform})"
            if "memory_total_mb" in info:
                line += f", {info['memory_total_mb']:.0f} MB total, {info['memory_used_mb']:.0f} MB in use"
            print(line)
    if verbose:
        print(" ===========================================\n")
    return infos


def get_device(device_num=0):
    """Map the reference's ``deviceNum`` flag to a jax.Device."""
    devs = jax.devices()
    if device_num < 0 or device_num >= len(devs):
        raise ValueError(f"Device {device_num} not available ({len(devs)} devices present)")
    return devs[device_num]


def free_memory_mb(device=None):
    """Approximate free device memory in MB (records-array telemetry analog
    of ``cudaMemGetInfo``, reference:src/api_decon.cpp:103-106). Returns -1
    when the backend does not expose memory stats."""
    d = device if device is not None else jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
        if "bytes_limit" in stats:
            return (stats["bytes_limit"] - stats.get("bytes_in_use", 0)) / 1048576.0
    except Exception:
        pass
    return -1.0


def committed_platform(arr=None):
    """Platform of ``arr``'s COMMITTED device, falling back to the
    default backend — the single copy of the device-dispatch probe used
    by the FFT, NCC, and registration-engine auto choices (a CPU-pinned
    volume on a TPU host must not take accelerator-only paths). Tracers
    carry no device, so callers inside jit must resolve eagerly."""
    import jax

    if arr is not None:
        try:
            return next(iter(arr.devices())).platform
        except Exception:
            pass
    return jax.default_backend()
