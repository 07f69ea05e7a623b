"""Device-mesh construction and sharding specs.

The reference scales through ``gpuMemMode`` tiers that stage buffers over
PCIe when a volume exceeds device memory (reference:src/api_subfunc.cu:
3468-3500 ``*_OTF2`` variants, ``reg3d_affine2``). The TPU-native
replacement is a ``jax.sharding.Mesh``:

  * axis ``"sp"`` (spatial) shards a single volume's z-extent across
    chips — XLA decomposes the 3D FFT into per-shard FFTs plus
    all-to-all transposes over ICI, so "memory-saving mode" becomes a
    mesh-size knob rather than a second code path (SURVEY.md §2.7)
  * axis ``"dp"`` (data) distributes independent timepoints of a
    time-lapse batch — pure data parallelism, DCN-friendly across hosts

Multi-host runs initialize with ``jax.distributed.initialize()`` before
building the mesh; the same code runs unchanged on one host.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_sp=None, n_dp=1, devices=None):
    """Build a ('dp', 'sp') mesh. Defaults: all devices on 'sp'."""
    if devices is None:
        devices = jax.devices()
    if n_sp is None:
        n_sp = len(devices) // n_dp
    devices = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(devices, axis_names=("dp", "sp"))


def volume_sharding(mesh):
    """(z, y, x) volume sharded along z on the 'sp' axis."""
    return NamedSharding(mesh, P("sp", None, None))


def spectrum_sharding(mesh):
    """rFFT spectrum of a z-sharded volume (same leading-axis split)."""
    return NamedSharding(mesh, P("sp", None, None))


def batch_sharding(mesh):
    """(t, z, y, x) timepoint batch: t on 'dp', z on 'sp'."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def replicated(mesh):
    return NamedSharding(mesh, P())
