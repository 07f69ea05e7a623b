"""Pencil-decomposed distributed 3D rFFT under ``shard_map``.

A volume (z, y, x) sharded along z across the mesh axis 'sp' is
transformed by:
  1. local rFFT along x and FFT along y on each z-slab,
  2. one ``all_to_all`` over ICI re-partitioning z-slabs into y-chunks,
  3. local FFT along z.
The spectrum lives y-sharded (global spec P(None, 'sp', None)); the
inverse reverses the steps. One all-to-all per direction is the minimum
communication for a 1D-decomposed 3D FFT.

This replaces the reference's PCIe host-staging "memory-saving" decon
tiers (reference:src/api_subfunc.cu:3468-3500) with ICI collectives, and
sidesteps XLA's auto-partitioned FFT (whose CPU thunk rejects the layouts
GSPMD picks for sharded inputs — found while testing on the virtual CPU
mesh)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rfft3_pencil(x_local, axis_name="sp"):
    """Local shard (z_loc, y, x) real -> spectral shard (z, y_loc, xh).
    Must run inside shard_map over ``axis_name``."""
    a = jnp.fft.rfft(x_local, axis=2)
    a = jnp.fft.fft(a, axis=1)
    # re-partition: split y into n chunks, concatenate z-slabs
    a = lax.all_to_all(a, axis_name, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(a, axis=0)


def irfft3_pencil(spec_local, nx, axis_name="sp"):
    """Inverse of rfft3_pencil: spectral shard (z, y_loc, xh) -> real
    shard (z_loc, y, x). ``nx`` is the full (even or odd) x extent."""
    a = jnp.fft.ifft(spec_local, axis=0)
    a = lax.all_to_all(a, axis_name, split_axis=0, concat_axis=1, tiled=True)
    a = jnp.fft.ifft(a, axis=1)
    return jnp.fft.irfft(a, axis=2, n=nx)


def conv_spec_pencil(x_local, otf_local, nx, axis_name="sp"):
    """FFT-convolution of a z-sharded volume with a y-sharded OTF."""
    return irfft3_pencil(rfft3_pencil(x_local, axis_name) * otf_local, nx, axis_name)
