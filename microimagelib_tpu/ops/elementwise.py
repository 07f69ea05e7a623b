"""Elementwise / reduction op suite — API parity with the reference's
kernel + launcher inventory (reference:include/cukernel.cuh:74-392,
reference:src/api_subfunc.cu:92-539).

Pipelines in this framework use jnp expressions directly (XLA fuses them
into neighboring FFT/gather programs, which is the whole point of the
TPU-native design); these named wrappers exist so users porting call
sites from the reference API find every operation, and so the component
inventory is explicit. All are jit-compatible, shape-polymorphic, and
work on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp

from microimagelib_tpu.ops.basics import max3d_with_coords


def add3d(a, b):
    return jnp.add(a, b)


def sub3d(a, b):
    return jnp.subtract(a, b)


def multi3d(a, b):
    return jnp.multiply(a, b)


def div3d(a, b):
    """Elementwise division — like the reference kernel, no zero guard
    (reference:include/cukernel.cuh:196-208)."""
    return jnp.divide(a, b)


def add_value(a, v):
    return a + v


def multi_value(a, v):
    return a * v


def max_value(a, v):
    """max(a, v) — the RL clamp primitive (``maxvalue3Dgpukernel``)."""
    return jnp.maximum(a, v)


def multicomplex(a, b):
    """Complex multiply (``multicomplex3Dkernel``,
    reference:include/cukernel.cuh:140-158)."""
    return a * b


def multidcomplex(a, b):
    """Double-complex multiply. TPU emulates f64; provided for parity
    (``multidcomplex3Dkernel``)."""
    return (a.astype(jnp.complex128) * b.astype(jnp.complex128))


def multicomplex_norm(a, b):
    """Normalized complex multiply: (a*b)/|a*b|, 0 where the magnitude is
    0 — the phasor cross-power kernel (``multicomplexnorm3Dkernel``,
    reference:include/cukernel.cuh:156-178)."""
    prod = a * b
    mag = jnp.abs(prod)
    return jnp.where(mag != 0, prod / mag, 0.0)


def conj3d(a):
    return jnp.conj(a)


def sum3d(a):
    """Full-volume sum (``sum3Dgpu``: z-collapse then host double sum,
    reference:src/api_subfunc.cu:385-402). jnp.sum reduces on device."""
    return jnp.sum(a)


def sum1d(a):
    """Strided partial-sum reduction equivalent (``sumgpu1D``)."""
    return jnp.sum(a.reshape(-1))


def reduce_z(a):
    """Per-(y, x) sum over z (``reduceZ``,
    reference:include/cukernel.cuh:349-360)."""
    return jnp.sum(a, axis=0)


def max_z(a):
    """Per-(y, x) max and argmax over z (``maxZkernel``,
    reference:include/cukernel.cuh:362-379)."""
    return jnp.max(a, axis=0), jnp.argmax(a, axis=0)


def max3d(a):
    """Max value + (x, y, z) coordinates (``max3Dgpu``)."""
    return max3d_with_coords(a)
