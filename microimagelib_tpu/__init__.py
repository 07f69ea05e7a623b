"""microimagelib_tpu — TPU-native 3D microscopy image processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
eguomin/microImageLib (CUDA): TIFF stack I/O, 3D affine transforms with
trilinear interpolation, 2D/3D intensity-based registration (phase
correlation + Powell-optimized NCC affine search), Richardson-Lucy
deconvolution (single-view and joint dual-view, matched or unmatched back
projectors), diSPIM dual-view fusion, 2D/3D maximum intensity projections,
and a time-lapse batch driver.

Design stance (TPU-first, not a port):
  * Volumes are canonical C-order ``(z, y, x)`` float32 ``jax.Array``s.
    The reference's dual storage-order trick (x/z size swap for FFT code,
    ``changestorageorder`` transposes) is eliminated; TIFF-facing size
    reporting stays (x, y, z) for CLI compatibility.
  * All compute-path ops are pure jitted functions; RL deconvolution runs
    as a ``lax.fori_loop`` over rFFT convolutions fused by XLA.
  * Registration cost (affine-resample + NCC partial sums, the reference's
    fused ``corrkernel``) is a single jitted device call per Powell
    evaluation, with an optional vectorized multi-probe line search.
  * Volumes larger than one chip's HBM shard over a ``jax.sharding.Mesh``
    (z-axis decomposition, XLA distributed FFT over ICI) — replacing the
    reference's gpuMemMode host-staging tiers. Time-lapse batches data-
    parallelize timepoints across chips/hosts.

Reference semantics cited throughout as ``reference:file:line`` refer to
eguomin/microImageLib at /root/reference.
"""

__version__ = "0.1.0"

from microimagelib_tpu.io.tiff import gettifinfo, readtifstack, writetifstack
from microimagelib_tpu.io.tmx import read_tmx, write_tmx
from microimagelib_tpu.utils.device import query_device
from microimagelib_tpu.utils.pathutil import concat, fexists
from microimagelib_tpu.ops.basics import align_size_3d as alignsize3d

__all__ = [
    "concat",
    "fexists",
    "alignsize3d",
    "gettifinfo",
    "readtifstack",
    "writetifstack",
    "read_tmx",
    "write_tmx",
    "query_device",
    "__version__",
]
