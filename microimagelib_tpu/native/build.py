"""Build the miltiff native extension in place.

Usage: python -m microimagelib_tpu.native.build
Compiles microimagelib_tpu/native/miltiff.cpp to miltiff.<abi>.so next to
it with g++ (no pybind11 needed — raw CPython C API)."""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build(verbose=True):
    src_dir = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(src_dir, "miltiff.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(src_dir, "miltiff" + ext)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", f"-I{include}", src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, os.path.dirname(path))
    import miltiff  # smoke import

    print("import OK:", miltiff.__doc__)
