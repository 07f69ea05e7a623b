"""reg3D — intensity-based 3D image registration CLI, flag-compatible with
the reference app (reference:src/reg3D.cpp:13-54 for the manual,
:56-339 for behavior)."""

from __future__ import annotations

import sys
import time

import numpy as np

from microimagelib_tpu.cli._common import FlagParser, read_stack_checked, setup_jax_cache, tifinfo_checked

HELP = """
reg3D: intensity-based 3D image registration

Usage:\treg3D -t <targetImageName> -s <sourceImageName> -o <outputImageName> [OPTIONS]
\tOnly 16-bit or 32-bit standard TIFF images are currently supported.

= = [OPTIONS] = = = = = = = = = = = = = = = = = = = = = = = = = = = = = = =
\t-t <filename>\t\tTarget image filename (Fixed or Base image) (mandatory)
\t-s <filename>\t\tSource image filename (Moving or Floating image) (mandatory)
\t-o <filename>\t\tOutput filename of the registered image (mandatory)
\t-itmx <filename>\tInput tranformation matrix filename [identity matrix]
\t-otmx <filename>\tOutput tranformation matrix filename [no output]
\t-regc <int>\t\tOptions for registration choice [2]
\t\t\t\t0: no registration, but transform source image based on input matrix
\t\t\t\t1: phasor registraion (pixel-level translation, input matrix disabled)
\t\t\t\t2: affine registration (with or without input matrix)
\t\t\t\t3: phasor registration --> affine registration (input matrix disabled)
\t\t\t\t4: 2D MIP registration --> affine registration (input matrix disabled)
\t-affm <int>\t\tOptions for affine method [7]
\t\t\t\t0: no affine, but transform source image based on input matrix
\t\t\t\t1: translation only (3 DOF)
\t\t\t\t2: rigid-body (6 DOF)
\t\t\t\t3: 7 DOF\t4: 9 DOF\t5: directly 12 DOF
\t\t\t\t6: rigid body (6 DOF) --> 12 DOF
\t\t\t\t7: 3 DOF --> 6 DOF--> 9 DOF--> 12 DOF
\t-ftol <float>\t\tTolerance or threshold of the stop point [0.0001]
\t-it <int>\t\tMaximum iteration number [3000]
\t-gm <int>\t\tMemory mode (kept for compatibility; TPU path is single-tier) [-1]
\t-dev <int>\t\tSpecify the device if multiple devices [0]
\t-bit <int>\t\tSpecify output image bit: 16 or 32 [same as input image]
\t-verbON or -verbOFF\tTurn on/off verbose information [ON]
\t-log <filename>\t\tLog filename [no log file]
"""

VALUE_FLAGS = {"-t", "-s", "-o", "-itmx", "-otmx", "-regc", "-affm", "-ftol",
               "-it", "-gm", "-dev", "-bit", "-log"}
BARE_FLAGS = {"-verbON", "-verbOFF", "-h", "-help"}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(HELP.split("= = [OPTIONS]")[0])
        print("Use command for more details:\n\treg3D -help or reg3D -h")
        return 0
    if "-h" in argv or "-help" in argv:
        print(HELP)
        return 0
    setup_jax_cache()
    fp = FlagParser(argv).parse(VALUE_FLAGS, BARE_FLAGS)
    file_tgt = fp.get("-t")
    file_src = fp.get("-s")
    file_out = fp.get("-o")
    if not (file_tgt and file_src and file_out):
        print("*** -t, -s and -o are mandatory")
        return 1
    reg_choice = fp.get("-regc", 2, int)
    aff_method = fp.get("-affm", 7, int)
    ftol = fp.get("-ftol", 1e-4, float)
    it_limit = fp.get("-it", 3000, int)
    device_num = fp.get("-dev", 0, int)
    verbose = not fp.has("-verbOFF")
    start = time.time()

    from microimagelib_tpu.io.tiff import writetifstack
    from microimagelib_tpu.io.tmx import read_tmx, write_tmx
    from microimagelib_tpu.models.registration import reg3d
    from microimagelib_tpu.utils.device import get_device

    _, bits_in = tifinfo_checked(file_tgt)
    bit_out = fp.get("-bit", int(bits_in), int)
    img1, size1 = read_stack_checked(file_tgt, "target image")
    img2, size2 = read_stack_checked(file_src, "source image")
    tmx = None
    flag_tmx = False
    if fp.has("-itmx"):
        tmx = read_tmx(fp.get("-itmx"))
        flag_tmx = True

    records = np.zeros(11)
    time1 = time.time()
    print("=== Registration starting ...")
    reg, out_tmx, records = reg3d(
        img1, img2, reg_choice, aff_method, flag_tmx, tmx, ftol, it_limit,
        device=get_device(device_num), verbose=verbose, records=records)
    time2 = time.time()

    writetifstack(file_out, reg, bit_out)
    if fp.has("-otmx"):
        write_tmx(fp.get("-otmx"), out_tmx)
    end = time.time()
    print(f"\n****Time cost for  image reading/writing: {end - time2 + time1 - start:2.3f} s")
    print(f"\n****Time cost for  registration: {time2 - time1:2.3f} s")
    print(f"\n****Time cost for  whole processing: {end - start:2.3f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
