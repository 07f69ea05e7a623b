"""Time-lapse batch fusion driver — the ``spimFusionBatch`` pipeline
(reference:src/spim_fusion_batch.cpp:117-997), with TPU-native upgrades:

  * TIFF reads for the NEXT timepoint are prefetched on a background
    thread while the device processes the current one, and TIFF writes
    (decon volume, registered views, MIPs) are retired on a writer pool —
    the reference reads/writes serially between kernels
    (reference:src/spim_fusion_batch.cpp:666-675 blocking reads)
  * OTFs are computed once and reused across timepoints (the reference
    re-derives them inside decon_dualview every timepoint)
  * registration semantics preserved exactly: regMode 0-3, the
    checkmatrix + costValueBar=0.1 retry cascade (swap regChoice 2<->4,
    then fall back to input/previous matrix), and regMode 2's weighted
    matrix propagation 0.8*prev + 0.2*new
    (reference:src/spim_fusion_batch.cpp:714-843)

Output tree (reference:src/spim_fusion_batch.cpp:244-319):
  out/Decon/Decon_<t>.tif, out/TMX/Matrix_<t>.tmx, out/RegA, out/RegB,
  out/Decon/{MP_ZProj,MP_XProj,MP_YProj,MP_3D_Xaxis,MP_3D_Yaxis},
  out/ProcessingLog.txt
"""

from __future__ import annotations

import os

from microimagelib_tpu.utils.envflags import env_on
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from microimagelib_tpu.io.tiff import gettifinfo, readtifstack, writetifstack
from microimagelib_tpu.io.tmx import read_tmx, write_tmx
from microimagelib_tpu.models.deconvolution import (
    decon_dualview_prepared,
    gen_otf,
    _fft_grid,
    _prep_pad,
    flip3,
)
from microimagelib_tpu.models.fusion import preprocess_views
from microimagelib_tpu.models.projections import mip3d, mp2d
from microimagelib_tpu.models.registration import checkmatrix, reg3d
from microimagelib_tpu.ops.affine import affine_transform_3d
from microimagelib_tpu.ops.matrix import identity_tmx

COST_VALUE_BAR = 0.1  # reference:src/spim_fusion_batch.cpp:563


def _warm_method(aff_method):
    """Registration method for regMode-2 WARM timepoints (idx > 0).

    The tempting optimization — collapse the escalation ladders (6
    rigid->12, 7 3->6->9->12) to ONE 12-DOF stage started at the
    propagated matrix (method-5 flagTmx semantics,
    reference:src/api_subfunc.cu:2893-2916) — measured WORSE on
    hardware: 43.7 tp/min at mean NCC 0.8233 vs 46.0 tp/min at 0.8285
    for the warm-started full ladder (round-5 `batch_reg2_new/old`
    A/B, BASELINE.md). The restricted early stages are cheap when the
    warm matrix already sits in the basin (they converge in a handful
    of low-DOF evals) and keep the search out of the expensive 12-DOF
    space longer. Default therefore keeps the configured method.
    MIL_BATCH_WARM_METHOD: '0'/'off'/'auto' (default, keep the
    configured method), 'collapse' (the measured-negative single-stage
    policy, kept reproducible), or an explicit method id."""
    wm_env = os.environ.get("MIL_BATCH_WARM_METHOD", "auto")
    if wm_env in ("0", "off", "auto"):
        return aff_method
    if wm_env == "collapse":
        return 5 if aff_method in (6, 7) else aff_method
    return int(wm_env)


def _warm_finish():
    """Powell finisher on regMode-2 WARM timepoints (idx > 0): OFF by
    default — the L-BFGS-only warm ladder measured **70.0 tp/min at
    mean final NCC 0.8186** vs 42.6-46.0 tp/min at 0.8285 with the
    finisher (round-5 `batch_reg2_nofinish` vs `base2/old` hardware
    A/B). regMode 2 is the reference's speed mode (its 0.8/0.2
    propagation already trades exactness for throughput,
    reference:src/spim_fusion_batch.cpp:804-806); the -0.01 NCC buys
    ~1.6x throughput. MIL_BATCH_WARM_FINISH=1 restores the finisher
    (the quality arm, deferring to the global MIL_REG_GRAD_FINISH);
    regMode 3 always runs the full cold cascade."""
    return None if env_on("MIL_BATCH_WARM_FINISH") else False


@dataclass
class BatchConfig:
    """The 34/36 positional arguments of the ImageJ diSPIMFusion protocol
    (reference:src/spim_fusion_batch.cpp:67-113)."""

    out_dir: str
    in_dir1: str
    in_dir2: str
    name1: str
    name2: str
    img_start: int
    img_end: int
    img_interval: int
    img_test: int
    pixel1: tuple  # (x, y, z) um
    pixel2: tuple
    reg_mode: int  # 0 none; 1 one-for-all; 2 dependent; 3 independent
    im_rotation: int  # 0 / 1 / -1
    flag_initial_tmx: int  # 0 identity; 1 file; 2 phasor; 3 2D MIP
    tmx_file: str
    ftol: float
    it_limit: int
    save_reg_a: bool
    save_reg_b: bool
    psf1_file: str
    psf2_file: str
    it_num_decon: int
    save_mp_z: bool
    save_mp_y: bool
    save_mp_x: bool
    save_3d_x: bool
    save_3d_y: bool
    bit_per_sample: int
    query_device: bool
    device_num: int
    psf1_bp_file: str = ""
    psf2_bp_file: str = ""
    # framework extensions (not in the reference protocol)
    overlap_io: bool = True
    verbose: bool = True
    # camera background subtraction (counts), clipped at zero. The
    # reference PARSES -bg1/-bg2 in spimFusion but never applies them
    # (reference:src/spim_fusion.cpp:194-202 sets bgValue1/2, which are
    # only ever printed; the help lines are commented out at :37-38) —
    # the ImageJ plugin side normally pre-subtracts. Implemented here so
    # raw sCMOS stacks (constant ~100-count offset) register correctly:
    # a constant offset hands the zero-filled out-of-footprint resample
    # planes ~100x the variance of any data plane and wrecks the NCC
    # objective (BASELINE.md round-3 note).
    bg1: float = 0.0
    bg2: float = 0.0


def _log(log_path, msg):
    with open(log_path, "a") as f:
        f.write(msg)


def _make_output_tree(out_dir, cfg):
    paths = {
        "decon": os.path.join(out_dir, "Decon"),
        "tmx": os.path.join(out_dir, "TMX"),
        "reg_a": os.path.join(out_dir, "RegA"),
        "reg_b": os.path.join(out_dir, "RegB"),
    }
    paths["mp_xy"] = os.path.join(paths["decon"], "MP_ZProj")
    paths["mp_yz"] = os.path.join(paths["decon"], "MP_XProj")
    paths["mp_zx"] = os.path.join(paths["decon"], "MP_YProj")
    paths["mp3d_x"] = os.path.join(paths["decon"], "MP_3D_Xaxis")
    paths["mp3d_y"] = os.path.join(paths["decon"], "MP_3D_Yaxis")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(paths["decon"], exist_ok=True)
    os.makedirs(paths["tmx"], exist_ok=True)  # tmx always saved
    if cfg.save_reg_a:
        os.makedirs(paths["reg_a"], exist_ok=True)
    if cfg.save_reg_b:
        os.makedirs(paths["reg_b"], exist_ok=True)
    if cfg.save_mp_z:
        os.makedirs(paths["mp_xy"], exist_ok=True)
    if cfg.save_mp_x:
        os.makedirs(paths["mp_yz"], exist_ok=True)
    if cfg.save_mp_y:
        os.makedirs(paths["mp_zx"], exist_ok=True)
    if cfg.save_3d_x:
        os.makedirs(paths["mp3d_x"], exist_ok=True)
    if cfg.save_3d_y:
        os.makedirs(paths["mp3d_y"], exist_ok=True)
    return paths


def _timepoint_list(cfg):
    return list(range(cfg.img_start, cfg.img_end + 1, cfg.img_interval))


def _register_with_cascade(a_iso, b_iso, reg_choice, aff_method, flag_tmx, tmx_in,
                           cfg, log_path, fallback_tmx, want_reg=None):
    """One registration attempt + the reference's retry cascade
    (reference:src/spim_fusion_batch.cpp:722-747). ``want_reg=False``
    skips the final transform in every attempt (the fused apply program
    re-applies the matrix) and returns None for the volume."""
    sz, sy, sx = a_iso.shape
    reg_b, out_tmx, rec = reg3d(a_iso, b_iso, reg_choice, aff_method, flag_tmx,
                                tmx_in, cfg.ftol, cfg.it_limit, verbose=cfg.verbose,
                                want_reg=want_reg)
    ok = checkmatrix(out_tmx, sx, sy, sz) and rec[3] >= COST_VALUE_BAR
    if not ok and reg_choice in (2, 4):
        _log(log_path, f"\n\t... Attempt failed: matrix problematic or cost {rec[3]:f} < {COST_VALUE_BAR:.2f}\n"
                        "\n\t... Change scheme and redo the registration!!!\n")
        alt = 2 if reg_choice == 4 else 4
        reg_b, out_tmx, rec = reg3d(a_iso, b_iso, alt, aff_method, False,
                                    None, cfg.ftol, cfg.it_limit, verbose=cfg.verbose,
                                    want_reg=want_reg)
        ok = checkmatrix(out_tmx, sx, sy, sz) and rec[3] >= COST_VALUE_BAR
        if not ok and fallback_tmx is not None:
            _log(log_path, f"\n\t... Attempt failed: matrix problematic or cost {rec[3]:f} < {COST_VALUE_BAR:.2f}\n"
                            "\n\t... Use input transformation matrix!!!\n")
            reg_b, out_tmx, rec = reg3d(a_iso, b_iso, 0, aff_method, True,
                                        fallback_tmx, cfg.ftol, cfg.it_limit, verbose=cfg.verbose,
                                        want_reg=want_reg)
    return reg_b, out_tmx, rec


def _flush_group_single(group, otfs, cfg, emit_outputs, log_path):
    """Single-chip grouped decon: one vmapped RL dispatch for the whole
    buffered group (round-2 verdict #7 — amortize the per-dispatch
    floor; the reference loops timepoints serially,
    reference:src/spim_fusion_batch.cpp:613-627)."""
    from microimagelib_tpu.models.deconvolution import (
        decon_dualview_prepared_batch,
    )

    t_dec = time.time()
    ts = [g[0] for g in group]
    out_shape = group[0][3]
    entries = list(group)
    # pad the final partial group to the configured size so the vmapped
    # program keeps ONE shape (a retrace costs minutes of device program
    # load on the axon tunnel)
    gs = max(1, int(os.environ.get("MIL_BATCH_GROUP", "1")))
    while len(entries) % gs:
        entries.append(entries[-1])
    pads_a = jnp.stack([e[1] for e in entries])
    pads_b = jnp.stack([e[2] for e in entries])
    # keep the group estimate device-resident: emit_outputs runs the MIPs
    # from device slices and only the TIFF writes fetch
    est = decon_dualview_prepared_batch(
        pads_a, pads_b, otfs["otf1"], otfs["otf2"], otfs["bp1"], otfs["bp2"],
        cfg.it_num_decon, False, out_shape)
    for i, t in enumerate(ts):
        emit_outputs(t, est[i])
    _log(log_path, f"\t... Deconvolution (group of {len(ts)}) time cost: "
                   f"{time.time() - t_dec:2.3f} s\n")


def _flush_group(group, otfs, mesh, cfg, emit_outputs, log_path):
    """Deconvolve a buffered group of registered timepoints in one sharded
    call: timepoints across the mesh 'dp' axis, volume z-extent across
    'sp' — the embarrassing batch parallelism the reference runs serially
    (reference:src/spim_fusion_batch.cpp:613-627)."""
    from microimagelib_tpu.ops.basics import crop_center
    from microimagelib_tpu.parallel.sharded import rl_decon_dual_batch_dp

    t_dec = time.time()
    n_dp = mesh.shape["dp"]
    ts = [g[0] for g in group]
    out_shape = group[0][3]
    entries = list(group)
    while len(entries) % n_dp:
        entries.append(entries[-1])  # pad the final partial group
    pads_a = jnp.stack([e[1] for e in entries])
    pads_b = jnp.stack([e[2] for e in entries])
    est = np.asarray(rl_decon_dual_batch_dp(
        pads_a, pads_b, otfs["otf1"], otfs["otf2"], otfs["bp1"], otfs["bp2"],
        cfg.it_num_decon, mesh))
    for i, t in enumerate(ts):
        d = est[i]
        if d.shape != out_shape:
            d = np.asarray(crop_center(jnp.asarray(d), out_shape))
        emit_outputs(t, d)
    _log(log_path, f"\t... Deconvolution (group of {len(ts)}) time cost: "
                   f"{time.time() - t_dec:2.3f} s\n")


def _build_fused_apply_tp(cfg, shape_a, shape_b, get_otfs, from_iso=False):
    """ONE jitted program for an apply-only timepoint (the regMode 0/1
    steady state): isotropize A, rotate+isotropize B, center-align B to
    the target grid (the matrix's source frame — reg3d registered the
    ALIGNED source, reference:src/api_reg.cpp:398-407), apply the
    transform matrix, pad, joint RL decon, crop, 2D MPs and rotating
    MIPs — all device-resident in a single dispatch. The unfused chain
    issues ~8 programs per timepoint, each paying ~0.1-0.2 s of
    dispatch/transfer latency on the tunneled TPU (BASELINE.md machine
    model); the reference runs the same chain as separate kernels +
    synchronous memcpys per timepoint
    (reference:src/spim_fusion_batch.cpp:613-627).

    ``from_iso=True`` builds the variant the registering regModes (2/3)
    use: shape_a/shape_b are the ALREADY-ISOTROPIZED view shapes (the
    registration consumed the preprocessed device arrays), so the
    program skips the resample/rotate stages and starts at align+apply.

    Returns (fused_fn, tgt_zyx); fused_fn(a_in, b_in, tmx12) -> dict of
    device arrays (decon + requested reg/MP/MIP outputs)."""
    import jax

    from microimagelib_tpu.models.deconvolution import (
        _accel_env,
        _fft_impl,
        _rl_dual,
        _stop_env,
    )
    from microimagelib_tpu.models.fusion import fusion_sizes
    from microimagelib_tpu.models.projections import (
        _factored_contract,
        _mp2d_flat,
        mip3d_factored_plan,
        mip3d_frames,
        mip3d_params,
    )
    from microimagelib_tpu.ops.basics import (
        align_size_3d,
        crop_center,
        rot_by_y_axis,
    )
    from microimagelib_tpu.ops.fft_matmul import mm_precision
    from microimagelib_tpu.ops.resample import resize3d_separable

    if from_iso:
        tgt_zyx = tuple(shape_a)
        b_zyx = tuple(shape_b)
        op_choice = 0
    else:
        size_a = (shape_a[2], shape_a[1], shape_a[0])
        size_b = (shape_b[2], shape_b[1], shape_b[0])
        tgt_xyz, b_xyz, op_choice = fusion_sizes(size_a, size_b, cfg.pixel1,
                                                 cfg.pixel2, cfg.im_rotation)
        tgt_zyx = (tgt_xyz[2], tgt_xyz[1], tgt_xyz[0])
        b_zyx = (b_xyz[2], b_xyz[1], b_xyz[0])
    grid = _fft_grid(tgt_zyx)
    otfs = get_otfs(grid)
    impl = _fft_impl(grid, otfs["otf1"])
    prec = mm_precision()
    accel = _accel_env()
    stop = _stop_env(None)
    mp_any = cfg.save_mp_z or cfg.save_mp_x or cfg.save_mp_y

    # every device buffer the program consumes rides in as an ARGUMENT
    # pytree, never a closed-over constant: jit lowering embeds captured
    # arrays as MLIR literals via a host fetch — tens of MB of MIP tap
    # tables would bloat the HLO, and on axon the c64 OTF fetch raises
    # UNIMPLEMENTED outright (complex host<->device transfers are
    # unsupported there, BASELINE.md env facts)
    bufs = {k: otfs[k] for k in ("otf1", "otf2", "bp1", "bp2")}
    mip_plans = {}
    for r_axis, want, key in ((1, cfg.save_3d_x, "mip_x"),
                              (2, cfg.save_3d_y, "mip_y")):
        if not want:
            continue
        p = mip3d_params(tgt_zyx, r_axis, 36, impl="factored")
        if p["impl"] == "factored":
            was, wbs = mip3d_factored_plan(tgt_zyx, p["mats"],
                                           p["out_shape"], r_axis,
                                           p["chunk"])
            bufs[key] = (was, wbs)
            mip_plans[key] = (r_axis, p["prec"], p["fgroup"])
        else:  # non-passthrough mats cannot happen for rot_to_matrix;
            mip_plans[key] = (r_axis, None, None)  # gather fallback

    @jax.jit
    def fused(a_in, b_in, tmx12, bufs):
        a = (a_in if tuple(a_in.shape) == tgt_zyx
             else resize3d_separable(a_in, tgt_zyx))
        b = b_in
        if op_choice != 0:
            b = rot_by_y_axis(b, 1 if op_choice == 1 else -1)
        if not from_iso and tuple(b.shape) != b_zyx:
            b = resize3d_separable(b, b_zyx)
        if tuple(b.shape) != tgt_zyx:
            # the matrix's source frame is the CENTER-ALIGNED view
            # (reg3d aligns mismatched sources before registering,
            # reference:src/api_reg.cpp:398-407) — applying it to the
            # unaligned view would shift B by the centering offset
            b = align_size_3d(b, tgt_zyx)
        reg_b = affine_transform_3d(b, tmx12, tgt_zyx)
        pad_a = _prep_pad(a, grid)
        pad_b = _prep_pad(reg_b, grid)
        est = _rl_dual(pad_a, pad_b, bufs["otf1"], bufs["otf2"],
                       bufs["bp1"], bufs["bp2"], cfg.it_num_decon, False,
                       impl, prec, accel, stop)
        if tuple(est.shape) != tgt_zyx:
            est = crop_center(est, tgt_zyx)
        out = {"decon": est}
        if cfg.save_reg_a:
            out["reg_a"] = a
        if cfg.save_reg_b:
            out["reg_b"] = reg_b
        if mp_any:
            out["mp"] = _mp2d_flat(est, cfg.save_mp_z, cfg.save_mp_x,
                                   cfg.save_mp_y)
        for key, (r_axis, mprec, fgroup) in mip_plans.items():
            if mprec is not None:
                was, wbs = bufs[key]
                out[key] = _factored_contract(est, was, wbs, r_axis,
                                              mprec, fgroup)
            else:
                out[key] = mip3d_frames(est, r_axis, 36)
        return out

    return (lambda a_in, b_in, tmx12: fused(a_in, b_in, tmx12, bufs)), tgt_zyx


def spim_fusion_batch(cfg: BatchConfig, mesh=None):
    """Run the batch pipeline. Returns the list of processed timepoints.

    ``mesh``: optional ('dp', 'sp') jax mesh — timepoints are deconvolved
    in dp-sized groups with volumes z-sharded over 'sp' (registration and
    I/O stay per-timepoint on the host)."""
    t_whole = time.time()
    paths = _make_output_tree(cfg.out_dir, cfg)

    # --- PSFs read once ---
    psf1, _ = readtifstack(cfg.psf1_file)
    psf2, _ = readtifstack(cfg.psf2_file)
    unmatch = bool(cfg.psf1_bp_file) and bool(cfg.psf2_bp_file)
    psf1_bp = readtifstack(cfg.psf1_bp_file)[0] if unmatch else None
    psf2_bp = readtifstack(cfg.psf2_bp_file)[0] if unmatch else None

    # --- initial matrix / regChoice mapping (reference:..:562-589) ---
    reg_choice = 2
    flag_itmx = False
    tmx_initial = None
    if cfg.flag_initial_tmx == 1:
        flag_itmx = True
        tmx_initial = read_tmx(cfg.tmx_file)
    elif cfg.flag_initial_tmx == 2:
        reg_choice = 3
    elif cfg.flag_initial_tmx == 3:
        reg_choice = 4
    aff_method = 6  # reference default for batch (src/spim_fusion_batch.cpp:561)

    timepoints = _timepoint_list(cfg)

    # --- multi-host timepoint data parallelism (SURVEY.md §2.7.3):
    # MIL_MULTIHOST=1 initializes jax.distributed from the standard env
    # vars and round-robins the timepoint list across processes; outputs
    # are keyed by timepoint index in the shared tree, so the shards are
    # disjoint and no further coordination is needed. regMode 2 chains
    # each timepoint's matrix from the previous one and cannot shard. ---
    process_tag = ""
    if env_on("MIL_MULTIHOST"):
        from microimagelib_tpu.parallel.distributed import (
            init_distributed,
            shard_timepoints,
        )

        if cfg.reg_mode == 2:
            raise ValueError(
                "MIL_MULTIHOST=1 cannot shard regMode 2 (dependent "
                "registration chains timepoints); use regMode 0, 1 or 3")
        init_distributed()
        import jax as _jax

        timepoints = shard_timepoints(timepoints)
        if _jax.process_index() > 0:
            process_tag = f".p{_jax.process_index()}"
    log_path = os.path.join(cfg.out_dir, f"ProcessingLog{process_tag}.txt")

    # --- log header: the full settings dump the reference writes before
    # processing (reference:src/spim_fusion_batch.cpp:455-524) ---
    from microimagelib_tpu.models.fusion import fusion_sizes

    first_t = timepoints[0] if timepoints else cfg.img_start
    size1_in = gettifinfo(os.path.join(cfg.in_dir1, f"{cfg.name1}{first_t}.tif"))[0]
    size2_in = gettifinfo(os.path.join(cfg.in_dir2, f"{cfg.name2}{first_t}.tif"))[0]
    psf_size = (psf1.shape[2], psf1.shape[1], psf1.shape[0])
    out_size, _, _ = fusion_sizes(size1_in, size2_in, cfg.pixel1, cfg.pixel2,
                                  cfg.im_rotation)
    px1, py1, pz1 = cfg.pixel1
    px2, py2, pz2 = cfg.pixel2
    reg_mode_text = {
        0: "...No registration\n",
        1: f"...One registration for all images, test image number: {cfg.img_test}\n",
        2: "...Perform registration for all images dependently\n",
        3: "...Perform registration for all images independently\n",
    }.get(cfg.reg_mode, "...regMode incorrect !!!\n")
    rot_text = {
        0: "...No rotation on image B\n",
        1: "...Rotate image B by 90 degree along Y axis\n",
        -1: "...Rotate image B by -90 degree along Y axis\n",
    }.get(cfg.im_rotation, "")
    itmx_text = {
        1: "...Initial transformation matrix: based on input matrix\n",
        2: "...Initial transformation matrix: by 3D phase translation\n",
        3: "...Initial transformation matrix: by 2D registration\n",
    }.get(cfg.flag_initial_tmx, "...Initial transformation matrix: Default\n")
    with open(log_path, "w") as f:
        f.write(f"microimagelib_tpu spimFusionBatch: {time.ctime()}\n")
        f.write("Single color data:\n")
        f.write(f"...SPIMA input directory: {cfg.in_dir1}\n")
        f.write(f"...SPIMB input directory: {cfg.in_dir2}\n")
        f.write(f"...Output directory: {cfg.out_dir}\n")
        f.write("\nImage information:\n")
        f.write(f"\tInput image 1 size {size1_in[0]} x {size1_in[1]} x {size1_in[2]}\n")
        f.write(f"\t\t pixel size {px1:.4f} um x {py1:.4f} um x {pz1:.4f} um\n")
        f.write(f"\tInput image 2 size {size2_in[0]} x {size2_in[1]} x {size2_in[2]}\n")
        f.write(f"\t\t pixel size {px2:.4f} um x {py2:.4f} um x {pz2:.4f} um\n")
        f.write(f"\tPSF image size {psf_size[0]} x {psf_size[1]} x {psf_size[2]}\n")
        f.write(f"\t\t pixel size {px1:.4f} um x {px1:.4f} um x {px1:.4f} um\n")
        f.write(f"\tOutput image size {out_size[0]} x {out_size[1]} x {out_size[2]}\n")
        f.write(f"\t\t pixel size {px1:.4f} um x {px1:.4f} um x {px1:.4f} um\n")
        f.write(f"\tImage number from {cfg.img_start} to {cfg.img_end} with step {cfg.img_interval}\n")
        f.write(reg_mode_text)
        f.write(rot_text)
        f.write(itmx_text)
        f.write(f"...Registration convergence threshold:{cfg.ftol:f}\n")
        f.write(f"...Registration maximum sub-iteration number:{cfg.it_limit}\n")
        f.write(f"\n...Unmatched back projectors for joint deconvolution: {'yes' if unmatch else 'no'}\n")
        f.write(f"...Iteration number for joint deconvolution:{cfg.it_num_decon}\n")
        f.write(f"\n...Device {cfg.device_num} is used...\n\n")

    def img_paths(t):
        return (os.path.join(cfg.in_dir1, f"{cfg.name1}{t}.tif"),
                os.path.join(cfg.in_dir2, f"{cfg.name2}{t}.tif"))

    def _sub_bg(arr, bg):
        """Camera background subtraction, clipped at zero (cfg.bg1/bg2 —
        the working version of the reference's dead -bg flags)."""
        if not bg:
            return arr
        return np.maximum(np.asarray(arr, np.float32) - np.float32(bg), 0.0)

    # --- background reader: prefetch next timepoint while device works ---
    read_q: "queue.Queue" = queue.Queue(maxsize=2)

    def reader(tp_list):
        for t in tp_list:
            p1, p2 = img_paths(t)
            try:
                a = _sub_bg(readtifstack(p1)[0], cfg.bg1)
                b = _sub_bg(readtifstack(p2)[0], cfg.bg2)
                read_q.put((t, a, b))
            except Exception as e:  # surface read failures in order
                read_q.put((t, e, None))
        read_q.put(None)

    writer_pool = ThreadPoolExecutor(max_workers=2) if cfg.overlap_io else None
    pending = []

    def write_async(fn, *args):
        if writer_pool is not None:
            pending.append(writer_pool.submit(fn, *args))
        else:
            fn(*args)

    # --- regMode state ---
    reg_mode = cfg.reg_mode
    tmx_previous = None
    tmx_weighted = None
    tmx_apply = tmx_initial  # matrix applied in regMode 0 passes

    # --- OTFs computed once, reused across every timepoint (the reference
    # re-derives them inside decon_dualview per timepoint) ---
    otf_state = {}

    def get_otfs(grid_shape):
        if otf_state.get("shape") != grid_shape:
            otf_state["shape"] = grid_shape
            p1 = jnp.asarray(psf1)
            p2 = jnp.asarray(psf2)
            otf_state["otf1"] = gen_otf(p1, grid_shape)
            otf_state["otf2"] = gen_otf(p2, grid_shape)
            if unmatch:
                otf_state["bp1"] = gen_otf(jnp.asarray(psf1_bp), grid_shape)
                otf_state["bp2"] = gen_otf(jnp.asarray(psf2_bp), grid_shape)
            else:
                otf_state["bp1"] = gen_otf(flip3(p1), grid_shape)
                otf_state["bp2"] = gen_otf(flip3(p2), grid_shape)
        return otf_state

    # regMode 1: register the test timepoint first, then apply to all
    if reg_mode == 1:
        t = cfg.img_test
        p1, p2 = img_paths(t)
        a_in = _sub_bg(readtifstack(p1)[0], cfg.bg1)
        b_in = _sub_bg(readtifstack(p2)[0], cfg.bg2)
        a_iso, b_iso = preprocess_views(a_in, b_in, cfg.pixel1, cfg.pixel2,
                                        cfg.im_rotation, verbose=cfg.verbose)
        _log(log_path, f"\n*** Registration on test image number: {t} \n")
        _, tmx_apply, _ = _register_with_cascade(
            a_iso, b_iso, reg_choice, aff_method, flag_itmx, tmx_initial,
            cfg, log_path, tmx_initial if flag_itmx else None)
        reg_mode = 0
        flag_itmx = True

    reader_thread = None
    if cfg.overlap_io:
        reader_thread = threading.Thread(target=reader, args=(timepoints,), daemon=True)
        reader_thread.start()

    processed = []
    group = []
    # single-chip decon grouping: MIL_BATCH_GROUP timepoints per vmapped
    # dispatch (1 = per-timepoint, the reference-faithful default)
    group_size = max(1, int(os.environ.get("MIL_BATCH_GROUP", "1")))

    # --- fused apply-only fast path (regMode 0/1 steady state): ONE
    # device program per timepoint, with one-deep pipelining — the host
    # fetch + TIFF writes of timepoint t overlap the device compute of
    # t+1 (outputs are fetched asynchronously right after dispatch) ---
    fused_state: dict = {}
    in_flight = None

    def _collect_fused(slot):
        t_out, outs, t0_tp = slot
        dec = np.asarray(outs["decon"])
        sz_o, sy_o, sx_o = dec.shape
        write_async(writetifstack,
                    os.path.join(paths["decon"], f"Decon_{t_out}.tif"),
                    dec, cfg.bit_per_sample)
        if "reg_a" in outs:
            write_async(writetifstack,
                        os.path.join(paths["reg_a"], f"{cfg.name1}reg_{t_out}.tif"),
                        np.asarray(outs["reg_a"]), cfg.bit_per_sample)
        if "reg_b" in outs:
            write_async(writetifstack,
                        os.path.join(paths["reg_b"], f"{cfg.name2}reg_{t_out}.tif"),
                        np.asarray(outs["reg_b"]), cfg.bit_per_sample)
        if "mp" in outs:
            flat = np.asarray(outs["mp"])
            off = 0
            if cfg.save_mp_z:
                write_async(writetifstack,
                            os.path.join(paths["mp_xy"], f"MP_XY_{t_out}.tif"),
                            flat[off:off + sy_o * sx_o].reshape(sy_o, sx_o),
                            cfg.bit_per_sample)
                off += sy_o * sx_o
            if cfg.save_mp_x:
                write_async(writetifstack,
                            os.path.join(paths["mp_yz"], f"MP_YZ_{t_out}.tif"),
                            flat[off:off + sz_o * sy_o].reshape(sz_o, sy_o),
                            cfg.bit_per_sample)
                off += sz_o * sy_o
            if cfg.save_mp_y:
                write_async(writetifstack,
                            os.path.join(paths["mp_zx"], f"MP_ZX_{t_out}.tif"),
                            flat[off:off + sx_o * sz_o].reshape(sx_o, sz_o),
                            cfg.bit_per_sample)
        if "mip_x" in outs:
            write_async(writetifstack,
                        os.path.join(paths["mp3d_x"], f"MP_3D_Xaxis_{t_out}.tif"),
                        np.asarray(outs["mip_x"]), cfg.bit_per_sample)
        if "mip_y" in outs:
            write_async(writetifstack,
                        os.path.join(paths["mp3d_y"], f"MP_3D_Yaxis_{t_out}.tif"),
                        np.asarray(outs["mip_y"]), cfg.bit_per_sample)
        dt = time.time() - t0_tp
        _log(log_path, f"...Time cost for current image is {dt:2.3f} s\n")
        if cfg.verbose:
            print(f"...Time cost for current image is {dt:2.3f} s")
    for idx, t in enumerate(timepoints):
        t0 = time.time()
        if cfg.overlap_io:
            item = read_q.get()
            if item is None:
                break
            t_got, a_in, b_in = item
            if isinstance(a_in, Exception):
                raise a_in
            assert t_got == t
        else:
            p1, p2 = img_paths(t)
            a_in = _sub_bg(readtifstack(p1)[0], cfg.bg1)
            b_in = _sub_bg(readtifstack(p2)[0], cfg.bg2)

        if cfg.verbose:
            print(f"\n*** Image time point number: {t} ")
        _log(log_path, f"\n*** Image time point number: {t} \n... Registration...\n")

        if (reg_mode == 0 and tmx_apply is not None and mesh is None
                and group_size == 1 and env_on("MIL_BATCH_FUSED", True)):
            key = (np.shape(a_in), np.shape(b_in))
            if fused_state.get("key") != key:
                fused_state["key"] = key
                fused_state["fn"], _ = _build_fused_apply_tp(
                    cfg, key[0], key[1], get_otfs)
                fused_state["tmx"] = jnp.asarray(
                    np.asarray(tmx_apply, np.float32))
            outs = fused_state["fn"](jnp.asarray(a_in, jnp.float32),
                                     jnp.asarray(b_in, jnp.float32),
                                     fused_state["tmx"])
            for v in outs.values():
                try:
                    v.copy_to_host_async()  # fetch overlaps next dispatch
                except Exception:  # backend without async D2H: sync later
                    break
            write_tmx(os.path.join(paths["tmx"], f"Matrix_{t}.tmx"),
                      np.asarray(tmx_apply, np.float32).copy())
            _log(log_path, "\t... fused apply+decon+MIP program\n")
            if in_flight is not None:
                _collect_fused(in_flight)
            in_flight = (t, outs, t0)
            processed.append(t)
            continue

        # --- fused path for the REGISTERING regModes (2 dependent /
        # 3 independent, reference:src/spim_fusion_batch.cpp:757-843):
        # preprocess stays device-resident, registration returns ONLY the
        # matrix (want_reg=False — the apply program re-applies it), and
        # the whole align+transform+decon+MIP chain is the same ONE-
        # program dispatch as the regMode-0/1 steady state, one-deep
        # pipelined so t's output fetch/TIFF writes overlap t+1's
        # registration. regMode 2's subsequent timepoints warm-start
        # from the propagated 0.8/0.2 matrix with the coarse/mid pyramid
        # stages skipped (our pyramid is an extension the reference
        # lacks; the warm matrix already encodes the coarse alignment —
        # MIL_BATCH_WARM_PYRAMID=1 restores them), and the reference's
        # previous-matrix fallback still fires on checkmatrix/cost-bar
        # failure. ---
        if (reg_mode in (2, 3) and mesh is None and group_size == 1
                and env_on("MIL_BATCH_FUSED", True)):
            a_iso, b_iso = preprocess_views(a_in, b_in, cfg.pixel1,
                                            cfg.pixel2, cfg.im_rotation,
                                            verbose=cfg.verbose,
                                            as_device=True)
            sz, sy, sx = a_iso.shape
            rec = np.zeros(11)
            if reg_mode == 2 and idx > 0:
                warm_pyr = ("auto" if env_on("MIL_BATCH_WARM_PYRAMID")
                            else False)
                _, out_tmx, rec = reg3d(a_iso, b_iso, 2,
                                        _warm_method(aff_method), True,
                                        tmx_weighted, cfg.ftol, cfg.it_limit,
                                        verbose=cfg.verbose, want_reg=False,
                                        pyramid=warm_pyr,
                                        grad_finish=_warm_finish())
                ok = (checkmatrix(out_tmx, sx, sy, sz)
                      and rec[3] >= COST_VALUE_BAR)
                if not ok:
                    _log(log_path, f"\n\t... Attempt failed: matrix problematic or cost {rec[3]:f} < {COST_VALUE_BAR:.2f}\n"
                                    "\n\t... Use previous transformation matrix!!!\n")
                    _, out_tmx, rec = reg3d(a_iso, b_iso, 0, aff_method, True,
                                            tmx_previous, cfg.ftol,
                                            cfg.it_limit, verbose=cfg.verbose,
                                            want_reg=False)
                tmx_weighted = 0.8 * tmx_weighted + 0.2 * out_tmx  # reference:..:804-806
                tmx_previous = out_tmx.copy()
            else:
                _, out_tmx, rec = _register_with_cascade(
                    a_iso, b_iso, reg_choice, aff_method, flag_itmx,
                    tmx_initial, cfg, log_path,
                    tmx_initial if flag_itmx else None, want_reg=False)
                if reg_mode == 2:
                    tmx_weighted = out_tmx.copy()
                    tmx_previous = out_tmx.copy()
            _log(log_path, f"\t... initial cost function value: {rec[1]:f}\n"
                            f"\t... final cost function value: {rec[3]:f}\n"
                            f"\t... registration time cost: {rec[7]:2.3f} s\n")
            write_tmx(os.path.join(paths["tmx"], f"Matrix_{t}.tmx"),
                      np.asarray(out_tmx, np.float32).copy())
            key = ("iso", tuple(a_iso.shape), tuple(b_iso.shape))
            if fused_state.get("key") != key:
                fused_state["key"] = key
                fused_state["fn"], _ = _build_fused_apply_tp(
                    cfg, tuple(a_iso.shape), tuple(b_iso.shape), get_otfs,
                    from_iso=True)
            outs = fused_state["fn"](a_iso, b_iso,
                                     jnp.asarray(np.asarray(out_tmx,
                                                            np.float32)))
            for v in outs.values():
                try:
                    v.copy_to_host_async()  # fetch overlaps next dispatch
                except Exception:
                    break
            _log(log_path, "\t... fused apply+decon+MIP program\n")
            if in_flight is not None:
                _collect_fused(in_flight)
            in_flight = (t, outs, t0)
            processed.append(t)
            continue

        # device-resident fast path: the rotate/resample/transform/decon/
        # MIP chain stays on device; host round trips between stages cost
        # ~0.1-0.2 s EACH at batch-class shapes on a tunneled TPU
        a_iso, b_iso = preprocess_views(a_in, b_in, cfg.pixel1, cfg.pixel2,
                                        cfg.im_rotation, verbose=cfg.verbose,
                                        as_device=True)
        sz, sy, sx = a_iso.shape
        t1 = time.time()

        # --- registration per regMode ---
        rec = np.zeros(11)
        if reg_mode == 0:
            # apply-only: one device dispatch, no host round trip (same
            # semantics as reg3d choice 0 / affMethod 0 in mem mode 1);
            # center-align B to the target grid first — the matrix's
            # source frame (reference:src/api_reg.cpp:398-407)
            if tmx_apply is not None:
                from microimagelib_tpu.ops.basics import align_size_3d

                b_al = (b_iso if tuple(b_iso.shape) == (sz, sy, sx)
                        else align_size_3d(b_iso, (sz, sy, sx)))
                reg_b = affine_transform_3d(b_al,
                                            np.asarray(tmx_apply, np.float32),
                                            (sz, sy, sx))
                out_tmx = np.asarray(tmx_apply, np.float32).copy()
            else:
                reg_b = b_iso
                out_tmx = identity_tmx()
            rec[7] = time.time() - t1
        elif reg_mode == 2:
            if idx == 0:
                reg_b, out_tmx, rec = _register_with_cascade(
                    a_iso, b_iso, reg_choice, aff_method, flag_itmx, tmx_initial,
                    cfg, log_path, tmx_initial if flag_itmx else None)
                tmx_weighted = out_tmx.copy()
            else:
                # same warm-timepoint policy as the fused path above:
                # single 12-DOF stage from the propagated matrix, pyramid
                # off (MIL_BATCH_WARM_METHOD / MIL_BATCH_WARM_PYRAMID)
                reg_b, out_tmx, rec = reg3d(a_iso, b_iso, 2,
                                            _warm_method(aff_method), True,
                                            tmx_weighted, cfg.ftol, cfg.it_limit,
                                            verbose=cfg.verbose,
                                            pyramid=("auto" if env_on(
                                                "MIL_BATCH_WARM_PYRAMID")
                                                else False),
                                            grad_finish=_warm_finish())
                ok = checkmatrix(out_tmx, sx, sy, sz) and rec[3] >= COST_VALUE_BAR
                if not ok:
                    _log(log_path, f"\n\t... Attempt failed: matrix problematic or cost {rec[3]:f} < {COST_VALUE_BAR:.2f}\n"
                                    "\n\t... Use previous transformation matrix!!!\n")
                    reg_b, out_tmx, rec = reg3d(a_iso, b_iso, 0, aff_method, True,
                                                tmx_previous, cfg.ftol, cfg.it_limit,
                                                verbose=cfg.verbose)
                tmx_weighted = 0.8 * tmx_weighted + 0.2 * out_tmx  # reference:..:804-806
            tmx_previous = out_tmx.copy()
        else:  # reg_mode == 3 (independent); also any other value
            reg_b, out_tmx, rec = _register_with_cascade(
                a_iso, b_iso, reg_choice, aff_method, flag_itmx, tmx_initial,
                cfg, log_path, tmx_initial if flag_itmx else None)

        _log(log_path, f"\t... initial cost function value: {rec[1]:f}\n"
                        f"\t... final cost function value: {rec[3]:f}\n"
                        f"\t... registration time cost: {rec[7]:2.3f} s\n")
        write_tmx(os.path.join(paths["tmx"], f"Matrix_{t}.tmx"), out_tmx)
        if cfg.save_reg_a:
            write_async(writetifstack, os.path.join(paths["reg_a"], f"{cfg.name1}reg_{t}.tif"),
                        np.asarray(a_iso), cfg.bit_per_sample)
        if cfg.save_reg_b:
            write_async(writetifstack, os.path.join(paths["reg_b"], f"{cfg.name2}reg_{t}.tif"),
                        np.asarray(reg_b), cfg.bit_per_sample)
        t2 = time.time()

        def emit_outputs(t_out, decon):
            # MIPs run from the device-resident volume (no re-upload);
            # the TIFF write fetches once, in this thread — device
            # fetches from the async writer threads are not safe on the
            # tunneled backend
            dec_dev = jnp.asarray(decon, jnp.float32)
            dec_np = (decon if isinstance(decon, np.ndarray)
                      else np.asarray(dec_dev))
            write_async(writetifstack, os.path.join(paths["decon"], f"Decon_{t_out}.tif"),
                        dec_np, cfg.bit_per_sample)
            if cfg.save_mp_z or cfg.save_mp_x or cfg.save_mp_y:
                mps = mp2d(dec_dev, cfg.save_mp_z, cfg.save_mp_x, cfg.save_mp_y)
                if cfg.save_mp_z:
                    write_async(writetifstack, os.path.join(paths["mp_xy"], f"MP_XY_{t_out}.tif"),
                                mps["xy"], cfg.bit_per_sample)
                if cfg.save_mp_x:
                    write_async(writetifstack, os.path.join(paths["mp_yz"], f"MP_YZ_{t_out}.tif"),
                                mps["yz"], cfg.bit_per_sample)
                if cfg.save_mp_y:
                    write_async(writetifstack, os.path.join(paths["mp_zx"], f"MP_ZX_{t_out}.tif"),
                                mps["zx"], cfg.bit_per_sample)
            if cfg.save_3d_x:
                write_async(writetifstack, os.path.join(paths["mp3d_x"], f"MP_3D_Xaxis_{t_out}.tif"),
                            mip3d(dec_dev, 1, 36), cfg.bit_per_sample)
            if cfg.save_3d_y:
                write_async(writetifstack, os.path.join(paths["mp3d_y"], f"MP_3D_Yaxis_{t_out}.tif"),
                            mip3d(dec_dev, 2, 36), cfg.bit_per_sample)

        # --- joint deconvolution (precomputed OTFs, reused every timepoint) ---
        _log(log_path, "... Deconvolution...\n")
        t_dec = time.time()
        grid = _fft_grid((sz, sy, sx))
        otfs = get_otfs(grid)
        pad_a = _prep_pad(jnp.asarray(a_iso, jnp.float32), grid)
        pad_b = _prep_pad(jnp.asarray(reg_b, jnp.float32), grid)
        if mesh is not None:
            # mesh mode: buffer registered pairs, decon a dp-sized group in
            # one sharded call (timepoints across 'dp', volumes across 'sp')
            group.append((t, pad_a, pad_b, (sz, sy, sx)))
            if len(group) == mesh.shape["dp"]:
                _flush_group(group, otfs, mesh, cfg, emit_outputs, log_path)
                group.clear()
        elif group_size > 1:
            # single-chip grouping (MIL_BATCH_GROUP>1): buffer registered
            # pairs and run the whole group through ONE vmapped RL program
            # — amortizes the per-dispatch floor the reference's serial
            # loop pays per timepoint (round-2 verdict #7)
            group.append((t, pad_a, pad_b, (sz, sy, sx)))
            if len(group) == group_size:
                _flush_group_single(group, otfs, cfg, emit_outputs, log_path)
                group.clear()
        else:
            # device array through to emit_outputs — MIPs chain on it and
            # only the TIFF write fetches to host
            decon = decon_dualview_prepared(
                pad_a, pad_b, otfs["otf1"], otfs["otf2"], otfs["bp1"], otfs["bp2"],
                cfg.it_num_decon, False, (sz, sy, sx))
            _log(log_path, f"\t... Deconvolution time cost: {time.time() - t_dec:2.3f} s\n")
            emit_outputs(t, decon)

        processed.append(t)
        _log(log_path, f"...Time cost for current image is {time.time() - t0:2.3f} s\n")
        if cfg.verbose:
            print(f"...Time cost for current image is {time.time() - t0:2.3f} s")

    if in_flight is not None:
        _collect_fused(in_flight)
        in_flight = None
    if group:
        if mesh is not None:
            _flush_group(group, otf_state, mesh, cfg, emit_outputs, log_path)
        else:
            _flush_group_single(group, otf_state, cfg, emit_outputs, log_path)
        group.clear()

    # drain writers
    if writer_pool is not None:
        for fut in pending:
            fut.result()
        writer_pool.shutdown()
    _log(log_path, f"Total time cost for whole processing is {time.time() - t_whole:2.3f} s\n")
    return processed


def find_color_folders(main_folder):
    """Multicolor layout scan: subfolders containing SPIMA/ and SPIMB/
    (the reference only supports this on Windows,
    reference:src/spim_fusion_batch.cpp:25-55; we support it everywhere)."""
    colors = []
    for name in sorted(os.listdir(main_folder)):
        sub = os.path.join(main_folder, name)
        if os.path.isdir(os.path.join(sub, "SPIMA")) and os.path.isdir(os.path.join(sub, "SPIMB")):
            colors.append(name)
    return colors


def spim_fusion_batch_multicolor(main_folder, out_main_folder, cfg_template: BatchConfig):
    """Run the batch per color subfolder (<main>/<color>/SPIMA|SPIMB)."""
    import dataclasses
    colors = find_color_folders(main_folder)
    if not colors:
        raise FileNotFoundError(f"No color subfolders with SPIMA/SPIMB under {main_folder}")
    results = {}
    for color in colors:
        cfg = dataclasses.replace(
            cfg_template,
            out_dir=os.path.join(out_main_folder, color),
            in_dir1=os.path.join(main_folder, color, "SPIMA"),
            in_dir2=os.path.join(main_folder, color, "SPIMB"),
        )
        results[color] = spim_fusion_batch(cfg)
    return results
