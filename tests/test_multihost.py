"""Multi-host batch data parallelism: two real processes coordinate via
jax.distributed, split the timepoints disjointly, and fill one shared
output tree (SURVEY.md §2.7.3; round-2 verdict missing #3)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {repo!r})
from microimagelib_tpu.models.batch import BatchConfig, spim_fusion_batch

root = {root!r}
cfg = BatchConfig(
    out_dir=os.path.join(root, "out"),
    in_dir1=os.path.join(root, "SPIMA"), in_dir2=os.path.join(root, "SPIMB"),
    name1="SPIMA_", name2="SPIMB_",
    img_start=0, img_end=3, img_interval=1, img_test=0,
    pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
    reg_mode=0, im_rotation=0, flag_initial_tmx=0, tmx_file="",
    ftol=1e-4, it_limit=100, save_reg_a=False, save_reg_b=False,
    psf1_file=os.path.join(root, "psf.tif"),
    psf2_file=os.path.join(root, "psf.tif"),
    it_num_decon=2, save_mp_z=True, save_mp_y=False, save_mp_x=False,
    save_3d_x=False, save_3d_y=False, bit_per_sample=32,
    query_device=False, device_num=0, verbose=False)
done = spim_fusion_batch(cfg)
with open(os.path.join(root, f"done_{{os.environ['JAX_PROCESS_ID']}}.json"), "w") as f:
    json.dump([int(t) for t in done], f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port



def test_two_process_batch_disjoint_and_merged(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from microimagelib_tpu.io.tiff import writetifstack

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "SPIMA"))
    os.makedirs(os.path.join(root, "SPIMB"))
    rng = np.random.default_rng(0)
    base = rng.random((12, 24, 20)).astype(np.float32) * 50 + 2
    for t in range(4):
        writetifstack(os.path.join(root, "SPIMA", f"SPIMA_{t}.tif"),
                      base * (1 + 0.1 * t), 32)
        writetifstack(os.path.join(root, "SPIMB", f"SPIMB_{t}.tif"),
                      base * (1 + 0.1 * t) + 1.0, 32)
    psf = np.exp(-np.sum(np.square(np.mgrid[-2:3, -2:3, -2:3]), 0) / 2.0)
    writetifstack(os.path.join(root, "psf.tif"),
                  (psf / psf.sum()).astype(np.float32), 32)

    port = _free_port()
    script = CHILD.format(repo=repo, root=root)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "MIL_MULTIHOST": "1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        procs.append(subprocess.Popen([sys.executable, "-c", script],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    shards = []
    for pid in range(2):
        with open(os.path.join(root, f"done_{pid}.json")) as f:
            shards.append(set(json.load(f)))
    assert shards[0] & shards[1] == set(), "timepoint shards overlap"
    assert shards[0] | shards[1] == {0, 1, 2, 3}
    # merged output tree: every timepoint's fused volume present
    decon_dir = os.path.join(root, "out")
    found = []
    for dirpath, _dirs, files in os.walk(decon_dir):
        for fn in files:
            if fn.endswith(".tif") and "Decon" in dirpath + fn:
                found.append(fn)
    for t in range(4):
        assert any(f"_{t}.tif" in fn for fn in found), (t, sorted(found))
    # both processes wrote their own log
    assert os.path.exists(os.path.join(root, "out", "ProcessingLog.txt"))
    assert os.path.exists(os.path.join(root, "out", "ProcessingLog.p1.txt"))
