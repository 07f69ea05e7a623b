from microimagelib_tpu.models.deconvolution import (
    decon_dualview,
    decon_singleview,
    gen_otf,
    rl_decon_dual,
    rl_decon_single,
)
from microimagelib_tpu.models.registration import (
    atrans3dgpu,
    checkmatrix,
    reg2d,
    reg3d,
    reg_3dgpu,
    zncc,
)
from microimagelib_tpu.models.fusion import fusion_dualview, imoperation3d, imresize3d
from microimagelib_tpu.models.projections import mip3d, mp2d, mp2d_packed, mp3d
from microimagelib_tpu.models.batch import BatchConfig, spim_fusion_batch
from microimagelib_tpu.models.backprojector import gen_backprojector

__all__ = [
    "decon_dualview",
    "decon_singleview",
    "gen_otf",
    "rl_decon_dual",
    "rl_decon_single",
    "atrans3dgpu",
    "checkmatrix",
    "reg2d",
    "reg3d",
    "reg_3dgpu",
    "zncc",
    "fusion_dualview",
    "imoperation3d",
    "imresize3d",
    "mip3d",
    "mp2d",
    "mp2d_packed",
    "mp3d",
    "BatchConfig",
    "spim_fusion_batch",
    "gen_backprojector",
]
