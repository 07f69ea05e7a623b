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
    reg3d,
    reg_3dgpu,
)

__all__ = [
    "decon_dualview",
    "decon_singleview",
    "gen_otf",
    "rl_decon_dual",
    "rl_decon_single",
    "atrans3dgpu",
    "checkmatrix",
    "reg3d",
    "reg_3dgpu",
]
