from microimagelib_tpu.parallel.mesh import make_mesh, volume_sharding, batch_sharding
from microimagelib_tpu.parallel.sharded import (
    rl_decon_single_sharded,
    rl_decon_dual_sharded,
    rl_decon_dual_batch_dp,
    fusion_step_multichip,
)

__all__ = [
    "make_mesh",
    "volume_sharding",
    "batch_sharding",
    "rl_decon_single_sharded",
    "rl_decon_dual_sharded",
    "rl_decon_dual_batch_dp",
    "fusion_step_multichip",
]
