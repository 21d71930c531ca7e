from diffus_tpu.parallel.mesh import (
    make_mesh,
    default_mesh,
    pose_sharding,
    pose_ray_sharding,
    replicated,
)
from diffus_tpu.parallel.shard import (
    sharded_render_sweep,
    make_sharded_train_step,
    shard_batch,
    sharded_recover_pose_multistart,
)
from diffus_tpu.parallel.tp import (
    tp_shard_params,
    tp_train_on_table,
)
