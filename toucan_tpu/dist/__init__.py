from toucan_tpu.dist.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_train_state,
)
