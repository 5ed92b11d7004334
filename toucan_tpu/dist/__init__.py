from toucan_tpu.dist.mesh import (
    batch_sharding,
    initialize_distributed,
    make_global_batch,
    make_mesh,
    param_sharding_rules,
    shard_train_state,
)
