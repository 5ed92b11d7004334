from toucan_tpu.dist.mesh import (
    batch_sharding,
    initialize_distributed,
    make_global_batch,
    make_mesh,
    param_sharding_rules,
    shard_aligner_train_state,
    shard_train_state,
    shard_vocoder_train_state,
)
