from editanything_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    replicate,
    shard_params_fsdp,
)
