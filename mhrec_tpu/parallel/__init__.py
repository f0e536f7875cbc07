from mhrec_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    zero_sharded_opt_state,
)
