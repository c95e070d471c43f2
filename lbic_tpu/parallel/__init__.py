from lbic_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from lbic_tpu.parallel import distributed

