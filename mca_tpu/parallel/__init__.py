from mca_tpu.parallel.collectives import (  # noqa: F401
    BackpropType,
    gather_tensor,
)
from mca_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
)
