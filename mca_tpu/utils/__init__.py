from mca_tpu.utils.trees import (  # noqa: F401
    count_parameters,
    global_norm,
)
from mca_tpu.utils.logging import (  # noqa: F401
    JSONLLogger,
    ThroughputMeter,
)
