from mca_tpu.data.collators import (  # noqa: F401
    EmbeddedSequenceCollator,
    MatrixCollator,
    MultimodalCollator,
    SequenceCollator,
    collators,
)
from mca_tpu.data.dataset import (  # noqa: F401
    BatchPreDropout,
    batch_predrop,
    setup_data,
)
