"""mca_tpu — TPU-native sparsely-multimodal data fusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the MCA paper
reference (josiahbjorgaard/mca-paper, "Sparsely Multimodal Data Fusion"):

- config-driven modality encoders (Sequence / Tabular / SparseTabular /
  Patch / EmbeddedSequence) with static-shape collation,
- the MCA fusion transformer (Zorro-style masked attention plus
  per-modality-subset fusion channels), the MMA/Zorro variant and the
  Everything-At-Once (EAO) baseline,
- a pairwise contrastive pretraining loss with learnable clamped
  temperature, presence masking for missing modalities and the
  fusion-channel-loss (FCL) graph,
- data-parallel training via `jax.sharding` over a device mesh (the
  contrastive loss sees the global batch by construction under jit),
- Orbax checkpointing, batch embedding inference, and linear/MLP probe
  evaluation with a full metric suite.

The YAML config surface is kept compatible with the reference's
`configs/` corpus (`encoder_configs` / `modality_config` + train flags),
see `mca_tpu.config`.
"""

__version__ = "0.1.0"

from mca_tpu import config as config  # noqa: F401
from mca_tpu import masks as masks  # noqa: F401
