from mca_tpu.ops.attention import masked_attention  # noqa: F401
