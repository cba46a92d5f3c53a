from mca_tpu.models.layers import (  # noqa: F401
    Attention,
    FeedForward,
    LayerNorm,
    MCALayer,
)
from mca_tpu.models.mca import MCA  # noqa: F401
from mca_tpu.models.eao import EAO  # noqa: F401
from mca_tpu.models.pool import MeanTokenProjectionPool  # noqa: F401


def build_model(model_config: dict):
    """MCA/EAO selector (ref utils/config.py:96-117 + train_accel_gpu.py:51-54)."""
    cfg = dict(model_config)
    eao = cfg.pop("eao", False)
    cfg.pop("batch_size", None)  # shapes come from the batch, not config
    cls = EAO if eao else MCA
    field_names = {f.name for f in cls.__dataclass_fields__.values()}
    return cls(**{k: v for k, v in cfg.items() if k in field_names})
