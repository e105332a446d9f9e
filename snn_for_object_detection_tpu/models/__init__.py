"""Model DSL, spec compiler, detector core, and model zoo."""

from snn_for_object_detection_tpu.models.spec import (
    Conv,
    Dense,
    LI,
    LIF,
    LSTM,
    LayerSpec,
    Norm,
    Pass,
    Pool,
    ReLU,
    Residual,
    Return,
    SLI,
    SiLU,
    Synapse,
    Tanh,
    Up,
)
from snn_for_object_detection_tpu.models.detector import SODa
from snn_for_object_detection_tpu.models.tiny_yolo import TinyYolo

__all__ = [
    "Conv",
    "Dense",
    "LI",
    "LIF",
    "LSTM",
    "LayerSpec",
    "Norm",
    "Pass",
    "Pool",
    "ReLU",
    "Residual",
    "Return",
    "SLI",
    "SODa",
    "SiLU",
    "Synapse",
    "Tanh",
    "TinyYolo",
    "Up",
]
