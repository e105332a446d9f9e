"""Model DSL, spec compiler, detector core, and model zoo."""

from snn_for_object_detection_tpu.models.spec import (
    ALIF,
    Conv,
    Dense,
    LI,
    LIF,
    LSTM,
    LayerSpec,
    Norm,
    PLIF,
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
from snn_for_object_detection_tpu.models.vgg import VggSNN
from snn_for_object_detection_tpu.models.yolo import YoloSNN

__all__ = [
    "ALIF",
    "Conv",
    "Dense",
    "LI",
    "LIF",
    "LSTM",
    "LayerSpec",
    "Norm",
    "PLIF",
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
    "VggSNN",
    "YoloSNN",
]
