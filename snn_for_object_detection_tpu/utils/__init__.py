"""Config system, visualization, profiling helpers."""

from snn_for_object_detection_tpu.utils.compile_cache import (
    enable_compile_cache,
)
from snn_for_object_detection_tpu.utils.config import (
    instantiate,
    load_config,
    parse_overrides,
)
from snn_for_object_detection_tpu.utils.plotter import Plotter

__all__ = [
    "Plotter",
    "enable_compile_cache",
    "instantiate",
    "load_config",
    "parse_overrides",
]
