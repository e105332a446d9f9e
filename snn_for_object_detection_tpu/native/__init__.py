"""Native (C++) host kernels with lazy build and numpy fallback.

The reference keeps all first-party code in Python and inherits native
speed from dependencies (SURVEY.md §2.4); here the hot host-side path —
event decoding + rasterization — is a small first-party C++ kernel
(``event_ops.cc``), compiled on first use with the toolchain baked into
the image and loaded via ctypes. Every entry point has a pure-numpy
fallback so the framework works without a compiler.
"""

from snn_for_object_detection_tpu.native.bindings import (
    decode_events_native,
    is_available,
    rasterize_records_native,
)

__all__ = [
    "decode_events_native",
    "is_available",
    "rasterize_records_native",
]
