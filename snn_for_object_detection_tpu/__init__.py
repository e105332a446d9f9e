"""TPU-native spiking-neural-network object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
KirillHit/snn_for_object_detection ("SODa"): an SNN object detector for
event cameras (Prophesee GEN1 / 1Mpx), built TPU-first:

- neurons as pure functions with surrogate-gradient ``jax.custom_vjp``
  (vs. norse ``SNNCell`` modules in the reference),
- the model-generation DSL compiles to a single pure step function whose
  time loop is one ``lax.scan`` inside one ``jit`` (vs. per-step Python
  dispatch in the reference, ``models/generator.py:169-198``),
- detection math (anchors / RoI / NMS) as shape-static batched XLA ops
  (vs. Python loops in ``utils/box.py`` / ``utils/roi.py``),
- data parallelism via ``jax.sharding`` over a device mesh (vs. DDP/NCCL).

Subpackages
-----------
``ops``       pure math: neurons, boxes, anchors, matching, NMS
``models``    layer-spec DSL, spec compiler, detector, model zoo
``data``      host-side event decoding, rasterization, dataset streams
``train``     training loop, checkpointing, metrics
``parallel``  mesh / sharding helpers
``utils``     config system, plotting, profiling
"""

__version__ = "0.1.0"
