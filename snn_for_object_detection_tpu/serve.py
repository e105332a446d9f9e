"""Multi-camera streaming inference engine (production serving path).

The productization of the reference's streaming promise — the stateful
O(1)-per-frame ``predict`` API (/root/reference/models/soda.py:202-233)
— scaled to many cameras per chip: N independent event streams share
one jitted batched step (the batch axis amortizes weight reads and
dispatch; see ``benchmarks/bench_streaming.py`` for the measured
capacity, ~38 real-time GEN1 cameras per v5e chip).

TPU-first design: the engine owns a fixed-capacity slot array so every
step runs the SAME compiled program (static shapes — no recompiles as
cameras come and go). Each camera occupies one slot; its recurrent
state lives in the slot's batch row. Adding/removing/resetting a
stream touches only that row (one jitted ``.at[idx].set`` per state
leaf); frames of empty slots are zeros and their outputs are dropped
on the host.

Example
-------
    engine = StreamingEngine(model, params, stats, capacity=32)
    engine.add_stream("cam0")
    engine.add_stream("cam1")
    while True:
        dets = engine.step({"cam0": f0, "cam1": f1})
        # dets: {"cam0": np.ndarray [k, 6] (class, conf, x1..y2), ...}

Detections for a stream are suppressed for its first
``model.time_window`` frames (state warm-up, soda.py:197).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops.nms import filter_detections


class StreamingEngine:
    """Batched stateful inference over up to ``capacity`` camera
    streams with per-stream add / remove / reset."""

    def __init__(
        self,
        model,
        params: Any,
        stats: Any,
        capacity: int = 32,
        max_out: int = 300,
        threshold: float = 0.0,
        mesh: Optional[Any] = None,
        frame_dtype: str = "uint8",
        pipelined: bool = False,
    ):
        """
        :param model: A :class:`SODa` detector.
        :param params: Model parameters pytree.
        :param stats: Model statistics (BatchNorm running stats).
        :param capacity: Maximum simultaneous streams. The compiled
            step's batch size — pick once for the deployment; the
            engine never recompiles.
        :param max_out: Detection rows per stream per frame (padded,
            class −1 for empty).
        :param threshold: Confidence floor applied in the host fan-out
            (0 keeps every foreground row).
        :param mesh: Optional :class:`jax.sharding.Mesh` — serving
            scale-OUT: the slot/batch axis (frames + every recurrent
            state row) is sharded over the mesh's devices, weights are
            replicated, and GSPMD runs each chip's slice of the
            cameras locally (no per-step collectives in the trunk:
            the computation is batch-parallel). ``capacity`` must
            divide by the mesh size; N chips serve ~N× the cameras of
            one chip.
        :param frame_dtype: Host staging dtype for the slot frames.
            ``uint8`` (default) ships 4× less host→device traffic than
            fp32 — the same reason the training loader stages uint8
            (data/prophesee.py) — and is exact for event-count frames
            below 256 events/pixel/step; pass ``float32`` for
            arbitrary-valued inputs. The jitted step casts to the
            model's compute dtype on device.
        :param pipelined: Double-buffered mode: ``step()`` returns the
            detections of the PREVIOUS frame batch and dispatches the
            current one, so the device step overlaps the caller's next
            rasterization (one frame of added latency; call
            :meth:`flush` for the final frame's results). The first
            ``step()`` returns ``{}``. Helps only when host→device
            transfer and device compute can genuinely overlap (a real
            TPU-VM PCIe/DMA path); over a SERIALIZED transport — e.g.
            the single-link dev tunnel, where one step measures 70%
            transfer — it cannot beat sync mode, which stays the
            default (chip breakdown: log/chip_r05/streaming_probe.log,
            sync 249 ms vs pipelined 250 ms after the round-5
            fetch-before-dispatch reorder; 269 ms before it).
        """
        self.model = model
        self.capacity = int(capacity)
        self.max_out = int(max_out)
        self.threshold = float(threshold)
        self.pipelined = bool(pipelined)
        self._params = params
        self._stats = stats
        self._h, self._w = model.in_hw
        self._c = model.in_channels
        self._state = model.init_state(self.capacity)
        # one zeroed single-row state kept as the reset source
        self._zero_row = model.init_state(1)
        self._slots: Dict[str, int] = {}
        self._free: List[int] = list(range(self.capacity - 1, -1, -1))
        self._age: Dict[str, int] = {}
        # two host staging buffers: in pipelined mode the buffer just
        # handed to jnp.asarray may still be mid-transfer while the
        # caller fills the next batch — alternate so we never mutate an
        # in-flight buffer
        self._bufs = [
            np.zeros(
                (self.capacity, self._h, self._w, self._c),
                np.dtype(frame_dtype),
            )
            for _ in range(2 if self.pipelined else 1)
        ]
        self._flip = 0
        # pipelined mode: (device detections handle, slot/age snapshot)
        self._pending: Optional[tuple] = None

        def _step(params, stats, frames, state):
            return model.predict(params, stats, frames, state,
                                 max_out=max_out)

        if mesh is not None:
            from snn_for_object_detection_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
            )

            if self.capacity % mesh.size:
                raise ValueError(
                    f"capacity {self.capacity} must divide by the "
                    f"mesh size {mesh.size}"
                )
            rep = replicated(mesh)
            row = batch_sharding(mesh, 0)
            self._state = jax.device_put(self._state, row)
            self._zero_row = jax.device_put(self._zero_row, rep)
            # donate the carried state: the update happens in place on
            # device, so the state buffer never doubles in HBM
            self._jit_step = jax.jit(
                _step,
                in_shardings=(rep, rep, row, row),
                out_shardings=(row, row),
                donate_argnums=(3,),
            )
        else:
            self._jit_step = jax.jit(_step, donate_argnums=(3,))

        def _reset_row(state, zero_row, idx):
            return jax.tree_util.tree_map(
                lambda s, z: s.at[idx].set(z[0].astype(s.dtype)),
                state, zero_row,
            )

        self._jit_reset = jax.jit(_reset_row, donate_argnums=(0,))

    # ----- stream lifecycle -----

    @property
    def streams(self) -> List[str]:
        return list(self._slots)

    def add_stream(self, stream_id: str) -> int:
        """Attach a camera; returns its slot. Raises when full."""
        if stream_id in self._slots:
            raise KeyError(f"stream {stream_id!r} already attached")
        if not self._free:
            raise RuntimeError(
                f"engine at capacity ({self.capacity} streams); "
                "remove_stream() one or build with a larger capacity"
            )
        slot = self._free.pop()
        self._slots[stream_id] = slot
        self._age[stream_id] = 0
        self._state = self._jit_reset(
            self._state, self._zero_row, jnp.int32(slot)
        )
        return slot

    def remove_stream(self, stream_id: str) -> None:
        """Detach a camera and free its slot."""
        slot = self._slots.pop(stream_id)  # KeyError for unknown id
        self._age.pop(stream_id)
        self._free.append(slot)

    def reset_stream(self, stream_id: str) -> None:
        """Zero a camera's recurrent state (e.g. on a stream gap)."""
        slot = self._slots[stream_id]
        self._age[stream_id] = 0
        self._state = self._jit_reset(
            self._state, self._zero_row, jnp.int32(slot)
        )

    # ----- inference -----

    def step(
        self, frames: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Advance every attached stream by one frame.

        :param frames: stream_id -> event frame [H, W, 2]. Streams
            missing from the dict receive an all-zero frame (their
            state still advances — an event camera produces no events
            for a static scene, so this is the faithful idle input).
        :return: stream_id -> filtered detections [k, 6] numpy array
            (class, conf, x1, y1, x2, y2), empty during the stream's
            first ``model.time_window`` frames. In pipelined mode the
            returned detections belong to the PREVIOUS ``step()``'s
            frames (``{}`` on the first call; :meth:`flush` drains the
            last one).
        """
        unknown = set(frames) - set(self._slots)
        if unknown:
            raise KeyError(f"unattached streams: {sorted(unknown)}")
        # Validate + convert EVERY frame before touching the staging
        # buffers: raising after the flip/zero below would desync the
        # pipelined double buffer (a later step would refill the host
        # buffer whose transfer may still be in flight).
        staged = {
            self._slots[sid]: self._check_frame(sid, frame)
            for sid, frame in frames.items()
        }
        buf = self._bufs[self._flip]
        self._flip = (self._flip + 1) % len(self._bufs)
        buf[:] = 0
        for slot, frame in staged.items():
            buf[slot] = frame
        # Pipelined mode fetches the PREVIOUS step's detections BEFORE
        # dispatching the next one. Measured order (chip,
        # log/chip_r05/streaming_probe.log): fetch-after-dispatch loses
        # ~8% because the readback queues behind the next upload on a
        # serialized transport; fetch-first removes that penalty while
        # keeping the overlap that matters — the device computes step N
        # while the host rasterizes/stages the caller's N+1 frames.
        prev_out = None
        if self.pipelined and self._pending is not None:
            prev, self._pending = self._pending, None
            prev_out = self._fan_out(*prev)
        # async dispatch: jnp.asarray + the jitted step return device
        # handles immediately; the transfer and compute proceed while
        # the host rasterizes the next frames
        dets, self._state = self._jit_step(
            self._params, self._stats, jnp.asarray(buf), self._state
        )
        for sid in self._slots:
            self._age[sid] += 1
        snapshot = (
            dict(self._slots),
            {s: a for s, a in self._age.items()},
        )
        if not self.pipelined:
            return self._fan_out(dets, snapshot)
        self._pending = (dets, snapshot)
        return prev_out if prev_out is not None else {}

    def _check_frame(self, sid: str, frame) -> np.ndarray:
        """Validate one incoming frame against the engine geometry and
        the staging dtype. With integer staging (the uint8 default),
        silently casting would TRUNCATE normalized float inputs to 0
        and WRAP counts past the dtype max — fail loud on the former,
        saturate the latter (the rasterizers only ever write 0/1:
        native/event_ops.cc)."""
        frame = np.asarray(frame)
        if frame.shape != (self._h, self._w, self._c):
            raise ValueError(
                f"stream {sid!r}: frame shape {frame.shape} != "
                f"({self._h}, {self._w}, {self._c})"
            )
        dt = self._bufs[0].dtype
        if np.issubdtype(dt, np.integer):
            if np.issubdtype(frame.dtype, np.floating) and not np.all(
                frame == np.rint(frame)
            ):
                raise ValueError(
                    f"stream {sid!r}: non-integral frame values with "
                    f"{dt.name} staging would be truncated; event-count"
                    " frames are integral — construct the engine with "
                    "frame_dtype='float32' for arbitrary-valued inputs"
                )
            info = np.iinfo(dt)
            if frame.size and (
                frame.max() > info.max or frame.min() < info.min
            ):
                # saturate both ends, don't wrap: 300 -> 255, and a
                # (nonsensical but possible) -1 count -> 0, not 255
                frame = np.clip(frame, info.min, info.max)
        return frame

    def flush(self) -> Dict[str, np.ndarray]:
        """Pipelined mode: fetch + fan out the in-flight step's
        detections (the final frames of a stream). No-op ``{}`` when
        nothing is pending."""
        if self._pending is None:
            return {}
        prev, self._pending = self._pending, None
        return self._fan_out(*prev)

    def _fan_out(self, dets, snapshot) -> Dict[str, np.ndarray]:
        """Fetch a step's device detections and split per stream,
        using the slot/age snapshot taken at its dispatch."""
        slots, ages = snapshot
        dets_np = np.asarray(dets)
        out: Dict[str, np.ndarray] = {}
        for sid, slot in slots.items():
            if ages[sid] <= self.model.time_window:
                out[sid] = np.zeros((0, 6), np.float32)
                continue
            rows = filter_detections(dets_np[slot])
            if self.threshold > 0.0:
                rows = rows[rows[:, 1] >= self.threshold]
            out[sid] = rows
        return out

    def update_weights(
        self, params: Any, stats: Optional[Any] = None
    ) -> None:
        """Swap model weights without disturbing stream states (live
        model refresh during serving)."""
        self._params = params
        if stats is not None:
            self._stats = stats
