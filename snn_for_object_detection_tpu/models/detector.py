"""Detector core: backbone/neck/head composition, scan forward, loss.

TPU-native re-design of ``SODa`` (/root/reference/models/soda.py:18-321)
and the ``Head`` holder (/root/reference/models/generator.py:359-457):

- the reference's per-time-step Python loop (soda.py:141-143) becomes a
  single ``lax.scan`` whose body is optionally ``jax.checkpoint``-ed
  (BPTT memory ~ O(state) instead of O(T x activations));
- the random sequence-start truncation (soda.py:246-257) is expressed
  as a traced ``start_step`` with ``lax.cond`` gating — one compiled
  program for all 16 truncations instead of 16 shape variants;
- anchors are trace-time constants derived from static feature-map
  shapes (the analogue of the first-call cache, utils/anchors.py:41-44);
- per-scale heads are independently-parameterized (no weight sharing,
  generator.py:403-413).

The class itself is configuration + compiled pure functions; parameters
/ stats / neuron states are explicit pytrees owned by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.models import compile as C
from snn_for_object_detection_tpu.models import spec as S
from snn_for_object_detection_tpu.ops import anchors as anchor_ops
from snn_for_object_detection_tpu.ops import matching, nms

Array = jax.Array


class SODa:
    """Abstract stateful-recurrent anchor detector.

    Subclasses provide ``backbone_cfgs`` / ``neck_cfgs`` /
    ``head_cfgs`` DSL lists (the reference's config hooks,
    soda.py:98-133). Construction compiles the whole network for a
    static input geometry.

    :param num_classes: Number of foreground classes.
    :param in_hw: Input frame geometry (H, W) — (240, 304) for GEN1,
        (720, 1280) for 1Mpx (datasets.py:209-219).
    :param loss_ratio: GT-vs-background loss weighting (soda.py:30-47).
    :param time_window: Max random truncation of the sequence start
        (soda.py:246-257).
    :param iou_threshold: Anchor-assignment IoU threshold.
    :param compute_dtype: Activations dtype; ``jnp.bfloat16`` feeds the
        MXU at full rate. Neuron/BN state stays fp32.
    """

    def __init__(
        self,
        num_classes: int,
        in_hw: Tuple[int, int] = (240, 304),
        in_channels: int = 2,
        loss_ratio: float = 0.04,
        time_window: int = 16,
        iou_threshold: float = 0.4,
        learning_rate: float = 1e-3,
        state_storage: bool = False,
        compute_dtype=jnp.float32,
        state_dtype=jnp.float32,
        remat: bool = True,
        scan_unroll: int = 1,
        fuse_seq: bool = False,
        s2d_stem: bool = False,
        anchor_sizes=None,
        anchor_ratios=None,
    ):
        self.num_classes = num_classes
        self.in_hw = tuple(in_hw)
        self.in_channels = in_channels
        self.loss_ratio = loss_ratio
        self.time_window = time_window
        self.iou_threshold = iou_threshold
        self.learning_rate = learning_rate
        self.state_storage = state_storage
        # accept YAML/CLI strings ("bfloat16", "float8_e4m3fn", ...) as
        # well as jnp dtypes (config/fast.yaml)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.state_dtype = jnp.dtype(state_dtype)
        compute_dtype = self.compute_dtype
        state_dtype = self.state_dtype
        self.remat = remat
        # lax.scan unroll factor: 2 measures ~9% faster at inference
        # (cross-step fusion); 1 keeps compiles fastest.
        self.scan_unroll = scan_unroll
        # forward_seq eval fast path: fuse [Conv3x3 -> BN -> LIF/LI]
        # units into one temporal Pallas kernel (state in VMEM). Spikes
        # can differ from the scan path on ~0.2% of near-threshold
        # pixels (fp32 accumulation order) — opt-in.
        self.fuse_seq = fuse_seq
        # Space-to-depth stem execution plan (exact-numerics; see
        # spec.Conv.s2d): the first backbone conv runs on 2x2-packed
        # input, filling the MXU contraction at the tiny-Cin stem.
        self.s2d_stem = s2d_stem

        backbone_cfgs = self.backbone_cfgs()
        if s2d_stem:
            stem = backbone_cfgs[0] if backbone_cfgs else None
            if not (isinstance(stem, S.Conv) and stem.kernel_size == 3
                    and stem.stride == 2):
                raise ValueError(
                    "s2d_stem=True requires the backbone to start with "
                    f"a Conv(kernel_size=3, stride=2); got {stem!r}"
                )
            backbone_cfgs = [
                dataclasses.replace(stem, s2d=True), *backbone_cfgs[1:]
            ]
        self.backbone = C.compile_block(
            backbone_cfgs, in_channels, self.in_hw, "backbone",
            state_dtype=state_dtype,
        )
        neck_returns: List[Tuple[int, Tuple[int, int]]] = []
        self.neck = C.compile_block(
            self.neck_cfgs(),
            self.backbone.out_channels,
            self.backbone.out_hw,
            "neck",
            returns=neck_returns,
            state_dtype=state_dtype,
        )
        if not neck_returns:
            raise ValueError("neck_cfgs must contain at least one Return()")
        self.neck_out_shape = neck_returns  # [(channels, (h, w)), ...]

        # --- anchors (generator.py:389-399) ---
        # Defaults reproduce the reference's linspace size table and
        # (0.5, 1, 2) ratios; pass ``anchor_sizes`` ([num_scales, S],
        # e.g. from ops.anchors.calc_anchor_params / scripts/
        # calc_anchors.py — the reference's "TODO Automatic
        # calculation") and/or ``anchor_ratios`` to override.
        num_scales = len(neck_returns)
        if anchor_sizes is not None:
            sizes = np.asarray(anchor_sizes, np.float32)
            if sizes.ndim != 2 or sizes.shape[0] != num_scales:
                raise ValueError(
                    f"anchor_sizes must be [{num_scales} scales, "
                    f"sizes_per_scale], got {sizes.shape}"
                )
        else:
            sizes = anchor_ops.default_scale_sizes(num_scales)
        ratios = (
            np.asarray(anchor_ratios, np.float32)
            if anchor_ratios is not None
            else anchor_ops.DEFAULT_RATIOS
        )
        anchors_per_pixel = sizes.shape[1] * len(ratios)
        self.num_box_out = anchors_per_pixel * 4
        self.num_class_out = anchors_per_pixel * (num_classes + 1)
        self.anchors_per_pixel = anchors_per_pixel
        # retained for checkpoint import verification
        # (scripts/import_torch_ckpt.py vs head_net.anchor_gen_I.sizes,
        # reference utils/anchors.py:26-27)
        self.scale_sizes = sizes
        self.anchor_ratios = ratios

        per_scale_anchors = [
            anchor_ops.generate_anchors(hw[0], hw[1], sizes[idx], ratios)
            for idx, (_, hw) in enumerate(neck_returns)
        ]
        self.anchors = jnp.asarray(np.concatenate(per_scale_anchors))
        self.num_anchors = int(self.anchors.shape[0])

        # --- per-scale heads: base/box/cls three-part cfg
        #     (generator.py:465-538), no weight sharing ---
        self.heads: List[Dict[str, C.CompiledBlock]] = []
        head_cfg = self.head_cfgs(self.num_box_out, self.num_class_out)
        if len(head_cfg) != 3:
            raise ValueError("head_cfgs must return [base, box, cls] lists")
        for idx, (ch, hw) in enumerate(neck_returns):
            base = C.compile_block(head_cfg[0], ch, hw, f"head{idx}/base",
                                   state_dtype=state_dtype)
            box = C.compile_block(
                head_cfg[1], base.out_channels, base.out_hw, f"head{idx}/box",
                state_dtype=state_dtype,
            )
            cls = C.compile_block(
                head_cfg[2], base.out_channels, base.out_hw, f"head{idx}/cls",
                state_dtype=state_dtype,
            )
            if box.out_channels != self.num_box_out:
                raise ValueError(
                    f"head box branch must end with {self.num_box_out} channels"
                )
            if cls.out_channels != self.num_class_out:
                raise ValueError(
                    f"head cls branch must end with {self.num_class_out} channels"
                )
            self.heads.append({"base": base, "box": box, "cls": cls})

        # Head box/cls branches that carry no state and no BN running
        # stats (the flagship config: bare 1x1 convs) only need the
        # LAST step's base activations in time-batched mode.
        def _light(blk: C.CompiledBlock) -> bool:
            return not jax.tree_util.tree_leaves(
                (blk.init_state(1), blk.init_stats())
            )

        self._head_tails_light = all(
            _light(h["box"]) and _light(h["cls"]) for h in self.heads
        )

    # ----- config hooks (soda.py:98-133) -----

    def backbone_cfgs(self) -> S.ListGen:
        raise NotImplementedError

    def neck_cfgs(self) -> S.ListGen:
        raise NotImplementedError

    def head_cfgs(self, box_out: int, cls_out: int) -> S.ListGen:
        raise NotImplementedError

    # ----- init -----

    def init(self, key: Array) -> Tuple[Any, Any]:
        """Initialize (params, stats) pytrees."""
        kb, kn, *kh = jax.random.split(key, 2 + len(self.heads))
        params = {
            "backbone": self.backbone.init(kb),
            "neck": self.neck.init(kn),
        }
        stats = {
            "backbone": self.backbone.init_stats(),
            "neck": self.neck.init_stats(),
        }
        for idx, head in enumerate(self.heads):
            k0, k1, k2 = jax.random.split(kh[idx], 3)
            params[f"head{idx}"] = {
                "base": head["base"].init(k0),
                "box": head["box"].init(k1),
                "cls": head["cls"].init(k2),
            }
            stats[f"head{idx}"] = {
                "base": head["base"].init_stats(),
                "box": head["box"].init_stats(),
                "cls": head["cls"].init_stats(),
            }
        return params, stats

    def init_state(self, batch_size: int) -> Any:
        """Zero recurrent state for a batch (the ``ListState`` analogue)."""
        state = {
            "backbone": self.backbone.init_state(batch_size),
            "neck": self.neck.init_state(batch_size),
        }
        for idx, head in enumerate(self.heads):
            state[f"head{idx}"] = {
                "base": head["base"].init_state(batch_size),
                "box": head["box"].init_state(batch_size),
                "cls": head["cls"].init_state(batch_size),
            }
        return state

    # ----- single-step forward (soda.py:235-244) -----

    def step(
        self,
        params: Any,
        stats: Any,
        state: Any,
        x: Array,
        train: bool = False,
        record: bool = False,
        calibrate: bool = False,
    ) -> Tuple[Tuple[Array, Array], Any, Any, Dict[str, Any]]:
        """One time step: frame [B, H, W, C] -> (cls_preds [B, A, C+1],
        bbox_preds [B, A, 4]), new stats, new state, records.

        ``calibrate`` (offline int8-PTQ pass, ops/quantize.py): every
        conv adds its input absmax to its returned stats dict."""
        ctx = C.Ctx(train=train, record=record, calibrate=calibrate)
        base_outs, new_stats, new_state = self._trunk(
            params, stats, state, x, ctx
        )
        if self._head_tails_light:
            # stateless, stat-free tails: _trunk's pass-through
            # stats/state are already correct
            cls_preds, bbox_preds = self._tail_readout(
                params, stats, state, base_outs, ctx
            )
        else:
            cls_list, box_list = [], []
            for idx, base_out in enumerate(base_outs):
                hp = params[f"head{idx}"]
                hs = stats[f"head{idx}"]
                hst = state[f"head{idx}"]
                head = self.heads[idx]
                box_out, ns_box, nst_box = head["box"].apply(
                    hp["box"], hs["box"], hst["box"], base_out, ctx
                )
                cls_out, ns_cls, nst_cls = head["cls"].apply(
                    hp["cls"], hs["cls"], hst["cls"], base_out, ctx
                )
                new_stats[f"head{idx}"]["box"] = ns_box
                new_stats[f"head{idx}"]["cls"] = ns_cls
                new_state[f"head{idx}"]["box"] = nst_box
                new_state[f"head{idx}"]["cls"] = nst_cls
                b = box_out.shape[0]
                box_list.append(box_out.reshape(b, -1, 4))
                cls_list.append(cls_out.reshape(b, -1, self.num_classes + 1))
            cls_preds = jnp.concatenate(cls_list, axis=1)
            bbox_preds = jnp.concatenate(box_list, axis=1)
        return (cls_preds, bbox_preds), new_stats, new_state, ctx.records

    # ----- deferred head readout (scan fast path) -----
    #
    # ``forward`` returns LAST-step predictions only (soda.py:138-144),
    # so when the head box/cls tails are stateless and stat-free (the
    # flagship config: bare 1x1 convs, ``_head_tails_light``) they do
    # not need to run inside the scan at all: the scan carries the
    # per-scale stem activations and the tails run ONCE post-scan on
    # the final carry — bit-identical predictions, T-1 fewer tail
    # convs + flatten/concats.

    def _trunk(
        self, params: Any, stats: Any, state: Any, x: Array, ctx: C.Ctx
    ) -> Tuple[Tuple[Array, ...], Any, Any]:
        """Backbone + neck + head stems for one frame; box/cls tails
        deferred (their stats/state pass through untouched)."""
        x = x.astype(self.compute_dtype)
        y, nb_stats, nb_state = self.backbone.apply(
            params["backbone"], stats["backbone"], state["backbone"], x, ctx
        )
        base_outs, new_stats, new_state = self._neck_heads(
            params, stats, state, y, ctx
        )
        new_stats["backbone"] = nb_stats
        new_state["backbone"] = nb_state
        return base_outs, new_stats, new_state

    def _neck_heads(
        self, params: Any, stats: Any, state: Any, y: Array, ctx: C.Ctx
    ) -> Tuple[Tuple[Array, ...], Any, Any]:
        """Neck + head stems for one (post-backbone) frame — the
        per-step suffix of :meth:`_trunk`, also the scanned phase of
        :meth:`forward_hybrid`. Returned stats/state dicts cover the
        neck and head subtrees only."""
        new_stats: Dict[str, Any] = {}
        new_state: Dict[str, Any] = {}
        _, new_stats["neck"], new_state["neck"] = self.neck.apply(
            params["neck"], stats["neck"], state["neck"], y, ctx
        )
        pyramid = ctx.taps
        if len(pyramid) != len(self.heads):
            raise RuntimeError("neck produced wrong number of pyramid taps")
        base_outs = []
        for idx, (head, fmap) in enumerate(zip(self.heads, pyramid)):
            hp = params[f"head{idx}"]
            hs = stats[f"head{idx}"]
            hst = state[f"head{idx}"]
            base_out, ns_base, nst_base = head["base"].apply(
                hp["base"], hs["base"], hst["base"], fmap, ctx
            )
            new_stats[f"head{idx}"] = {
                "base": ns_base, "box": hs["box"], "cls": hs["cls"]
            }
            new_state[f"head{idx}"] = {
                "base": nst_base, "box": hst["box"], "cls": hst["cls"]
            }
            base_outs.append(base_out)
        return tuple(base_outs), new_stats, new_state

    def _tail_readout(
        self,
        params: Any,
        stats: Any,
        state: Any,
        base_outs: Tuple[Array, ...],
        ctx: C.Ctx,
    ) -> Tuple[Array, Array]:
        """Apply the (stateless) box/cls tails to stem activations and
        flatten/concat across scales (generator.py:451-457)."""
        cls_list, box_list = [], []
        for idx, base_out in enumerate(base_outs):
            hp = params[f"head{idx}"]
            hs = stats[f"head{idx}"]
            hst = state[f"head{idx}"]
            box_out, _, _ = self.heads[idx]["box"].apply(
                hp["box"], hs["box"], hst["box"], base_out, ctx
            )
            cls_out, _, _ = self.heads[idx]["cls"].apply(
                hp["cls"], hs["cls"], hst["cls"], base_out, ctx
            )
            b = box_out.shape[0]
            box_list.append(box_out.reshape(b, -1, 4))
            cls_list.append(cls_out.reshape(b, -1, self.num_classes + 1))
        return (
            jnp.concatenate(cls_list, axis=1),
            jnp.concatenate(box_list, axis=1),
        )

    def _cast_weights(self, params: Any) -> Any:
        """Pre-cast conv/ConvLSTM kernels (4-D fp32 leaves) to the
        compute dtype ONCE, outside the time loop.

        XLA does not hoist the per-step ``w.astype(bf16)`` (+ its
        layout retile) out of the scan body — profiling shows the
        resulting data-formatting copies cost ~29% of a T=32 forward.
        Casting here makes the in-step cast a no-op. BN/neuron params
        (1-D) keep fp32: their math runs in fp32 by design."""
        if self.compute_dtype == jnp.float32:
            return params
        cast = jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if a.ndim == 4 and a.dtype == jnp.float32
            else a,
            params,
        )
        # XLA deliberately sinks "cheap" converts back into while
        # bodies; the barrier pins the casts (and their layout retile)
        # outside the scan.
        return jax.lax.optimization_barrier(cast)

    # ----- sequence forward (soda.py:138-144 + 246-257) -----

    def _scan_carry0(self, B: int):
        """Initial per-step scan carry for the prediction output slot.

        Deferred-tail mode carries the per-scale stem activations (the
        stateless box/cls tails run ONCE after the scan — bit-identical,
        only the last step's tail outputs are ever returned); otherwise
        the concatenated (cls, box) prediction tensors."""
        if self._head_tails_light:
            return tuple(
                jnp.zeros(
                    (B, *h["base"].out_hw, h["base"].out_channels),
                    self.compute_dtype,
                )
                for h in self.heads
            )
        return (
            jnp.zeros(
                (B, self.num_anchors, self.num_classes + 1), jnp.float32
            ),
            jnp.zeros((B, self.num_anchors, 4), jnp.float32),
        )

    def _scan_steps(
        self, run_step, xs, T, carry0, stats, state, start_step
    ):
        """Shared per-step scan scaffolding (:meth:`forward` and
        :meth:`forward_hybrid` phase B): plain scan when start_step is
        statically 0, else a traced-truncation ``lax.cond`` body
        (steps t < start_step frozen, reproducing ``X[r:]`` —
        soda.py:149 — without dynamic shapes), with optional
        per-step rematerialization.

        ``run_step(stats, state, x_t) -> (stats, state, out)``;
        returns the final ``(stats, state, out)``."""
        if isinstance(start_step, int) and start_step == 0:
            def body(carry, x_t):
                stats, state, _ = carry
                stats, state, out = run_step(stats, state, x_t)
                return (stats, state, out), None
        else:
            def body(carry, inp):
                stats, state, out = carry
                x_t, t = inp
                stats, state, out = jax.lax.cond(
                    t >= start_step,
                    lambda _: run_step(stats, state, x_t),
                    lambda _: (stats, state, out),
                    None,
                )
                return (stats, state, out), None

            xs = (xs, jnp.arange(T))

        if self.remat:
            body = jax.checkpoint(body)

        (stats, state, out), _ = jax.lax.scan(
            body, (stats, state, carry0), xs,
            unroll=self.scan_unroll,
        )
        return stats, state, out

    def forward(
        self,
        params: Any,
        stats: Any,
        X: Array,
        start_step: Array | int = 0,
        train: bool = False,
        state: Optional[Any] = None,
    ) -> Tuple[Tuple[Array, Array], Any, Any]:
        """Run the full sequence, returning last-step predictions.

        :param X: [T, B, H, W, C] event frames.
        :param start_step: Traced scalar r; steps t < r are skipped
            (state frozen), reproducing ``X[r:]`` truncation
            (soda.py:149) without dynamic shapes.
        :return: ((cls_preds, bbox_preds), new_stats, final_state)
        """
        T, B = X.shape[0], X.shape[1]
        params = self._cast_weights(params)
        if state is None:
            state = self.init_state(B)

        deferred = self._head_tails_light
        carry0 = self._scan_carry0(B)

        def run_step(stats, state, x_t):
            if deferred:
                base_outs, s2, st2 = self._trunk(
                    params, stats, state, x_t, C.Ctx(train=train)
                )
                return s2, st2, base_outs
            (cls_p, box_p), s2, st2, _ = self.step(
                params, stats, state, x_t, train=train
            )
            return s2, st2, (cls_p.astype(jnp.float32),
                             box_p.astype(jnp.float32))

        stats, state, out = self._scan_steps(
            run_step, X, T, carry0, stats, state, start_step
        )
        if deferred:
            cls_p, box_p = self._tail_readout(
                params, stats, state, out, C.Ctx(train=train)
            )
            preds = (cls_p.astype(jnp.float32), box_p.astype(jnp.float32))
        else:
            preds = out
        return preds, stats, state

    # ----- time-batched sequence forward -----

    def forward_seq(
        self,
        params: Any,
        stats: Any,
        X: Array,
        start_step: Array | int = 0,
        train: bool = False,
        state: Optional[Any] = None,
    ) -> Tuple[Tuple[Array, Array], Any, Any]:
        """Time-batched forward: identical results to :meth:`forward`,
        throughput-optimal schedule.

        Stateless layers (convs, BN, activations) run ONCE over the
        folded ``T*B`` batch — big MXU ops, weights read from HBM once
        per sequence instead of once per step — and plain LIF/LI cells
        run as single Pallas kernels with (v, i) resident in VMEM for
        the whole T loop (see ``CompiledBlock.apply_seq``). With
        ``train=True`` and ``self.remat``, conv->norm->cell segments
        are wrapped in ``jax.checkpoint`` so BPTT saves only
        segment-boundary activations — the time-batched training
        schedule (``Trainer(time_batched=True)``), which avoids the
        step scan's per-step neuron-state HBM round trips: the win at
        state-heavy geometries like 1Mpx, measured in
        ``benchmarks/bench_1mpx_train.py``.

        :param X: [T, B, H, W, C] event frames.
        :param start_step: steps t < start_step are skipped (state and
            BN running stats frozen), matching :meth:`forward`.
        """
        T, B = X.shape[0], X.shape[1]
        params = self._cast_weights(params)
        if state is None:
            state = self.init_state(B)
        if isinstance(start_step, int) and start_step == 0:
            mask, r = None, None
        else:
            mask = jnp.arange(T) >= start_step
            r = jnp.asarray(start_step, jnp.int32)
        ctx = C.Ctx(train=train, step_mask=mask, start_step=r,
                    fuse=self.fuse_seq and not train,
                    remat_seq=self.remat and train)
        x = X.astype(self.compute_dtype)

        new_stats: Dict[str, Any] = {}
        new_state: Dict[str, Any] = {}
        y, new_stats["backbone"], new_state["backbone"] = (
            self.backbone.apply_seq(
                params["backbone"], stats["backbone"], state["backbone"],
                x, ctx,
            )
        )
        _, new_stats["neck"], new_state["neck"] = self.neck.apply_seq(
            params["neck"], stats["neck"], state["neck"], y, ctx
        )
        pyramid = ctx.taps  # [T, B, h, w, c] per scale
        if len(pyramid) != len(self.heads):
            raise RuntimeError("neck produced wrong number of pyramid taps")

        cls_list, box_list = [], []
        for idx, (head, fmap_seq) in enumerate(zip(self.heads, pyramid)):
            hp = params[f"head{idx}"]
            hs = stats[f"head{idx}"]
            hst = state[f"head{idx}"]
            ns: Dict[str, Any] = {}
            nst: Dict[str, Any] = {}
            base_seq, ns["base"], nst["base"] = head["base"].apply_seq(
                hp["base"], hs["base"], hst["base"], fmap_seq, ctx
            )
            if self._head_tails_light:
                # stateless, stat-free tails: last step only
                box_out, ns["box"], nst["box"] = head["box"].apply(
                    hp["box"], hs["box"], hst["box"], base_seq[-1], ctx
                )
                cls_out, ns["cls"], nst["cls"] = head["cls"].apply(
                    hp["cls"], hs["cls"], hst["cls"], base_seq[-1], ctx
                )
            else:
                box_seq, ns["box"], nst["box"] = head["box"].apply_seq(
                    hp["box"], hs["box"], hst["box"], base_seq, ctx
                )
                cls_seq, ns["cls"], nst["cls"] = head["cls"].apply_seq(
                    hp["cls"], hs["cls"], hst["cls"], base_seq, ctx
                )
                box_out, cls_out = box_seq[-1], cls_seq[-1]
            new_stats[f"head{idx}"] = ns
            new_state[f"head{idx}"] = nst
            box_list.append(box_out.reshape(B, -1, 4).astype(jnp.float32))
            cls_list.append(
                cls_out.reshape(B, -1, self.num_classes + 1).astype(
                    jnp.float32
                )
            )

        cls_preds = jnp.concatenate(cls_list, axis=1)
        bbox_preds = jnp.concatenate(box_list, axis=1)
        return (cls_preds, bbox_preds), new_stats, new_state

    # ----- hybrid sequence forward -----

    def forward_hybrid(
        self,
        params: Any,
        stats: Any,
        X: Array,
        start_step: Array | int = 0,
        train: bool = False,
        state: Optional[Any] = None,
    ) -> Tuple[Tuple[Array, Array], Any, Any]:
        """Mixed schedule, identical results to :meth:`forward`: the
        BACKBONE runs time-batched (folded convs, VMEM-resident Pallas
        temporal cells, segment remat — where the big early feature
        maps dominate HBM state traffic, e.g. 1Mpx stage 1/2) and the
        NECK + HEADS run as the per-step scan (where XLA's
        cell-into-conv-epilogue fusion wins at small spatial dims —
        docs/perf.md "time-batched"). ``Trainer(time_batched="hybrid")``.
        """
        T, B = X.shape[0], X.shape[1]
        params = self._cast_weights(params)
        if state is None:
            state = self.init_state(B)

        # phase A: backbone, time-batched over the whole sequence
        if isinstance(start_step, int) and start_step == 0:
            mask, r = None, None
        else:
            mask = jnp.arange(T) >= start_step
            r = jnp.asarray(start_step, jnp.int32)
        ctx_a = C.Ctx(train=train, step_mask=mask, start_step=r,
                      remat_seq=self.remat and train)
        y_seq, nb_stats, nb_state = self.backbone.apply_seq(
            params["backbone"], stats["backbone"], state["backbone"],
            X.astype(self.compute_dtype), ctx_a,
        )

        # phase B: neck + heads, per-step scan (forward's structure)
        deferred = self._head_tails_light
        carry0 = self._scan_carry0(B)

        def run_step(stats_nh, state_nh, y_t):
            ctx = C.Ctx(train=train)
            base_outs, s2, st2 = self._neck_heads(
                params, stats_nh, state_nh, y_t, ctx
            )
            if deferred:
                return s2, st2, base_outs
            cls_list, box_list = [], []
            for idx, base_out in enumerate(base_outs):
                hp = params[f"head{idx}"]
                head = self.heads[idx]
                box_out, ns_box, nst_box = head["box"].apply(
                    hp["box"], stats_nh[f"head{idx}"]["box"],
                    state_nh[f"head{idx}"]["box"], base_out, ctx
                )
                cls_out, ns_cls, nst_cls = head["cls"].apply(
                    hp["cls"], stats_nh[f"head{idx}"]["cls"],
                    state_nh[f"head{idx}"]["cls"], base_out, ctx
                )
                s2[f"head{idx}"]["box"] = ns_box
                s2[f"head{idx}"]["cls"] = ns_cls
                st2[f"head{idx}"]["box"] = nst_box
                st2[f"head{idx}"]["cls"] = nst_cls
                box_list.append(box_out.reshape(B, -1, 4))
                cls_list.append(
                    cls_out.reshape(B, -1, self.num_classes + 1)
                )
            return s2, st2, (
                jnp.concatenate(cls_list, axis=1).astype(jnp.float32),
                jnp.concatenate(box_list, axis=1).astype(jnp.float32),
            )

        stats_nh0 = {k: v for k, v in stats.items() if k != "backbone"}
        state_nh0 = {k: v for k, v in state.items() if k != "backbone"}
        stats_nh, state_nh, out = self._scan_steps(
            run_step, y_seq, T, carry0, stats_nh0, state_nh0, start_step
        )
        if deferred:
            ctx = C.Ctx(train=train)
            cls_p, box_p = self._tail_readout(params, stats, state, out, ctx)
            preds = (cls_p.astype(jnp.float32), box_p.astype(jnp.float32))
        else:
            preds = out
        new_stats = dict(stats_nh)
        new_state = dict(state_nh)
        new_stats["backbone"] = nb_stats
        new_state["backbone"] = nb_state
        return preds, new_stats, new_state

    def forward_fn(self, schedule):
        """Map a training-schedule flag — the
        ``Trainer(time_batched=...)`` values — to the forward
        implementation: ``False`` -> :meth:`forward` (per-step scan),
        ``True`` -> :meth:`forward_seq` (time-batched), ``"hybrid"``
        -> :meth:`forward_hybrid`. The single dispatch point shared by
        the Trainer and the schedule benchmarks."""
        try:
            return {
                False: self.forward,
                True: self.forward_seq,
                "hybrid": self.forward_hybrid,
            }[schedule]
        except (KeyError, TypeError):
            raise ValueError(
                f"unknown schedule {schedule!r}; expected False, True, "
                "or 'hybrid'"
            ) from None

    # ----- loss (soda.py:259-281) -----

    def loss(
        self,
        preds: Tuple[Array, Array],
        labels: Array,
    ) -> Array:
        """SSD loss: CE split into GT/background means weighted by
        ``loss_ratio``, plus masked L1 on box offsets (normalized over
        all B*A*4 elements, matching ``box_loss(...).mean()``).

        :param labels: [B, N, 5] (class, x1, y1, x2, y2), -1-padded.
        """
        if labels.shape[-1] != 5:
            raise ValueError(
                f"loss expects [B, N, 5] single-target labels, got "
                f"{labels.shape}. Multi-target windows (one_label=False, "
                "6 columns with a leading frame index) are for analysis/"
                "prediction, not training — the reference has the same "
                "constraint (roi.py:41 reads label[:, 1:] as 4 box coords)."
            )
        cls_preds, bbox_preds = preds
        bbox_offset, bbox_mask, class_labels = matching.match_targets(
            self.anchors, labels, self.iou_threshold
        )
        num_out = cls_preds.shape[-1]
        logp = jax.nn.log_softmax(cls_preds.reshape(-1, num_out), axis=-1)
        flat_labels = class_labels.reshape(-1)
        ce = -jnp.take_along_axis(logp, flat_labels[:, None], axis=-1)[:, 0]

        pos = flat_labels > 0
        n_pos = jnp.maximum(jnp.sum(pos), 1)
        n_neg = jnp.maximum(jnp.sum(~pos), 1)
        gt_loss = jnp.sum(jnp.where(pos, ce, 0.0)) / n_pos
        background_loss = jnp.sum(jnp.where(pos, 0.0, ce)) / n_neg

        bbox_l1 = jnp.mean(
            jnp.abs(bbox_preds * bbox_mask - bbox_offset * bbox_mask)
        )
        return (
            gt_loss * self.loss_ratio
            + background_loss * (1 - self.loss_ratio)
            + bbox_l1
        )

    # ----- detection post-processing (soda.py:202-233, 294-321) -----

    def detect(
        self, preds: Tuple[Array, Array], max_out: int = 300
    ) -> Array:
        """Softmax + NMS decode: [B, max_out, 6] (class, conf, xyxy)."""
        cls_preds, bbox_preds = preds
        probs = jax.nn.softmax(cls_preds, axis=2)
        return nms.multibox_detection(
            probs, bbox_preds, self.anchors, max_out=max_out
        )

    def predict(
        self,
        params: Any,
        stats: Any,
        x: Array,
        state: Optional[Any] = None,
        max_out: int = 300,
    ) -> Tuple[Array, Any]:
        """Streaming single-frame inference (soda.py:202-233).

        :param x: One frame [H, W, C] (or [B, H, W, C]).
        :return: (detections [max_out, 6] clamped to [0, 1], new state).
            Padded rows have class -1; filter with
            ``ops.nms.filter_detections`` on the host.
        """
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        if state is None:
            state = self.init_state(x.shape[0])
        (cls_p, box_p), _, state, _ = self.step(
            params, stats, state, x, train=False
        )
        dets = self.detect((cls_p, box_p), max_out=max_out)
        boxes = jnp.clip(dets[..., 2:], 0.0, 1.0)
        dets = jnp.concatenate([dets[..., :2], boxes], axis=-1)
        if squeeze:
            dets = dets[0]
        return dets, state

    # ----- introspection (StateStorage analogue, common.py:86-123) -----

    def forward_with_records(
        self,
        params: Any,
        stats: Any,
        X: Array,
        state: Optional[Any] = None,
    ) -> Tuple[Tuple[Array, Array], Any, Any, Dict[str, Any]]:
        """Eval forward that also returns per-step neuron states/spikes
        for every ``state_storage=True`` layer, time-stacked via scan
        (shape [T, ...] per leaf)."""
        B = X.shape[1]
        if state is None:
            state = self.init_state(B)

        def body(carry, x_t):
            stats, state = carry
            preds, s2, st2, recs = self.step(
                params, stats, state, x_t, train=False, record=True
            )
            return (s2, st2), (preds, recs)

        (stats, state), (preds_seq, records) = jax.lax.scan(
            body, (stats, state), X
        )
        last = jax.tree.map(lambda a: a[-1], preds_seq)
        return last, stats, state, records
