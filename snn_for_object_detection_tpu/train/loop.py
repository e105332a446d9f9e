"""First-party training/evaluation loop (the Lightning replacement).

Orchestration parity with the reference trainer config
(/root/reference/config/config.yaml:33-77 + main.py):

- epochs of ``limit_train_batches`` steps over the infinite stream
  (the only thing that makes an epoch finite, SURVEY.md §4);
- validation every ``check_val_every_n_epoch`` epochs with mAP;
- EarlyStopping(monitor=map, mode=max, patience) and top-k-by-map
  checkpoint retention (config.yaml:39-49);
- resume via ``ckpt_path``;
- Adamax optimizer (soda.py:135-136).

TPU-native core: one jitted train step = random-start truncation +
T-step scan forward + loss + grad + Adamax update, with params donated
(no copy per step) and the batch sharded over the data-parallel mesh.
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from snn_for_object_detection_tpu.parallel import (
    batch_sharding,
    data_extent,
    feature_sharding,
    make_mesh,
    prefetch_to_device,
    replicated,
    shard_batch,
)
from snn_for_object_detection_tpu.parallel import distributed as dist
from snn_for_object_detection_tpu.train.checkpoint import CheckpointManager
from snn_for_object_detection_tpu.train.metrics import (
    MeanAveragePrecision,
    detections_to_map_inputs,
)


class MetricsLogger:
    """JSONL + stdout metrics sink (the logger-config analogue,
    SURVEY.md §5.5)."""

    def __init__(self, out_dir: str, backends=()):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self.backends = list(backends)
        for b in self.backends:
            set_out_dir = getattr(b, "set_out_dir", None)
            if set_out_dir is not None:
                set_out_dir(out_dir)

    def log(self, step: int, payload: Dict[str, float]) -> None:
        if not dist.is_primary():
            # multi-host: metrics are already merged/replicated — one
            # writer avoids interleaved lines on a shared filesystem
            return
        rec = {"step": step, "time": time.time(), **payload}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")
        printable = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in payload.items()
        )
        print(f"[step {step}] {printable}", flush=True)
        for b in self.backends:
            b.log_metrics(step, payload)

    def close(self) -> None:
        for b in self.backends:
            b.close()


class Trainer:
    """Training orchestrator.

    :param mesh: Optional pre-built device mesh; default = 1-D mesh
        over all visible devices (data parallelism).
    :param spatial_devices: Devices along the ``space`` mesh axis.
        ``>1`` builds a 2-D ``(data, space)`` mesh that additionally
        shards the image-height axis, so geometries whose batch is
        smaller than the chip count — 1Mpx training at B=2-4 on a
        v5e-8 — still use every chip (GSPMD halo-exchanges conv
        shard edges automatically). Ignored when ``mesh`` is given.
    :param time_batched: ``True`` trains through ``model.forward_seq``
        — convs folded over T*B, LIF/LI cells as single VMEM-resident
        Pallas kernels, conv->norm->cell segments rematerialized —
        instead of the per-step scan; ``"hybrid"`` time-batches only
        the backbone (the big early feature maps) and scans the
        neck/heads per step (``model.forward_hybrid``). All three
        schedules are identical math (same loss, same gradients);
        pick by measurement (benchmarks/bench_train.py,
        benchmarks/bench_1mpx_train.py) — or pass ``"auto"`` and the
        trainer measures them itself on the run's real geometry at
        fit/validate start and pins the fastest (a schedule that OOMs
        there is disqualified rather than fatal).
    :param ema_decay: Enable EMA weight averaging (e.g. ``0.999``):
        a decay-weighted average of the params is maintained inside
        the jitted train step (one fused elementwise pass), validation
        and checkpoint ranking use the AVERAGED weights, and the
        checkpoint stores them under ``ema_params`` (``main.py``
        deploys them automatically). Off by default. Horizon rule
        (measured — docs/perf.md "EMA"): the average needs
        ``total_steps >> 10 / (1 - decay)`` to pay; at a 600-step
        synthetic run the 3-seed study measured 0.99 within seed
        noise of off and 0.999 decisively worse (the average never
        catches the live weights). Reserve it for long schedules
        (e.g. the 250k-step GEN1 recipe, where 0.999's ~1k-step time
        constant is <1% of the run).
    """

    def __init__(
        self,
        max_epochs: int = -1,
        min_epochs: int = 0,
        limit_train_batches: int = 100,
        limit_val_batches: int = 100,
        limit_test_batches: int = 1000,
        check_val_every_n_epoch: int = 20,
        early_stopping_patience: int = 30,
        monitor: str = "map",
        save_top_k: int = 4,
        log_every_n_steps: int = 20,
        out_dir: str = "log/run",
        seed: int = 0,
        mesh=None,
        debug_nans: bool = False,
        profile_dir: Optional[str] = None,
        gradient_clip_norm: Optional[float] = None,
        accumulate_grad_batches: int = 1,
        fast_dev_run: bool = False,
        limit_predict_batches: int = 1,
        prefetch_batches: int = 2,
        spatial_devices: int = 1,
        time_batched: bool = False,
        ema_decay: Optional[float] = None,
        optimizer: Any = "adamax",
        lr_schedule: Optional[Dict[str, Any]] = None,
        logger: Any = None,
    ):
        if fast_dev_run:
            # one-batch smoke run (the Lightning flag, config.yaml:53)
            max_epochs = 1
            limit_train_batches = 1
            limit_val_batches = 1
            limit_test_batches = 1
            check_val_every_n_epoch = 1
            min_epochs = 0
        self.max_epochs = max_epochs
        self.min_epochs = min_epochs
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.early_stopping_patience = early_stopping_patience
        self.monitor = monitor
        self.log_every_n_steps = log_every_n_steps
        self.out_dir = out_dir
        self.seed = seed
        self._mesh = mesh  # user-provided; else sized lazily per batch
        # live mesh reshape (ROADMAP "live mesh reshape"): queued via
        # request_mesh_reshape() or an out_dir/reshape_request file,
        # applied at the next epoch boundary without restart
        self._pending_mesh = None
        self.debug_nans = debug_nans
        self.profile_dir = profile_dir
        self.gradient_clip_norm = gradient_clip_norm
        self.accumulate_grad_batches = max(accumulate_grad_batches, 1)
        self.fast_dev_run = fast_dev_run
        self.limit_predict_batches = limit_predict_batches
        # device-resident batches kept ahead of the train step
        # (background host->device transfer; 0 = synchronous)
        self.prefetch_batches = prefetch_batches
        self.spatial_devices = max(int(spatial_devices), 1)
        # Time-batched training schedule: the train step runs
        # model.forward_seq (convs folded over T*B, Pallas temporal
        # cells, segment-level remat) instead of the per-step scan.
        # Wins where neuron-state HBM traffic dominates (1Mpx); the
        # step scan stays default (faster at GEN1 geometry, where XLA
        # fuses each cell update into its producer conv's epilogue —
        # docs/perf.md "time-batched"). "hybrid" = time-batched
        # backbone + per-step neck/heads (model.forward_hybrid).
        # "auto" resolves at fit/validate start: one step per schedule
        # is compiled and timed on the REAL batch geometry and the
        # fastest wins (schedules are numerically equivalent, so this
        # is purely a throughput decision — costs a few extra compiles
        # once per run).
        if time_batched not in (False, True, "hybrid", "auto"):
            raise ValueError(
                f"time_batched must be False, True, 'hybrid' or "
                f"'auto', got {time_batched!r}"
            )
        self.time_batched = time_batched
        self._auto_schedule = {}  # "auto" resolutions per mode
        # EMA weight averaging (beyond the reference; the standard
        # detection mAP booster): keep a decay-weighted average of the
        # params alongside training, validate/checkpoint with it.
        if ema_decay is not None and not 0.0 <= float(ema_decay) <= 1.0:
            raise ValueError(f"ema_decay must be in [0, 1], got {ema_decay}")
        if ema_decay is not None and float(ema_decay) == 1.0:
            print(
                "[trainer] WARNING: ema_decay=1.0 freezes the average "
                "at the INITIAL params — validation/checkpoints will "
                "score untrained weights. Typical values: 0.99-0.9999.",
                flush=True,
            )
        self.ema_decay = None if ema_decay is None else float(ema_decay)
        # Optimizer surface (beyond the reference's fixed Adamax,
        # soda.py:135-136): any optax factory by name ("adamax",
        # "adamw", "sgd", ...) or {"name": ..., **kwargs}; optional LR
        # schedule {"name": "warmup_cosine"|"cosine"|"exponential",
        # ...} with the model's learning_rate as the peak value.
        self.optimizer = optimizer
        self.lr_schedule = lr_schedule
        # Tracker backends (the trainer.logger config surface, reference
        # main.py:13-16): a class_path/init_args dict, a list of them,
        # or pre-built objects with log_metrics/close.
        self.logger = MetricsLogger(out_dir, self._build_loggers(logger))
        self.ckpt = CheckpointManager(
            os.path.join(out_dir, "checkpoints"),
            save_top_k=save_top_k,
            monitor=monitor,
        )

    @staticmethod
    def _build_loggers(logger):
        if logger is None:
            return []
        if not isinstance(logger, (list, tuple)):
            logger = [logger]
        from snn_for_object_detection_tpu.utils.config import instantiate

        return [
            instantiate(item) if isinstance(item, dict) else item
            for item in logger
        ]

    def mesh_for_batch(self, batch_size: int):
        """Data-parallel mesh whose data extent divides the global
        batch. A user-provided mesh is used as-is; otherwise take the
        largest divisor of ``batch_size`` not exceeding the device
        count (so small debug batches still run on big hosts). With
        ``spatial_devices=k``, each data replica spans ``k`` devices
        along a second ``space`` axis (height-sharded feature maps).

        Multi-process: ``batch_size`` is per-host (DDP semantics), the
        mesh always spans every device of every host, and the per-host
        batch must divide evenly over the host's local devices."""
        if self._mesh is not None:
            return self._mesh
        s = self.spatial_devices
        if dist.is_distributed():
            if s > 1:
                # a space axis crossing host boundaries would put halo
                # exchanges on DCN; keep spatial sharding single-host
                raise ValueError(
                    "spatial_devices > 1 is single-host only; pass an "
                    "explicit mesh to shard spatially across hosts"
                )
            n_local = len(jax.local_devices())
            if batch_size % n_local:
                raise ValueError(
                    f"per-host batch {batch_size} is not divisible by "
                    f"the {n_local} local devices of this host"
                )
            self._mesh = make_mesh()
            return self._mesh
        n_dev = len(jax.devices())
        if n_dev % s:
            raise ValueError(
                f"{n_dev} devices not divisible by spatial_devices={s}"
            )
        n = min(n_dev // s, batch_size)
        while batch_size % n:
            n -= 1
        self._mesh = make_mesh(jax.devices()[: n * s], spatial=s)
        if n * s < n_dev:
            shape = f"{n}x{s} (data x space)" if s > 1 else f"{n}-device"
            print(
                f"[trainer] batch {batch_size} not divisible by "
                f"{n_dev // s} data replicas; using a {shape} mesh",
                flush=True,
            )
        return self._mesh

    @staticmethod
    def _sync_data_sharding(data) -> None:
        """Point the DataModule at this process's dataset shard
        (host_id/num_hosts default to a single-host setup; under
        jax.distributed they are derived, not hand-configured)."""
        if not dist.is_distributed():
            return
        if getattr(data, "num_hosts", 1) == 1:
            data.host_id = jax.process_index()
            data.num_hosts = jax.process_count()

    @property
    def mesh(self):
        if self._mesh is None:
            self._mesh = make_mesh()
        return self._mesh

    # ------------------------------------------------------------------
    # live mesh reshape (no checkpoint + relaunch)
    # ------------------------------------------------------------------

    def request_mesh_reshape(self, devices=None, num_devices=None):
        """Queue a data-parallel mesh change, applied at the next epoch
        boundary of a running ``fit`` — params/opt state are re-placed
        with ``device_put`` and the jitted steps rebuilt in-process,
        with no checkpoint round trip. Callable from another thread
        (a cluster-health watcher) or before ``fit``.

        The alternative trigger for external supervisors
        (scripts/supervise.py): write the target device count to
        ``out_dir/reshape_request``; the file is consumed at the next
        epoch boundary.
        """
        if devices is None:
            if num_devices is None:
                raise ValueError("pass devices or num_devices")
            avail = jax.devices()
            if not 1 <= num_devices <= len(avail):
                raise ValueError(
                    f"num_devices must be in [1, {len(avail)}], "
                    f"got {num_devices}"
                )
            devices = avail[:num_devices]
        if len(devices) < 1:
            raise ValueError("reshape needs at least one device")
        s = self.spatial_devices
        if len(devices) % s:
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"spatial_devices={s}"
            )
        self._pending_mesh = make_mesh(devices, spatial=s)

    def _poll_mesh_reshape(self, batch_size: int) -> bool:
        """Apply a queued reshape if valid; returns True on change."""
        if dist.is_distributed():
            # Per-process file triggers / device prefixes cannot stay
            # coherent across hosts (diverged meshes hang collectives);
            # multi-host elasticity goes through checkpoint + relaunch.
            if self._pending_mesh is not None:
                print("[trainer] live reshape ignored under multi-host; "
                      "use checkpoint + relaunch", flush=True)
                self._pending_mesh = None
            return False
        req = os.path.join(self.out_dir, "reshape_request")
        if self._pending_mesh is None and os.path.exists(req):
            # Atomically claim the file first: a supervisor that rewrites
            # the request between our read and remove lands as a *fresh*
            # file and is picked up next epoch instead of being deleted
            # unread.
            claimed = req + ".claimed"
            try:
                os.rename(req, claimed)
            except OSError:
                claimed = None  # supervisor removed it mid-poll
            if claimed is not None:
                try:
                    with open(claimed) as f:
                        n = int(f.read().strip())
                    self.request_mesh_reshape(num_devices=n)
                except (ValueError, IndexError, OSError) as e:
                    print(f"[trainer] bad reshape_request ignored: {e}",
                          flush=True)
                finally:
                    try:
                        os.remove(claimed)
                    except OSError:
                        pass
        new = self._pending_mesh
        self._pending_mesh = None
        if new is None or new.shape == self.mesh.shape:
            return False
        if batch_size % data_extent(new):
            print(
                f"[trainer] reshape to {new.size} devices ignored: "
                f"batch {batch_size} not divisible by the "
                f"{data_extent(new)} data replicas",
                flush=True,
            )
            return False
        print(
            f"[trainer] live mesh reshape: {self.mesh.size} -> "
            f"{new.size} devices",
            flush=True,
        )
        self._mesh = new
        return True

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _make_learning_rate(self, model):
        """Constant LR, or an optax schedule peaking at the model's
        learning_rate (step = optimizer update count)."""
        if not self.lr_schedule:
            return model.learning_rate
        cfg = dict(self.lr_schedule)
        kind = cfg.pop("name", "warmup_cosine")
        lr = model.learning_rate
        if kind == "warmup_cosine":
            return optax.warmup_cosine_decay_schedule(
                init_value=cfg.pop("init_value", 0.0),
                peak_value=lr,
                warmup_steps=cfg.pop("warmup_steps", 0),
                decay_steps=cfg.pop("decay_steps"),
                end_value=cfg.pop("end_value", 0.0),
                **cfg,
            )
        if kind == "cosine":
            return optax.cosine_decay_schedule(lr, **cfg)
        if kind == "exponential":
            return optax.exponential_decay(lr, **cfg)
        raise ValueError(
            f"unknown lr_schedule name {kind!r} "
            "(warmup_cosine | cosine | exponential)"
        )

    def _make_optimizer(self, model):
        lr = self._make_learning_rate(model)
        if isinstance(self.optimizer, str):
            name, kwargs = self.optimizer, {}
        else:
            cfg = dict(self.optimizer)
            name = cfg.pop("name")
            kwargs = cfg
        factory = getattr(optax, name, None)
        if factory is None or not callable(factory):
            raise ValueError(
                f"unknown optimizer {name!r} (any optax factory name, "
                "e.g. adamax/adam/adamw/sgd/lion)"
            )
        return factory(lr, **kwargs)

    def _schedule_for(self, model, data, train: bool):
        """The schedule ``_build_steps`` should use. Non-"auto" values
        pass through; "auto" is resolved by measurement — separately
        for the train step (BPTT memory/throughput) and the eval step
        (forward only), since the winner can differ — and cached per
        mode, so repeated fit/validate calls measure once."""
        if self.time_batched != "auto":
            return self.time_batched
        key = "train" if train else "eval"
        if self._auto_schedule.get(key) is None:
            self._auto_schedule[key] = self._measure_schedules(
                model, data, train
            )
        return self._auto_schedule[key]

    def _measure_schedules(self, model, data, train: bool):
        """Compile one step per schedule on the run's real
        ``[T, B, H, W, C]`` geometry (dummy zero frames in the
        dataset's staging dtype — the conv/cell math is
        data-independent), time two post-compile reps, and return the
        fastest. A schedule that fails to compile or OOMs at this
        geometry is disqualified, so "auto" is never worse than the
        surviving schedules (e.g. fp32-state 1Mpx step scans that OOM
        where time-batched fits)."""
        T, B = data.num_steps, data.batch_size
        H, W = model.in_hw
        X = jnp.zeros(
            (T, B, H, W, model.in_channels),
            jnp.dtype(getattr(data, "frame_dtype", "uint8")),
        )
        labels = jnp.full(
            (B, getattr(data, "max_labels", 8), 5), -1.0, jnp.float32
        )
        Xd, labd = shard_batch(self.mesh, X, labels)
        params, stats = model.init(jax.random.PRNGKey(0))
        rep = replicated(self.mesh)
        feat_sh = feature_sharding(self.mesh)
        lab_sh = batch_sharding(self.mesh, 0)
        # traced start_step when truncation is on, matching the real
        # step's lax.cond body (the plain body compiles differently)
        r = jnp.asarray(0, jnp.int32) if model.time_window else 0

        timings = {}
        for sched in (False, "hybrid", True):
            fwd = model.forward_fn(sched)
            if train:
                def step_fn(p, s, X, labels, fwd=fwd):
                    def loss_fn(p, s):
                        preds, ns, _ = fwd(
                            p, s, X, start_step=r, train=True
                        )
                        return model.loss(preds, labels), ns
                    (l, _), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(p, s)
                    # realistic BPTT cost; the optimizer update is
                    # schedule-independent and skipped
                    return l, grads
            else:
                def step_fn(p, s, X, labels, fwd=fwd):
                    preds, _, _ = fwd(p, s, X, start_step=r)
                    return model.loss(preds, labels)
            f = None
            try:
                # compile is HOST-LOCAL — a failure here must not leave
                # peers stuck in a collective, so hosts agree on
                # compile success below before anyone executes
                f = jax.jit(
                    step_fn, in_shardings=(rep, rep, feat_sh, lab_sh)
                ).lower(params, stats, Xd, labd).compile()
                ok = True
            except Exception as e:
                print(
                    f"[trainer] schedule {sched!r} disqualified "
                    f"(compile): {type(e).__name__}: {e}"[:200],
                    flush=True,
                )
                ok = False
            if dist.is_distributed() and not all(
                dist.allgather_pickle(ok)
            ):
                ok = False  # some host failed -> nobody executes it
            if not ok:
                timings[sched] = float("inf")
                continue
            try:
                jax.block_until_ready(f(params, stats, Xd, labd))
                t0 = time.perf_counter()
                for _ in range(2):
                    out = f(params, stats, Xd, labd)
                jax.block_until_ready(out)
                timings[sched] = (time.perf_counter() - t0) / 2
                print(
                    f"[trainer] schedule {sched!r}: "
                    f"{timings[sched] * 1e3:.0f} ms/step",
                    flush=True,
                )
            except Exception as e:
                # runtime failure: in distributed mode this can only
                # surface symmetrically (same program everywhere), so
                # the inf merges identically on every host
                print(
                    f"[trainer] schedule {sched!r} disqualified: "
                    f"{type(e).__name__}: {e}"[:200],
                    flush=True,
                )
                timings[sched] = float("inf")
            del f  # release the timing executable before the next one
        if dist.is_distributed():
            # every host MUST pin the same schedule (diverged compiled
            # programs hang collectives); merge timings deterministically
            merged = {}
            for host_timings in dist.allgather_pickle(timings):
                for k, v in host_timings.items():
                    merged[k] = merged.get(k, 0.0) + v
            timings = merged
        best = min(timings, key=timings.get)
        if not np.isfinite(timings[best]):
            raise RuntimeError(
                "time_batched='auto': no schedule compiled at "
                f"T={T} B={B} {H}x{W}"
            )
        print(
            f"[trainer] time_batched='auto' -> {best!r} "
            f"({'train' if train else 'eval'} step)",
            flush=True,
        )
        return best

    def _build_steps(self, model, schedule=None):
        # Adamax default (soda.py:135-136) — configurable via the
        # ``optimizer``/``lr_schedule`` trainer options — optionally
        # behind global-norm gradient clipping (the Lightning
        # gradient_clip_* analogue; long-BPTT SNN training can blow up
        # without it).
        optimizer = self._make_optimizer(model)
        if self.gradient_clip_norm:
            optimizer = optax.chain(
                optax.clip_by_global_norm(self.gradient_clip_norm),
                optimizer,
            )
        if self.accumulate_grad_batches > 1:
            # gradient accumulation (config.yaml:68): params update every
            # N micro-batches, gradients averaged by MultiSteps
            optimizer = optax.MultiSteps(
                optimizer, every_k_schedule=self.accumulate_grad_batches
            )
        rep = replicated(self.mesh)
        feat_sh = feature_sharding(self.mesh)
        lab_sh = batch_sharding(self.mesh, 0)

        fwd = model.forward_fn(
            self.time_batched if schedule is None else schedule
        )

        decay = self.ema_decay

        def train_step(params, opt_state, stats, ema, X, labels, key):
            r = (
                jax.random.randint(key, (), 0, model.time_window)
                if model.time_window
                else 0
            )

            def loss_fn(p, stats):
                preds, new_stats, _ = fwd(
                    p, stats, X, start_step=r, train=True
                )
                return model.loss(preds, labels), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if decay is not None:
                # EMA weight averaging (fused into the step: one
                # elementwise pass over the 4M-param tree, negligible
                # next to the BPTT grad)
                blended = jax.tree.map(
                    lambda e, p: decay * e + (1.0 - decay) * p,
                    ema, params,
                )
                if self.accumulate_grad_batches > 1:
                    # blend only when MultiSteps actually flushed a
                    # real update (mini_step wrapped to 0) — otherwise
                    # decay would compound to decay^k per true step
                    did_step = opt_state.mini_step == 0
                    ema = jax.tree.map(
                        lambda b, e: jnp.where(did_step, b, e),
                        blended, ema,
                    )
                else:
                    ema = blended
            return params, opt_state, new_stats, ema, loss

        jit_train = jax.jit(
            train_step,
            in_shardings=(rep, rep, rep, rep, feat_sh, lab_sh, rep),
            out_shardings=(rep, rep, rep, rep, rep),
            donate_argnums=(0, 1, 2, 3),
        )

        def eval_step(params, stats, X, labels, key):
            r = (
                jax.random.randint(key, (), 0, model.time_window)
                if model.time_window
                else 0
            )
            # eval follows the same schedule as training (the schedules
            # are numerically equivalent; whichever is faster for the
            # geometry is faster for eval too)
            preds, _, _ = fwd(params, stats, X, start_step=r)
            loss = model.loss(preds, labels)
            dets = model.detect(preds)
            return loss, dets

        jit_eval = jax.jit(
            eval_step,
            in_shardings=(rep, rep, feat_sh, lab_sh, rep),
        )
        return optimizer, jit_train, jit_eval

    # ------------------------------------------------------------------
    # fit / validate / test
    # ------------------------------------------------------------------

    def fit(
        self,
        model,
        data,
        ckpt_path: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Train until early stopping / max_epochs. Returns final state."""
        if self.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self._sync_data_sharding(data)
        self.mesh_for_batch(data.batch_size)
        schedule = self._schedule_for(model, data, train=True)
        optimizer, jit_train, jit_eval = self._build_steps(model, schedule)
        key = jax.random.PRNGKey(self.seed)

        params, stats = model.init(jax.random.fold_in(key, 0))
        opt_state = optimizer.init(params)
        # EMA starts AT the initial params (a fresh copy: params are
        # donated every step, the average must own its buffers)
        ema = (
            jax.tree.map(jnp.array, params)
            if self.ema_decay is not None else None
        )
        step = 0
        epoch = 0
        best_metric = -np.inf
        checks_since_best = 0

        if ckpt_path == "auto":
            # fault-tolerant relaunch: resume from this run's own last
            # checkpoint if one exists, else start fresh
            last = os.path.join(self.out_dir, "checkpoints", "last")
            ckpt_path = last if os.path.exists(last) else None
        if ckpt_path:
            target = {
                "params": params,
                "stats": stats,
                "opt_state": opt_state,
                "step": 0,
                "epoch": 0,
                "best_metric": 0.0,
                "checks_since_best": 0,
            }
            # restore() trims the target to the keys actually stored
            # (pre-early-stopping checkpoints lack the callback keys;
            # weights-only exports lack the trainer state entirely);
            # a corrupt checkpoint surfaces its real Orbax error
            if ema is not None:
                target["ema_params"] = ema
            restored = self.ckpt.restore(ckpt_path, target=target)
            params = restored["params"]
            stats = restored["stats"]
            if ema is not None:
                # older/EMA-less checkpoints: restart the average from
                # the restored params
                ema = (
                    restored["ema_params"]
                    if "ema_params" in restored
                    else jax.tree.map(jnp.array, params)
                )
            if "opt_state" in restored:
                opt_state = restored["opt_state"]
            else:
                print(
                    f"[trainer] {ckpt_path} has no optimizer state "
                    "(weights-only checkpoint); optimizer starts fresh",
                    flush=True,
                )
            step = int(restored.get("step", 0))
            epoch = int(restored.get("epoch", 0))
            # early-stopping callback state survives restarts (Lightning
            # checkpoints restore it too)
            best_metric = float(restored.get("best_metric", -np.inf))
            checks_since_best = int(restored.get("checks_since_best", 0))
            print(f"resumed from {ckpt_path} at step {step}", flush=True)

        # background host->device prefetch: rasterization + transfer of
        # the next batches overlap the current train step
        train_iter = prefetch_to_device(
            data.train_loader(), self.mesh, self.prefetch_batches
        )
        val_iter_factory = data.val_loader
        try:

            # Profiling hook (SURVEY.md §5.1): capture a TensorBoard/Perfetto
            # trace of a few post-compile steps when profile_dir is set.
            profile_at = 3 if self.profile_dir else -1
            profiling = False

            t_epoch = time.time()
            while self.max_epochs < 0 or epoch < self.max_epochs:
                # ---- live mesh reshape (checked BEFORE the epoch so
                # a request queued during the final epoch never spins
                # up a loader pipeline that nothing consumes) ----
                if self._poll_mesh_reshape(data.batch_size):
                    rep = replicated(self.mesh)
                    params, opt_state, stats = jax.device_put(
                        (params, opt_state, stats), rep
                    )
                    if ema is not None:
                        ema = jax.device_put(ema, rep)
                    optimizer, jit_train, jit_eval = self._build_steps(
                        model, schedule
                    )
                    train_iter.close()
                    train_iter = prefetch_to_device(
                        data.train_loader(), self.mesh,
                        self.prefetch_batches,
                    )

                # ---- one train epoch ----
                losses = []
                for _ in range(self.limit_train_batches):
                    Xd, labd = next(train_iter)
                    key, sub = jax.random.split(key)
                    if step == profile_at and not profiling:
                        jax.profiler.start_trace(self.profile_dir)
                        profiling = True
                    params, opt_state, stats, ema, loss = jit_train(
                        params, opt_state, stats, ema, Xd, labd, sub
                    )
                    if profiling and step >= profile_at + 2:
                        jax.block_until_ready(loss)
                        jax.profiler.stop_trace()
                        profiling = False
                        print(f"[trainer] profile written to {self.profile_dir}",
                              flush=True)
                    step += 1
                    losses.append(loss)
                    if step % self.log_every_n_steps == 0:
                        self.logger.log(
                            step, {"train_loss": float(jnp.mean(jnp.stack(losses[-self.log_every_n_steps:])))}
                        )
                epoch += 1
                self.logger.log(
                    step,
                    {
                        "epoch": epoch,
                        "epoch_train_loss": float(jnp.mean(jnp.stack(losses))),
                        "epoch_time_s": time.time() - t_epoch,
                    },
                )
                t_epoch = time.time()

                # ---- periodic validation + checkpointing + early stop ----
                if epoch % self.check_val_every_n_epoch == 0:
                    key, sub = jax.random.split(key)
                    # validate with the EMA weights when averaging is
                    # on (the weights that would be deployed)
                    metrics = self._run_eval(
                        model, jit_eval,
                        params if ema is None else ema, stats,
                        val_iter_factory(), self.limit_val_batches, sub, "val",
                    )
                    self.logger.log(step, metrics)
                    metric = metrics.get(self.monitor, 0.0)
                    # Update the early-stopping state BEFORE saving so a
                    # resume sees this validation's outcome (saving the
                    # pre-comparison values forgot a new best across
                    # every restart).
                    if metric > best_metric:
                        best_metric = metric
                        checks_since_best = 0
                    else:
                        checks_since_best += 1
                    # multi-host: save() is a collective — every process
                    # calls it; only process 0 touches the filesystem index
                    payload = {
                        "params": params,
                        "stats": stats,
                        "opt_state": opt_state,
                        "step": step,
                        "epoch": epoch,
                        "best_metric": best_metric,
                        "checks_since_best": checks_since_best,
                    }
                    if ema is not None:
                        payload["ema_params"] = ema
                    self.ckpt.save(
                        step, payload,
                        metric=metric,
                        meta={"metrics": metrics, "epoch": epoch},
                    )
                    # Patience counts VALIDATION CHECKS, matching Lightning's
                    # EarlyStopping semantics (patience=30 = 30 stagnant
                    # checks, not 30 epochs; config.yaml:40-44).
                    if (
                        epoch >= self.min_epochs
                        and self.early_stopping_patience > 0
                        and checks_since_best >= self.early_stopping_patience
                    ):
                        print(
                            f"early stopping at epoch {epoch} "
                            f"(best {self.monitor}={best_metric:.4f})",
                            flush=True,
                        )
                        break

        finally:
            # stop prefetch + loader worker threads even when the
            # epoch loop raises (loader error, NaN abort, Ctrl-C);
            # close tracker backends too so event files are flushed —
            # even when the loader teardown itself raises
            try:
                train_iter.close()
            finally:
                self.logger.close()
        dist.barrier("fit_end")
        result = {
            "params": params,
            "stats": stats,
            "opt_state": opt_state,
            "step": step,
            "epoch": epoch,
            "best_metric": best_metric,
        }
        if ema is not None:
            result["ema_params"] = ema
        return result

    def _run_eval(
        self, model, jit_eval, params, stats, data_iter, limit, key, prefix
    ) -> Dict[str, float]:
        map_metric = MeanAveragePrecision()
        losses = []
        try:
            for X, labels in itertools.islice(data_iter, limit):
                key, sub = jax.random.split(key)
                Xd, labd = shard_batch(self.mesh, X, labels)
                loss, dets = jit_eval(params, stats, Xd, labd, sub)
                losses.append(float(loss))
                # multi-host: score only the rows THIS host contributed
                # (its local labels) — other hosts' detections are not
                # addressable here and are scored by their own process
                preds, targets = detections_to_map_inputs(
                    dist.local_rows(dets), labels
                )
                map_metric.update(preds, targets)
        finally:
            # close the loader generator so its worker threads stop now
            # (islice alone would leave them running until GC)
            close = getattr(data_iter, "close", None)
            if close is not None:
                close()
        if dist.is_distributed():
            # fold every host's accumulator + losses (torchmetrics'
            # dist-sync analogue, soda.py:95); every host computes the
            # identical merged result
            gathered = dist.allgather_pickle((map_metric, losses))
            map_metric, losses = gathered[0]
            for other_metric, other_losses in gathered[1:]:
                map_metric.merge(other_metric)
                losses.extend(other_losses)
        result = map_metric.compute()
        out = {f"{prefix}_loss": float(np.mean(losses)) if losses else 0.0}
        out.update({k: float(v) for k, v in result.items()})
        return out

    def validate(self, model, data, params, stats) -> Dict[str, float]:
        self._sync_data_sharding(data)
        self.mesh_for_batch(data.batch_size)
        schedule = self._schedule_for(model, data, train=False)
        _, _, jit_eval = self._build_steps(model, schedule)
        key = jax.random.PRNGKey(self.seed)
        metrics = self._run_eval(
            model, jit_eval, params, stats,
            data.val_loader(), self.limit_val_batches, key, "val",
        )
        self.logger.log(0, metrics)
        return metrics

    def test(self, model, data, params, stats) -> Dict[str, float]:
        self._sync_data_sharding(data)
        self.mesh_for_batch(data.batch_size)
        schedule = self._schedule_for(model, data, train=False)
        _, _, jit_eval = self._build_steps(model, schedule)
        key = jax.random.PRNGKey(self.seed)
        metrics = self._run_eval(
            model, jit_eval, params, stats,
            data.test_loader(), self.limit_test_batches, key, "test",
        )
        self.logger.log(0, metrics)
        return metrics

    def predict(
        self, model, data, params, stats, plotter, limit: Optional[int] = None
    ) -> None:
        """Streaming visualization (soda.py:191-200): run sample 0 of
        each batch frame-by-frame through the stateful predict API and
        hand frames to the plotter.

        :param limit: Number of batches to render; defaults to the
            ``limit_predict_batches`` trainer option. ``limit <= 0``
            renders every batch the loader yields (the reference's
            unbounded predict loop).
        """
        if limit is None:
            limit = self.limit_predict_batches
        plotter.labels = data.get_labels()
        jit_predict = jax.jit(
            lambda p, s, x, st: model.predict(p, s, x, st)
        )
        for batch_idx, (X, labels) in enumerate(
            itertools.islice(
                data.predict_loader(), limit if limit > 0 else None
            )
        ):
            frames = X[:, 0]  # [T, H, W, 2]
            state = model.init_state(1)
            video = []
            dets = None
            for t in range(frames.shape[0]):
                dets, state = jit_predict(
                    params, stats, jnp.asarray(frames[t][None]), state
                )
                shown = None if t < model.time_window else np.asarray(dets[0])
                video.append(plotter.apply(frames[t], shown, None))
            gt = np.asarray(labels[0])
            if gt.ndim == 2 and gt.shape[1] == 6:
                # MT labels are (frame_idx, class, x1..y2); slice off the
                # window-relative frame index so the plotter's (class,
                # x1..y2) contract holds. Deliberate divergence from the
                # reference, which passes 6-col labels into a 5-col
                # plotter API and silently draws wrong GT boxes
                # (reference models/soda.py:199 -> utils/plotter.py:104).
                gt = gt[:, 1:]
            video.append(
                plotter.apply(frames[-1], np.asarray(dets[0]), gt)
            )
            plotter(video, data.time_step, str(batch_idx))
