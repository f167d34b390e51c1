"""Keras-like Model engine over jit-compiled JAX train/eval steps.

The reference trains with ``model.compile(...)`` + ``model.fit(...)``
(README.md:241-288). This engine keeps that surface but executes
TPU-first: one XLA program per step (forward + loss + backward +
optimizer + metrics), batch sharded over a ``data`` mesh axis, model
state replicated, gradient all-reduce and global-batch BatchNorm
emitted by XLA's SPMD partitioner.

Weights save/load uses flax msgpack serialization (the reference's
keras .h5 role); full training-state checkpoints (params + optimizer
+ step) live in ``tf2_yolo_tpu.parallel.checkpoint``.
"""

import time
from typing import Any, Callable, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from .parallel.mesh import (make_mesh, batch_sharding, replicated,
                            best_data_axis)
from .parallel.train import (TrainState, create_train_state,
                             make_train_step, make_eval_step,
                             make_optimizer)


def _prefetch_iterator(it, depth):
    """Run ``it`` (which performs host->device batch placement) on a
    background thread with a bounded look-ahead of ``depth`` items, so
    the next batches' numpy conversion + device transfer overlap the
    in-flight train steps (the standard device-feed pipeline; the
    transfer itself is async under JAX, but the host-side slicing /
    casting / tunnel writes are not). Exceptions from the source
    iterator re-raise in the consumer; abandoning the generator stops
    the worker promptly (no deadlock on a full queue)."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()
    err = []

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not _put(item):
                    return
        except BaseException as e:     # propagate reader errors
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True,
                         name="tf2yolo-fit-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def _metric_name(fn, prefix=""):
    name = getattr(fn, "__name__", "metric")
    return f"{prefix}{name}"


def _resolve_mode(mode, monitor):
    """'min'/'max', or 'auto': maximize for accuracy-like monitors
    (acc/recall/iou/map/precision/f1 in the name), minimize otherwise —
    tf.keras's inference rule."""
    if mode in ("min", "max"):
        return mode
    if mode != "auto":
        raise ValueError(f"mode must be 'min'/'max'/'auto', got {mode!r}")
    name = monitor.lower()
    if any(t in name for t in ("acc", "recall", "iou", "map",
                               "precision", "f1", "auc")):
        return "max"
    return "min"


class EarlyStopping:
    """Stop training when a monitored quantity stops improving
    (tf.keras-style; pass via ``Model.fit(callbacks=[...])``).

    Args:
        monitor: history key to watch ("loss", "val_loss",
            "val_out1_recall", ...).
        patience: epochs without improvement before stopping.
        min_delta: minimum change counting as improvement.
        mode: "min", "max", or "auto" (inferred from the monitor name,
            e.g. recall/iou/acc monitors maximize).
    """

    def __init__(self, monitor="loss", patience=3, min_delta=0.0,
                 mode="auto"):
        self.monitor = monitor
        self.patience = patience
        self.min_delta = abs(min_delta)
        self.mode = _resolve_mode(mode, monitor)
        self.best = float("inf") if self.mode == "min" else float("-inf")
        self.wait = 0

    def _improved(self, value):
        if self.mode == "min":
            return value < self.best - self.min_delta
        return value > self.best + self.min_delta

    def on_epoch_end(self, epoch, logs, model):
        value = logs.get(self.monitor)
        if value is None:
            return
        if self._improved(value):
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                model.stop_training = True


class ModelCheckpoint:
    """Save weights each epoch, optionally only on improvement
    (tf.keras ModelCheckpoint's save_best_only semantics; weights go
    through ``Model.save_weights`` — flax msgpack).

    Args:
        path: weights file path (may contain ``{epoch}``).
        monitor: history key to watch.
        save_best_only: if True, save only when ``monitor`` improves.
        mode: "min", "max", or "auto" (see EarlyStopping).
    """

    def __init__(self, path, monitor="loss", save_best_only=True,
                 mode="auto"):
        self.path = str(path)
        self.monitor = monitor
        self.save_best_only = save_best_only
        self.mode = _resolve_mode(mode, monitor)
        self.best = float("inf") if self.mode == "min" else float("-inf")

    def on_epoch_end(self, epoch, logs, model):
        if self.save_best_only:
            value = logs.get(self.monitor)
            better = (value is not None
                      and (value < self.best if self.mode == "min"
                           else value > self.best))
            if not better:
                return
            self.best = value
        model.save_weights(self.path.format(epoch=epoch + 1))


class ReduceLROnPlateau:
    """Shrink the learning rate when a monitored quantity plateaus
    (tf.keras ReduceLROnPlateau semantics). Works by scaling the
    optimizer's mutable LR multiplier (``Model.lr_multiplier``) — no
    recompile, optimizer moments preserved.

    Args:
        monitor: history key to watch.
        factor: multiplier applied on plateau (< 1).
        patience: epochs without improvement before reducing.
        min_delta: minimum change counting as improvement.
        mode: "min", "max", or "auto" (see EarlyStopping).
        min_mult: floor for the cumulative multiplier.
        cooldown: epochs to wait after a reduction before counting
            non-improvements again.
    """

    def __init__(self, monitor="loss", factor=0.5, patience=3,
                 min_delta=0.0, mode="auto", min_mult=1e-4,
                 cooldown=0, verbose=0):
        if not 0.0 < factor < 1.0:
            raise ValueError(f"factor must be in (0, 1), got {factor}")
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.min_delta = abs(min_delta)
        self.mode = _resolve_mode(mode, monitor)
        self.min_mult = min_mult
        self.cooldown = cooldown
        self.verbose = verbose
        self.best = float("inf") if self.mode == "min" else float("-inf")
        self.wait = 0
        self.cooldown_left = 0

    def _improved(self, value):
        if self.mode == "min":
            return value < self.best - self.min_delta
        return value > self.best + self.min_delta

    def on_epoch_end(self, epoch, logs, model):
        value = logs.get(self.monitor)
        if value is None:
            return
        if self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.wait = 0
        if self._improved(value):
            self.best = value
            self.wait = 0
            return
        if self.cooldown_left > 0:
            return
        self.wait += 1
        if self.wait >= self.patience:
            old = model.lr_multiplier
            new = max(old * self.factor, self.min_mult)
            if new < old:
                model.lr_multiplier = new
                if self.verbose:
                    print(f"Epoch {epoch + 1}: ReduceLROnPlateau "
                          f"lr multiplier {old:.2e} -> {new:.2e}")
            self.wait = 0
            self.cooldown_left = self.cooldown


class TerminateOnNaN:
    """Stop training when the loss goes NaN/Inf (tf.keras
    TerminateOnNaN). By default checks the epoch-mean loss (free — the
    engine already syncs it); ``on_batch=True`` checks every train
    batch like keras does, at the cost of one host sync per step
    (breaks dispatch pipelining — only use while debugging)."""

    def __init__(self, on_batch=False):
        self.on_batch = on_batch

    def _fail(self, where, model):
        print(f"TerminateOnNaN: non-finite loss at {where}; "
              f"stopping training")
        model.stop_training = True

    def on_train_batch_end(self, batch, logs, model):
        if self.on_batch and not np.isfinite(float(logs["loss"])):
            self._fail(f"batch {batch}", model)

    def on_epoch_end(self, epoch, logs, model):
        value = logs.get("loss")
        if value is not None and not np.isfinite(value):
            self._fail(f"epoch {epoch + 1}", model)


class LearningRateScheduler:
    """Set the learning rate from a schedule function at each epoch
    start (tf.keras LearningRateScheduler). ``schedule`` is called as
    ``schedule(epoch, lr)`` (or ``schedule(epoch)`` if it takes one
    argument) and returns the new absolute learning rate; it is applied
    by rewriting ``Model.lr_multiplier`` relative to the learning rate
    passed to ``compile()`` — no recompile, moments preserved.

    Requires a float ``learning_rate`` at compile time (with an optax
    schedule there is no single base rate to scale)."""

    def __init__(self, schedule, verbose=0):
        self.schedule = schedule
        self.verbose = verbose

    def on_epoch_begin(self, epoch, model):
        base = getattr(model, "_base_lr", None)
        if base is None:
            raise ValueError(
                "LearningRateScheduler needs a float learning_rate at "
                "compile time (an optax schedule already varies the "
                "rate per step)")
        current = base * model.lr_multiplier
        try:
            new_lr = self.schedule(epoch, current)
        except TypeError:
            new_lr = self.schedule(epoch)
        new_lr = float(new_lr)
        if new_lr < 0:
            raise ValueError(f"schedule returned a negative learning "
                             f"rate {new_lr} at epoch {epoch}")
        model.lr_multiplier = new_lr / base
        if self.verbose:
            print(f"Epoch {epoch + 1}: LearningRateScheduler set "
                  f"learning rate to {new_lr:.4e}")


class CSVLogger:
    """Append per-epoch history rows to a CSV file (tf.keras
    CSVLogger). The header is written from the first epoch's log keys
    (epoch first, then sorted); opened per epoch so an interrupted run
    keeps every completed row.

    Args:
        path: CSV file path.
        separator: field separator.
        append: if False (default), truncate any existing file when
            training starts.
    """

    def __init__(self, path, separator=",", append=False):
        self.path = str(path)
        self.sep = separator
        self.append = append
        self._keys = None

    def on_epoch_end(self, epoch, logs, model):
        import os
        if self._keys is None:
            self._keys = sorted(logs)
            mode = "a" if (self.append and os.path.exists(self.path)) \
                else "w"
            with open(self.path, mode) as f:
                if mode == "w" or os.path.getsize(self.path) == 0:
                    f.write(self.sep.join(["epoch"] + self._keys) + "\n")
        with open(self.path, "a") as f:
            row = [str(epoch + 1)] + [
                repr(float(logs[k])) if k in logs else ""
                for k in self._keys]
            f.write(self.sep.join(row) + "\n")


class Model:
    """A trainable model: flax module + variables + compile/fit/predict.

    Args:
        module: a flax linen module whose ``__call__(x, train)`` returns
            one output array or a list (multi-level heads).
        input_shape: (H, W, C) — used for parameter init.
        seed: PRNG seed for init.
    """

    def __init__(self, module, input_shape, seed=0,
                 input_rescale=1 / 255):
        self.module = module
        self.input_shape = tuple(input_shape)
        # uint8 image batches normalize ON DEVICE with this factor
        # (x.astype(f32) * input_rescale) in fit/evaluate/predict —
        # the host ships 1 byte/pixel instead of 4, a 4x feed-
        # bandwidth win, bit-identical to host-side rescale. Float
        # inputs are assumed already preprocessed and pass through.
        self.input_rescale = float(input_rescale)
        x0 = jnp.zeros((1, *self.input_shape), jnp.float32)
        self.variables = module.init(jax.random.PRNGKey(seed), x0,
                                     train=False)
        out = jax.eval_shape(
            lambda v, x: module.apply(v, x, train=False),
            self.variables, x0)
        self.output_shapes = ([o.shape for o in out]
                              if isinstance(out, (list, tuple))
                              else out.shape)
        self.n_outputs = (len(out) if isinstance(out, (list, tuple))
                          else 1)

        self.default_frozen = None   # facade hook (e.g. v4 anchors)
        self._tx = None
        self._loss_fns = None
        self._metric_fns = None
        self._metric_names = None
        self._train_step = None
        self._eval_step = None
        self._state = None
        self._predict_jit = None
        self._mesh_cache = {}    # (data, model) axes -> (mesh, sharding)
        self._state_mesh = None      # mesh self._state is placed on
        self._n_model = 1            # tensor-parallel axis (compile())
        self.stop_training = False   # callbacks set True to end fit

    # ------------------------------------------------------------------
    @property
    def params(self):
        if self._state is not None:
            return self._state.params
        return self.variables["params"]

    @params.setter
    def params(self, new_params):
        self.variables = dict(self.variables, params=new_params)
        if self._state is not None:
            self._state = self._state._replace(params=new_params)
            self._state_mesh = None   # new params may live off-mesh
        self._predict_jit = None

    def set_variables(self, variables):
        """Replace the full variables tree (params + batch_stats),
        resetting optimizer state and cached jits."""
        self.variables = variables
        self._state = None
        self._predict_jit = None

    @property
    def lr_multiplier(self):
        """Mutable learning-rate multiplier (initially 1.0) applied on
        top of the compiled optimizer's learning rate. Setting it takes
        effect on the NEXT train step without recompiling and without
        resetting optimizer moments — the hook ReduceLROnPlateau uses.
        """
        from .parallel.train import get_lr_multiplier
        self._ensure_state()
        return float(get_lr_multiplier(self._state.opt_state))

    @lr_multiplier.setter
    def lr_multiplier(self, value):
        from .parallel.train import set_lr_multiplier
        self._ensure_state()
        self._state = self._state._replace(
            opt_state=set_lr_multiplier(self._state.opt_state, value))
        # the new scalar is host-built: re-place the state on its mesh
        # before the next step so jit sees consistent shardings
        self._state_mesh = None

    @property
    def batch_stats(self):
        if self._state is not None:
            return self._state.batch_stats
        return self.variables.get("batch_stats", {})

    def count_params(self):
        return sum(p.size for p in jax.tree_util.tree_leaves(
            self.variables["params"]))

    # ------------------------------------------------------------------
    def compile(self, optimizer="adam", loss=None, metrics=None,
                learning_rate=1e-4, frozen=None,
                accumulate_steps=1, ema_decay=None, xla_options=None,
                n_model=1, tp_min_channels=128,
                bn_stats_sg_scope=None):
        """Configure training.

        Args:
            optimizer: "adam"/"sgd"/"rmsprop"/"adamw" or optax transform.
            loss: loss closure or list of closures (one per output).
            metrics: metric closure list, or list-of-lists per output
                (the v3/v4 facade convention).
            learning_rate: float or optax schedule.
            frozen: predicate (path, leaf) -> bool for frozen params.
            accumulate_steps: gradient accumulation factor (>1 wraps
                the optimizer in optax.MultiSteps).
            ema_decay: optional EMA smoothing of parameter updates.
            xla_options: per-compile XLA compiler options dict (e.g.
                {"xla_tpu_scoped_vmem_limit_kib": "24576"} — measured
                +1.5% train throughput on v5e, BASELINE.md; compiles
                slower). These reach the TPU compiler where env
                XLA_FLAGS does not.
            n_model: tensor-parallel axis size (default 1 = pure data
                parallelism). >1 channel-shards the wide conv kernels
                over a ("data", "model") mesh
                (parallel.tensor_parallel_shardings); devices are
                split data x model. The computation is identical —
                GSPMD inserts the contraction all-reduces.
            tp_min_channels: smallest out-channel count that shards
                over the model axis (only used when n_model > 1).
            bn_stats_sg_scope: opt-in frozen-statistics BatchNorm
                BACKWARD (models/layers.py
                ``set_bn_stats_stop_gradient``, scoped to this
                model's train step only). ``"backbone"`` applies it
                to ConvBN modules whose flax path contains that name
                (a tuple of names also works); ``True`` applies it
                everywhere; ``None`` (default) keeps exact BN
                gradients. The forward/loss/running stats are
                IDENTICAL — only the backward drops the
                batch-statistics term, removing the per-layer
                activation re-read reductions (measured +9.7% YOLOv4
                train throughput with ``"backbone"``, 449->493 img/s
                @416/b128 on v5e). Convergence is config-dependent:
                the measured matrix (BASELINE.md "frozen-stats BN
                backward") shows v4+"backbone" converging identically
                at matched budget, v2/v3 slightly SLOWER to a target,
                v1 and unscoped FAILING — treat it as a
                per-family-validated knob, not a free win.
        """
        if loss is None:
            raise ValueError("compile() requires a loss")
        if frozen is None:
            frozen = self.default_frozen
        loss_fns = list(loss) if isinstance(loss, (list, tuple)) \
            else [loss] * self.n_outputs
        if len(loss_fns) != self.n_outputs:
            raise ValueError(
                f"Got {len(loss_fns)} losses for {self.n_outputs} outputs")

        metric_fns = None
        metric_names = None
        if metrics is not None:
            if len(metrics) > 0 and isinstance(metrics[0], (list, tuple)):
                metric_fns = [list(m) for m in metrics]
            else:
                metric_fns = [list(metrics)] * self.n_outputs
            if len(metric_fns) != self.n_outputs:
                raise ValueError(
                    f"Got {len(metric_fns)} metric lists for "
                    f"{self.n_outputs} outputs")
            metric_names = []
            for i, fns in enumerate(metric_fns):
                prefix = f"out{i + 1}_" if self.n_outputs > 1 else ""
                metric_names.append(
                    [_metric_name(f, prefix) for f in fns])

        n_model = int(n_model)
        if n_model < 1 or len(jax.devices()) % n_model:
            raise ValueError(
                f"n_model={n_model} must divide the device count "
                f"({len(jax.devices())})")
        self._n_model = n_model
        self._tp_min_channels = int(tp_min_channels)

        self._tx = make_optimizer(optimizer, learning_rate, frozen,
                                  accumulate_steps=accumulate_steps,
                                  ema_decay=ema_decay)
        # base rate for callbacks that set an ABSOLUTE lr
        # (LearningRateScheduler); None when a schedule drives it
        self._base_lr = (float(learning_rate)
                         if isinstance(learning_rate, (int, float))
                         else None)
        self._loss_fns = loss_fns
        self._metric_fns = metric_fns
        self._metric_names = metric_names

        step = make_train_step(self.module.apply, self._tx, loss_fns,
                               metric_fns, metric_names,
                               input_rescale=self.input_rescale)
        # Falsy (None/False/""/()) means "disabled" — such values must
        # not reach set_bn_stats_stop_gradient, where tuple(False)
        # raises; anything else must be True / a name / names.
        if bn_stats_sg_scope:
            if not (bn_stats_sg_scope is True
                    or isinstance(bn_stats_sg_scope, str)
                    or (isinstance(bn_stats_sg_scope, (list, tuple))
                        and bn_stats_sg_scope
                        and all(isinstance(s, str)
                                for s in bn_stats_sg_scope))):
                raise ValueError(
                    "bn_stats_sg_scope must be None/False (off), True "
                    "(everywhere), or a module-name str / sequence of "
                    f"strs; got {bn_stats_sg_scope!r}")
            from .models.layers import bn_stats_sg_ctx
            scope = (None if bn_stats_sg_scope is True
                     else bn_stats_sg_scope)
            base_step = step

            def step(state, x, ys, _step=base_step, _scope=scope):
                # the knob is read at trace time; wrapping the step
                # body scopes it to exactly this program (no leaked
                # process-global state)
                with bn_stats_sg_ctx(True, _scope):
                    return _step(state, x, ys)
        self._bn_stats_sg_scope = bn_stats_sg_scope
        self._train_step = jax.jit(step, donate_argnums=0,
                                   compiler_options=xla_options)
        self._eval_step = jax.jit(
            make_eval_step(self.module.apply, loss_fns, metric_fns,
                           metric_names,
                           input_rescale=self.input_rescale),
            compiler_options=xla_options)
        self._state = None        # reset optimizer state

    # ------------------------------------------------------------------
    def _ensure_state(self):
        if self._state is None:
            if self._tx is None:
                raise ValueError("Call compile() before fit()")
            self._state = create_train_state(self.variables, self._tx)
            self._state_mesh = None

    def _shard_for(self, n_rows):
        """Mesh + batch sharding for a batch of ``n_rows``, moving
        ``self._state`` onto that mesh when it changes. ONE tracker is
        shared by fit and evaluate — a validation remainder batch that
        switches meshes must be seen by the next train step too, or
        jit receives state and batch on different device sets.

        Multi-process runs (``parallel.distributed_initialize``; one
        process per host on a real slice): ``n_rows`` is the rows THIS
        process loaded, the mesh always spans the full global device
        set (a sub-mesh would leave some process's rows unbound), and
        the global batch ``n_rows * process_count`` must divide the
        data axis."""
        n_model = getattr(self, "_n_model", 1)
        if jax.process_count() > 1:
            d = len(jax.devices()) // n_model
            if (n_rows * jax.process_count()) % d:
                raise ValueError(
                    f"global batch {n_rows * jax.process_count()} "
                    f"({n_rows} rows x {jax.process_count()} processes)"
                    f" must divide the data axis {d}; make every "
                    f"process's shard length a multiple of "
                    f"{d // jax.process_count()} x batch_size")
        else:
            d = best_data_axis(n_rows,
                               max_devices=len(jax.devices()) // n_model)
        key = (d, n_model)
        if key not in self._mesh_cache:
            mesh = make_mesh(n_data=d, n_model=n_model)
            self._mesh_cache[key] = (mesh, batch_sharding(mesh))
        mesh, shard = self._mesh_cache[key]
        if self._state_mesh is not mesh:
            if n_model > 1:
                from .parallel.mesh import tensor_parallel_shardings
                self._state = jax.device_put(
                    self._state,
                    tensor_parallel_shardings(
                        self._state, mesh,
                        min_channels=getattr(self, "_tp_min_channels",
                                             128)))
            else:
                self._state = jax.device_put(self._state,
                                             replicated(mesh))
            self._state_mesh = mesh
        return shard

    @staticmethod
    def _as_feed(arr):
        """Image batch -> device array, preserving uint8 (normalized
        on device by the compiled step, see ``input_rescale``)."""
        arr = np.asarray(arr)
        if arr.dtype == np.uint8:
            return jnp.asarray(arr)
        return jnp.asarray(arr, jnp.float32)

    def _check_uint8_seq(self, seq):
        """Refuse a uint8 sequence whose declared rescale disagrees
        with this model's on-device ``input_rescale`` — uint8 batches
        skip the host-side rescale, so a mismatch silently trains/
        evaluates on mis-normalized inputs."""
        if not getattr(seq, "uint8", False):
            return
        seq_rescale = getattr(seq, "rescale", None)
        if seq_rescale is not None and not np.isclose(
                float(seq_rescale), self.input_rescale):
            raise ValueError(
                f"uint8 sequence declares rescale={seq_rescale} "
                f"but this Model normalizes on device with "
                f"input_rescale={self.input_rescale}; pass "
                "create_model(input_rescale=...) / "
                "Model(input_rescale=...) to match (uint8 batches "
                "skip the host-side rescale).")

    @staticmethod
    def _place(arr, shard):
        """Put one batch array on the mesh. Single process: a plain
        sharded device_put. Multi-process: ``arr`` holds only THIS
        process's rows of the global batch (loader-sharded by
        ``jax.process_index()``, see parallel/input.py) and is bound
        into the global array without any cross-host data movement."""
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                shard, np.asarray(arr))
        return jax.device_put(arr, shard)

    def _sync_variables(self):
        """Pull trained params/batch_stats back into self.variables."""
        if self._state is not None:
            self.variables = {
                "params": self._state.params,
                "batch_stats": self._state.batch_stats,
            }

    @staticmethod
    def _batches(x, y, batch_size, shuffle, rng):
        n = x.shape[0]
        idx = np.arange(n)
        if shuffle:
            rng.shuffle(idx)
        for lo in range(0, n, batch_size):
            sel = idx[lo:lo + batch_size]
            yb = ([yi[sel] for yi in y] if isinstance(y, (list, tuple))
                  else y[sel])
            yield x[sel], yb

    def fit(self, x, y=None, epochs=1, batch_size=20, shuffle=True,
            seed=None, verbose=1, validation_data=None,
            profile_dir=None, checkpoint_dir=None,
            checkpoint_every=None, checkpoint_async=False,
            checkpoint_keep=3, resume=False,
            checkpoint_on_interrupt=False, callbacks=None,
            prefetch=0):
        """Train. ``x`` is an ndarray (with ``y`` labels, list for
        multi-output models) or a sequence yielding (img, labels).

        Args:
            profile_dir: if set, capture a jax.profiler trace of the
                first epoch into this directory (view in TensorBoard /
                Perfetto) — the SURVEY §5 tracing hook.
            checkpoint_dir/checkpoint_every: save full training state
                (params + optimizer + step) every N epochs via Orbax.
            checkpoint_async: if True, periodic checkpoints snapshot
                the state to host synchronously but write in Orbax's
                background thread, overlapping checkpoint IO with the
                next epochs (SURVEY §5 async-checkpoint plan); fit()
                fences all in-flight writes before returning. The
                interrupt checkpoint always blocks (the process is
                about to exit). Multi-process runs ignore this and
                save synchronously (collective barriers).
            checkpoint_keep: retain only the newest N step_* dirs
                under ``checkpoint_dir`` (default 3).
            resume: if True, restore the latest checkpoint under
                ``checkpoint_dir`` (params + optimizer + step) before
                training and skip the epochs it already covers —
                ``epochs`` is the TOTAL target, so re-running the same
                fit() after a preemption continues where it left off
                (and reproduces the uninterrupted run exactly when
                ``seed`` is set: the shuffle RNG is fast-forwarded past
                the skipped epochs). No checkpoint yet means a fresh
                start, so ``resume=True`` is safe to always pass. The
                reference has no resume semantics at all (SURVEY §5
                checkpoint row); this is the elastic-recovery hook.
                Resume is BATCH-granular: a checkpoint taken mid-epoch
                (see ``checkpoint_on_interrupt``) fast-forwards the
                shuffle RNG to that epoch and skips the already-trained
                batches, so the optimizer trajectory continues exactly
                where it stopped.
            checkpoint_on_interrupt: if True (requires
                ``checkpoint_dir``), install SIGTERM/SIGINT handlers
                for the duration of fit(); on delivery the current
                train step finishes, the full state is checkpointed,
                and fit() returns cleanly — the TPU-preemption survival
                hook (cloud TPUs deliver SIGTERM ahead of eviction).
                Pair with ``resume=True`` on restart. Multi-process
                runs: the interrupt save is a COLLECTIVE Orbax save,
                so EVERY process must receive the signal (true for
                cloud preemption, which signals all hosts); manually
                signalling a single worker would leave it waiting at
                the distributed barrier until the client times out.
            callbacks: keras-style callback objects; recognized hooks
                are ``on_epoch_begin(epoch, model)``,
                ``on_epoch_end(epoch, logs, model)`` and
                ``on_train_batch_end(batch, logs, model)`` (all
                optional). Batch-end ``logs`` values are device
                scalars — converting them to float forces a host sync
                per step, so only do that when you need it. Setting
                ``model.stop_training = True`` from a callback ends
                training after the current epoch (early stopping, as
                in tf.keras).
            validation_data: an ``(x, y)`` ndarray pair or a sequence
                yielding ``(img, labels)`` batches (e.g. from
                ``read_file_to_sequence``); evaluated each epoch into
                ``val_*`` history keys.
            prefetch: look-ahead depth (batches) for the device feed.
                0 (default) converts/transfers each batch inline;
                N > 0 runs the host->device placement of the next N
                batches on a background thread so it overlaps the
                in-flight train steps. Useful when feeding is
                comparable to the step time (see tools/bench_fit.py
                and the BASELINE.md fit-throughput rows).

        Multi-process runs (``parallel.distributed_initialize``, one
        process per host): every process calls fit() with its OWN
        disjoint shard of the dataset (``parallel.process_batch_slice``
        or ``YoloDataSequence.shard(...)``) and the
        per-process ``batch_size``; batches are bound into global
        arrays over the full device mesh, so the optimizer sees the
        global batch (= batch_size x process_count) exactly as a
        single-process run over the concatenated data would
        (tests/test_multihost.py asserts this equality with a real
        2-process run). All processes must pass equally many rows.
        Checkpointing/resume works multi-process too: every process
        calls fit() with the same ``checkpoint_dir`` (on a filesystem
        all hosts see), process 0 writes, all rendezvous on a device
        barrier (parallel/checkpoint.py; resume equality asserted by
        the same 2-process test).
        """
        self._ensure_state()
        self.stop_training = False
        callbacks = list(callbacks or [])
        rng = np.random.RandomState(seed)
        # meshes are derived from the ACTUAL batch shape (a sequence's
        # batch size may differ from the batch_size argument), cached
        # per data-axis size in self._mesh_cache via _shard_for

        is_sequence = (hasattr(x, "__getitem__") and y is None
                       and not isinstance(x, np.ndarray))
        if is_sequence:
            self._check_uint8_seq(x)
        initial_epoch = 0
        skip_batches = 0
        if resume:
            if checkpoint_dir is None:
                raise ValueError("resume=True requires checkpoint_dir")
            from .parallel.checkpoint import (latest_checkpoint,
                                              restore_checkpoint)
            latest = latest_checkpoint(checkpoint_dir)
            if latest is not None:
                self._state = restore_checkpoint(latest, self._state)
                self._state_mesh = None
                if is_sequence:
                    steps_per_epoch = len(x)
                else:
                    n_rows = np.asarray(x).shape[0]
                    steps_per_epoch = -(-n_rows // batch_size)
                initial_epoch = min(
                    int(self._state.step) // steps_per_epoch, epochs)
                # mid-epoch checkpoint (checkpoint_on_interrupt):
                # replay the epoch's batch order but skip the batches
                # the optimizer already saw
                if initial_epoch < epochs:
                    skip_batches = int(self._state.step) % steps_per_epoch
                if shuffle and not is_sequence:
                    # consume the RNG stream of the skipped epochs so
                    # the resumed batch order matches the uninterrupted
                    # run (shuffle draws depend only on n_rows)
                    idx_ff = np.arange(n_rows)
                    for _ in range(initial_epoch):
                        rng.shuffle(idx_ff)
                if verbose and initial_epoch >= epochs:
                    print(f"Resuming from {latest}: already trained to "
                          f"the {epochs}-epoch target, nothing to do")
                elif verbose:
                    print(f"Resuming from {latest} "
                          f"(step {int(self._state.step)}, "
                          f"epoch {initial_epoch + 1}/{epochs})")

        self._interrupted = False
        _sig_prev = []
        if checkpoint_on_interrupt:
            if checkpoint_dir is None:
                raise ValueError(
                    "checkpoint_on_interrupt=True requires checkpoint_dir")
            import signal as _signal

            def _on_signal(signum, frame):
                self._interrupted = True

            for _sig in (_signal.SIGTERM, _signal.SIGINT):
                try:
                    _sig_prev.append(
                        (_signal, _sig, _signal.signal(_sig, _on_signal)))
                except ValueError:  # fit() called off the main thread
                    break

        history = {"loss": []}
        profiling = False
        if profile_dir is not None:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                for cb in callbacks:
                    if hasattr(cb, "on_epoch_begin"):
                        cb.on_epoch_begin(epoch, self)
                logs_acc = []   # device scalars; host sync at epoch end
                if hasattr(x, "__getitem__") and y is None \
                        and not isinstance(x, np.ndarray):
                    iterator = (x.as_iterator()
                                if hasattr(x, "as_iterator")
                                else (x[i] for i in range(len(x))))
                else:
                    iterator = self._batches(np.asarray(x), y,
                                             batch_size, shuffle, rng)

                def _placed(pairs):
                    for xb, yb in pairs:
                        xb = self._as_feed(xb)
                        yb_t = tuple(jnp.asarray(v, jnp.float32)
                                     for v in yb) \
                            if isinstance(yb, (list, tuple)) \
                            else (jnp.asarray(yb, jnp.float32),)
                        shard = self._shard_for(xb.shape[0])
                        yield (self._place(xb, shard),
                               tuple(self._place(v, shard)
                                     for v in yb_t))

                # mid-epoch resume: replay the epoch's batch order but
                # skip (without transferring) the already-trained steps
                skip_now, skip_batches = skip_batches, 0
                if skip_now:
                    import itertools
                    iterator = itertools.islice(iterator, skip_now,
                                                None)
                placed = _placed(iterator)
                if prefetch:
                    # look-ahead device feed: host conversion +
                    # transfer of the next `prefetch` batches overlap
                    # the running steps
                    placed = _prefetch_iterator(placed, int(prefetch))
                for batch_i, (xb, yb_t) in enumerate(placed,
                                                     start=skip_now):
                    self._state, logs = self._train_step(
                        self._state, xb, yb_t)
                    logs_acc.append(logs)
                    for cb in callbacks:
                        if hasattr(cb, "on_train_batch_end"):
                            cb.on_train_batch_end(batch_i, logs, self)
                    if self._interrupted or self.stop_training:
                        break

                if self._interrupted:
                    from .parallel.checkpoint import save_checkpoint
                    ckpt = save_checkpoint(checkpoint_dir, self._state,
                                           keep=checkpoint_keep)
                    if verbose:
                        print(f"Interrupted at step "
                              f"{int(self._state.step)} — state saved "
                              f"to {ckpt}; re-run with resume=True to "
                              f"continue")
                    break

                steps = len(logs_acc)
                logs_sum = {}
                for logs in logs_acc:   # epoch-end host sync
                    for k, v in logs.items():
                        logs_sum[k] = logs_sum.get(k, 0.0) + float(v)
                means = {k: v / max(steps, 1)
                         for k, v in logs_sum.items()}
                if validation_data is not None:
                    if isinstance(validation_data, (tuple, list)):
                        val_logs = self.evaluate(*validation_data,
                                                 batch_size=batch_size,
                                                 verbose=0)
                    else:               # a sequence of (img, labels)
                        val_logs = self.evaluate(validation_data,
                                                 batch_size=batch_size,
                                                 verbose=0)
                    means.update({f"val_{k}": v
                                  for k, v in val_logs.items()})
                for k, v in means.items():
                    history.setdefault(k, []).append(v)
                history.setdefault("epoch_time", []).append(
                    time.time() - t0)
                if verbose:
                    stats = " - ".join(f"{k}: {v:.4f}"
                                       for k, v in means.items())
                    print(f"Epoch {epoch + 1}/{epochs} - "
                          f"{time.time() - t0:.1f}s - {stats}")
                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                if (checkpoint_dir is not None and checkpoint_every
                        and (epoch + 1) % checkpoint_every == 0):
                    from .parallel.checkpoint import save_checkpoint
                    save_checkpoint(checkpoint_dir, self._state,
                                    keep=checkpoint_keep,
                                    block=not checkpoint_async)
                for cb in callbacks:
                    if hasattr(cb, "on_epoch_end"):
                        cb.on_epoch_end(epoch, dict(means), self)
                if self.stop_training:
                    break
        finally:
            for _mod, _sig, _h in _sig_prev:
                _mod.signal(_sig, _h)
            if checkpoint_async:
                from .parallel.checkpoint import wait_for_saves
                wait_for_saves()

        if profiling:
            jax.profiler.stop_trace()
        self._sync_variables()
        return history

    # ------------------------------------------------------------------
    def evaluate(self, x, y=None, batch_size=20, verbose=1):
        """Eval-mode loss/metrics, batch sharded over the data mesh
        exactly like fit() (state replicated, inputs split on the
        'data' axis) so eval-side numerics match multi-chip training.
        ``x`` is an ndarray with ``y`` labels, or a sequence yielding
        (img, labels) batches with ``y=None``."""
        self._ensure_state()
        if hasattr(x, "__getitem__") and y is None \
                and not isinstance(x, np.ndarray):
            self._check_uint8_seq(x)
            iterator = (x.as_iterator() if hasattr(x, "as_iterator")
                        else (x[i] for i in range(len(x))))
        else:
            x = np.asarray(x)
            iterator = self._batches(x, y, batch_size, False,
                                     np.random.RandomState(0))
        logs_sum, steps = {}, 0
        for xb, yb in iterator:
            xb = self._as_feed(xb)
            yb_t = tuple(jnp.asarray(v, jnp.float32) for v in yb) \
                if isinstance(yb, (list, tuple)) \
                else (jnp.asarray(yb, jnp.float32),)
            shard = self._shard_for(xb.shape[0])
            xb = self._place(xb, shard)
            yb_t = tuple(self._place(v, shard) for v in yb_t)
            logs = self._eval_step(self._state, xb, yb_t)
            steps += 1
            for k, v in logs.items():
                logs_sum[k] = logs_sum.get(k, 0.0) + float(v)
        means = {k: v / max(steps, 1) for k, v in logs_sum.items()}
        if verbose:
            print(" - ".join(f"{k}: {v:.4f}" for k, v in means.items()))
        return means

    # ------------------------------------------------------------------
    def predict(self, x, batch_size=32, verbose=0):
        """Eval-mode forward, batch sharded over the data mesh;
        returns ndarray or list of ndarrays (multi-output), rows
        aligned with ``x``."""
        if self._predict_jit is None:
            from .parallel.train import _cast_input

            def _fwd(v, xb, _rs=self.input_rescale):
                return self.module.apply(v, _cast_input(xb, _rs),
                                         train=False)
            self._predict_jit = jax.jit(_fwd)
        variables = {"params": self.params,
                     "batch_stats": self.batch_stats}

        x = np.asarray(x)
        if x.dtype != np.uint8:
            x = x.astype(np.float32, copy=False)
        n = x.shape[0]
        if n == 0:
            shapes = (self.output_shapes
                      if isinstance(self.output_shapes, list)
                      else [self.output_shapes])
            empty = [np.zeros((0, *s[1:]), np.float32) for s in shapes]
            return empty if self.n_outputs > 1 else empty[0]
        # every batch is mesh-sharded — no single-device fallback. For
        # multi-batch runs the tail pads to batch_size so ONE compiled
        # program serves every step (a tail-shaped recompile costs
        # minutes on TPU); a single short batch pads to the next
        # multiple of the data axis instead, so e.g. 20 images on an
        # 8-chip slice run as 3 rows/chip rather than 4 on 5 chips.
        # Multi-process: prediction is embarrassingly parallel, so
        # each process runs its OWN rows on a mesh of its LOCAL
        # devices (no collectives, rows stay host-local) — pass this
        # process's shard of the inputs, get its rows back.
        local = (jax.local_devices() if jax.process_count() > 1
                 else jax.devices())
        if n >= batch_size:
            d = best_data_axis(batch_size, max_devices=len(local))
        else:
            d = min(len(local), n)
        mesh = make_mesh(d, devices=local)
        shard = batch_sharding(mesh)
        # variables may live on a different mesh (e.g. fit() used a
        # smaller data axis, or a multi-process global mesh) —
        # re-replicate them on this mesh (via host for a device-set
        # change: replicated global arrays fetch locally)
        if jax.process_count() > 1:
            variables = jax.tree_util.tree_map(np.asarray, variables)
        variables = jax.device_put(variables, replicated(mesh))
        outs_acc = None
        for lo in range(0, n, batch_size):
            xb = x[lo:lo + batch_size]
            rows = xb.shape[0]
            target = (batch_size if n > batch_size
                      else -(-rows // d) * d)
            if rows < target:
                xb = np.concatenate(
                    [xb, np.zeros((target - rows, *xb.shape[1:]),
                                  xb.dtype)])
            xb = jax.device_put(jnp.asarray(xb), shard)
            out = self._predict_jit(variables, xb)
            outs = list(out) if isinstance(out, (list, tuple)) else [out]
            outs = [np.asarray(o)[:rows] for o in outs]
            if outs_acc is None:
                outs_acc = [[o] for o in outs]
            else:
                for acc, o in zip(outs_acc, outs):
                    acc.append(o)
        result = [np.concatenate(acc, axis=0) for acc in outs_acc]
        return result if self.n_outputs > 1 else result[0]

    # ------------------------------------------------------------------
    def save_weights(self, path):
        """Serialize params + batch_stats (flax msgpack)."""
        from flax import serialization
        self._sync_variables()
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.variables))

    def load_weights(self, path):
        from flax import serialization
        with open(path, "rb") as f:
            data = f.read()
        self.variables = serialization.from_bytes(self.variables, data)
        self._state = None
        self._predict_jit = None

    def summary(self):
        shapes = self.output_shapes
        print(f"Model: {type(self.module).__name__}")
        print(f"  input:  (N, {', '.join(map(str, self.input_shape))})")
        print(f"  output: {shapes}")
        print(f"  params: {self.count_params():,}")
