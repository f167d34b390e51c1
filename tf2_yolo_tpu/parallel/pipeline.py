"""Pipeline parallelism: MPMD microbatch streaming across devices.

The reference has no multi-device story at all (SURVEY.md §2.3: DP/TP/
PP all absent), and the blueprint declared PP out of scope at these
model sizes — this module is the beyond-plan counterpart of
``tensor_parallel_shardings``: for models whose *weights plus
activations* exceed one chip's HBM even at microbatch 1, stage-split
the network across chips and stream microbatches through it.

Unlike DP/TP (SPMD: one program, sharded arrays, GSPMD collectives),
pipeline stages are genuinely different programs, so this is MPMD at
the host level: each stage is its own jitted executable committed to
its own device, and inter-stage activations move with explicit
``jax.device_put`` (ICI transfers on a real slice). JAX's async
dispatch provides the pipelining for free — enqueueing microbatch m on
stage s returns immediately, so stage s computes microbatch m while
stage s+1 computes microbatch m-1 (the classic GPipe fill/steady/drain
schedule emerges from the per-device execution queues without an
explicit scheduler).

Backward is exact and COMPILED: the forward stores only each stage's
input per microbatch, and the backward recomputes the stage forward
inside one jitted program per (stage, microbatch) that emits the
parameter and input cotangents (GPipe-style rematerialization — the
standard PP memory/compute trade, and on TPU the difference between
one executable launch per stage and per-op eager dispatch through the
runtime). Gradients stream back through the stages in reverse device
order, accumulating per-stage parameter gradients over microbatches.
Loss scaling follows gradient-accumulation semantics (mean over
microbatches), so a pipeline step equals the same-batch single-device
step to float tolerance — asserted in tests/test_pipeline.py.

Training supports BOTH BatchNorm modes:

- frozen statistics (default, ``train_stages=None``): stages run the
  eval-mode forward; running stats are constants. The fine-tuning
  contract.
- train-mode BN (``train_stages=`` from ``split_detector(...,
  with_train=True)``): each stage applies with ``train=True,
  mutable=["batch_stats"]`` — normalization uses the microbatch's own
  batch statistics (differentiated exactly: the backward recompute
  also runs train-mode), and the running-average stats are EMA-updated
  in the stage trees after every microbatch, exactly like flax's
  single-device semantics. With ``microbatch == batch`` a PP train
  step equals the single-device train-mode step (loss, grads, AND
  updated stats — asserted in tests/test_pipeline.py); with smaller
  microbatches the batch statistics are per-microbatch (the standard
  GPipe BN semantics), equal to sequentially train-stepping each
  microbatch with gradient accumulation — also asserted.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


class PipelineExecutor:
    """Run ``stages`` (a list of ``fn(params, x) -> y`` callables, each
    with its own params pytree) as a device-pipelined chain.

    ``devices``: one device per stage (defaults to the first
    ``len(stages)`` of ``jax.devices()``). Stage params are committed
    to their device once at construction; microbatch activations are
    transferred stage-to-stage.

    ``meshes``: instead of one device per stage, one
    ``jax.sharding.Mesh`` per stage — PP x DP composition. Each stage
    then runs as an SPMD program over its own mesh: params replicated
    within the stage mesh, microbatch activations sharded over its
    ``"data"`` axis (GSPMD inserts the per-stage gradient psums), and
    stage-boundary transfers reshard between consecutive meshes. Each
    microbatch size must divide by every stage's data-axis size.

    Forward:  ``run(x, microbatch)`` -> final-stage outputs, rows
              aligned with ``x``.
    Training: ``value_and_grad(loss_fn)(x, microbatch)`` ->
              ``(mean_loss, [grads_per_stage])`` where ``loss_fn``
              maps the final stage's output (one microbatch) to a
              scalar; gradients are exact (vjp-chained) and averaged
              over microbatches.
    """

    def __init__(self, stages: Sequence[Callable], params: Sequence[Any],
                 devices: Optional[Sequence] = None,
                 meshes: Optional[Sequence] = None,
                 train_stages: Optional[Sequence[Callable]] = None):
        if len(stages) != len(params):
            raise ValueError(
                f"{len(stages)} stages but {len(params)} params trees")
        if train_stages is not None and len(train_stages) != len(stages):
            raise ValueError(
                f"{len(stages)} stages but {len(train_stages)} "
                f"train_stages")
        self.stages = list(stages)
        self.train_stages = (list(train_stages)
                             if train_stages is not None else None)
        if meshes is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if len(meshes) < len(stages):
                raise ValueError(
                    f"{len(stages)} stages need {len(stages)} meshes, "
                    f"got {len(meshes)}")
            self.meshes = list(meshes[:len(stages)])
            for m in self.meshes:
                if "data" not in m.axis_names:
                    raise ValueError(
                        f"stage mesh {m} has no 'data' axis")
            # activations batch-sharded over the stage's data axis;
            # params replicated within the stage mesh
            self._act_t = [NamedSharding(m, P("data"))
                           for m in self.meshes]
            self._par_t = [NamedSharding(m, P()) for m in self.meshes]
            # representative device per stage (logging only)
            self.devices = [m.devices.flat[0] for m in self.meshes]
        else:
            devices = list(devices or jax.devices()[:len(stages)])
            if len(devices) < len(stages):
                raise ValueError(
                    f"{len(stages)} stages need {len(stages)} devices, "
                    f"got {len(devices)}")
            self.meshes = None
            self.devices = devices[:len(stages)]
            self._act_t = self.devices
            self._par_t = self.devices
        self.params = [jax.device_put(p, t)
                       for p, t in zip(params, self._par_t)]
        # jitted per-stage forwards/backwards; placement follows the
        # committed params/activations, so each executes on its stage
        # device. The backward recomputes the stage forward in-program
        # (remat) and returns (trainable-param cotangent, input
        # cotangent) — one compiled launch per stage per microbatch.
        self._fwd = [jax.jit(s) for s in self.stages]
        self._bwd = [jax.jit(self._make_bwd(i))
                     for i in range(len(self.stages))]
        if self.train_stages is not None:
            self._fwd_t = [jax.jit(s) for s in self.train_stages]
            self._bwd_t = [jax.jit(self._make_bwd(i, train=True))
                           for i in range(len(self.stages))]
        self._acc = jax.jit(
            lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))

    def _make_bwd(self, s, train: bool = False):
        stage = (self.train_stages if train else self.stages)[s]
        partition = self._partition

        def bwd(params, x, dy):
            tp, rebuild = partition(params)
            if train:
                # train-mode stage returns (y, new_stats): recompute y
                # only — gradients flow through the BATCH statistics
                # (exact train-mode BN backward); the running-stat EMA
                # side output is not differentiated
                f = lambda t, a: stage(rebuild(t), a)[0]
            else:
                f = lambda t, a: stage(rebuild(t), a)
            _, vjp = jax.vjp(f, tp, x)
            return vjp(dy)
        return bwd

    # -- forward ------------------------------------------------------
    def run(self, x, microbatch: Optional[int] = None):
        """Pipelined eval forward; returns the last stage's outputs
        concatenated over microbatches (pytree-structured)."""
        mbs = self._split(x, microbatch)
        outs = []
        for mb in mbs:                      # async: fills the pipeline
            y = mb
            for s in range(len(self.stages)):
                y = self._put(y, self._act_t[s])
                y = self._fwd[s](self.params[s], y)
            outs.append(y)
        return jax.tree_util.tree_map(
            lambda *leaves: jnp.concatenate(leaves, axis=0), *outs)

    # -- training -----------------------------------------------------
    def value_and_grad(self, loss_fn: Callable,
                       train: Optional[bool] = None):
        """``loss_fn(final_stage_out, *aux) -> scalar`` per microbatch.
        Returns ``step(x, *aux, microbatch=) -> (loss, grads)`` with
        ``grads`` a list of per-stage gradient pytrees over the
        TRAINABLE part of each stage tree (the ``"params"`` collection
        for flax variable dicts; the whole tree otherwise), averaged
        over microbatches to match gradient-accumulation semantics.
        ``aux`` pytrees (e.g. labels) are split over microbatches like
        ``x`` and consumed on the last stage's device.

        ``train`` (default: whether ``train_stages`` were given):
        False runs the frozen-BN-statistics forward (``batch_stats``
        closed over as constants, never differentiated — the
        fine-tuning contract). True runs train-mode BN: stages
        normalize with the microbatch's own batch statistics
        (differentiated exactly) and the running-average stats are
        EMA-updated IN ``self.params`` after each microbatch, matching
        single-device flax semantics (see module docstring for the
        microbatch-size semantics)."""
        use_train = (self.train_stages is not None) if train is None \
            else train
        if use_train and self.train_stages is None:
            raise ValueError(
                "train=True requires train_stages (split with "
                "with_train=True)")
        fwd = self._fwd_t if use_train else self._fwd
        bwd = self._bwd_t if use_train else self._bwd

        def loss_fb(out, aux_mb, inv_n):
            l, vjp = jax.vjp(lambda o: loss_fn(o, *aux_mb), out)
            (dy,) = vjp(jnp.ones_like(l) * inv_n)
            return l, dy
        loss_fb = jax.jit(loss_fb)

        def step(x, *aux, microbatch: Optional[int] = None):
            mbs = self._split(x, microbatch)
            aux_mbs = [self._split(a, microbatch) for a in aux]
            n = len(mbs)
            last_t = self._act_t[-1]
            inv_n = jnp.float32(1.0 / n)

            # fill: stream every microbatch through the jitted stage
            # forwards (async dispatch overlaps the stages), storing
            # only each stage's INPUT; the loss value and its seeded
            # cotangent come from one jitted program on the last stage.
            # Train mode: each stage also emits its EMA-updated running
            # stats, folded into the live stage tree immediately (the
            # stats chain serializes across microbatches like flax's
            # sequential train steps; the normalized output does not
            # read the running stats, so stage overlap is unaffected)
            xs = [[None] * n for _ in self.stages]
            losses, dys = [None] * n, [None] * n
            for m, mb in enumerate(mbs):
                y = mb
                for s in range(len(self.stages)):
                    y = self._put(y, self._act_t[s])
                    xs[s][m] = y
                    if use_train:
                        y, new_stats = fwd[s](self.params[s], y)
                        self.params[s] = self._with_stats(
                            self.params[s], new_stats, self._par_t[s])
                    else:
                        y = fwd[s](self.params[s], y)
                am = tuple(self._put(a[m], last_t) for a in aux_mbs)
                losses[m], dys[m] = loss_fb(y, am, inv_n)

            # drain: stream cotangents backward, newest microbatch
            # first (reverse schedule); each stage backward is one
            # compiled recompute+vjp launch on its stage device, and
            # gradient accumulation is a jitted tree-add. (Train-mode
            # recompute is exact: the normalized output depends on the
            # microbatch's batch stats, not the running stats the
            # forward just updated.)
            grads = [None] * len(self.stages)
            for m in reversed(range(n)):
                dy = dys[m]
                for s in reversed(range(len(self.stages))):
                    dy = self._put(dy, self._act_t[s])
                    dp, dy = bwd[s](self.params[s], xs[s][m], dy)
                    xs[s][m] = None     # free the stored input early
                    grads[s] = dp if grads[s] is None else \
                        self._acc(grads[s], dp)
            loss = sum(jnp.asarray(l) for l in losses) / n
            return loss, grads

        return step

    def init_opt(self, tx):
        """Per-stage optimizer states over each stage's TRAINABLE part
        (matches the grads from :meth:`value_and_grad`)."""
        return [tx.init(self._partition(p)[0]) for p in self.params]

    def apply_grads(self, tx, opt_states, grads):
        """Per-stage optimizer update in place on each stage device
        (trainable part only; frozen collections pass through);
        returns new opt states."""
        import optax
        new_states = []
        for s, (os, g) in enumerate(zip(opt_states, grads)):
            tp, rebuild = self._partition(self.params[s])
            updates, os = tx.update(g, os, tp)
            self.params[s] = jax.device_put(
                rebuild(optax.apply_updates(tp, updates)),
                self._par_t[s])
            new_states.append(os)
        return new_states

    # -- persistence ---------------------------------------------------
    def save(self, path: str) -> None:
        """Serialize all stage variable trees to one msgpack file
        (flax serialization; the PP counterpart of
        ``Model.save_weights`` — the reference persists keras weight
        files only, SURVEY.md §5 checkpoint row)."""
        from flax import serialization
        tree = {str(i): jax.device_get(p)
                for i, p in enumerate(self.params)}
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(tree))

    def load(self, path: str) -> None:
        """Restore stage variable trees saved by :meth:`save`,
        re-committing each stage to its device/mesh."""
        from flax import serialization
        target = {str(i): jax.device_get(p)
                  for i, p in enumerate(self.params)}
        with open(path, "rb") as f:
            tree = serialization.from_bytes(target, f.read())
        self.params = [jax.device_put(tree[str(i)], t)
                       for i, t in enumerate(self._par_t)]

    def merged_variables(self):
        """Deep-merge the per-stage variable trees back into ONE
        monolithic tree — the inverse of :func:`split_detector` /
        :func:`split_yolov4`, so a pipeline-trained model flows into
        the ordinary single-program paths (``module.apply``, export,
        evaluation, checkpointing)."""
        def merge(a, b):
            out = dict(a)
            for k, v in b.items():
                if k in out and isinstance(v, dict) \
                        and isinstance(out[k], dict):
                    out[k] = merge(out[k], v)
                else:
                    out[k] = v
            return out

        merged = {}
        for p in self.params:
            merged = merge(merged, jax.device_get(p))
        return merged

    # -- helpers ------------------------------------------------------
    @staticmethod
    def _with_stats(params, new_stats, target):
        """Fold a train-mode stage's EMA-updated ``batch_stats`` back
        into its live variable tree (no-op for stat-less stages),
        keeping the stage's device/mesh placement."""
        if not new_stats:
            return params
        return {**params,
                "batch_stats": jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, target), new_stats)}

    @staticmethod
    def _put(tree, target):
        """Transfer a pytree to a device or sharding target."""
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, target), tree)

    @staticmethod
    def _partition(tree):
        """(trainable, rebuild): for a flax variable dict the
        trainable part is the ``"params"`` collection and everything
        else (batch_stats, quant scales, ...) is frozen; otherwise the
        whole tree is trainable."""
        if isinstance(tree, dict) and "params" in tree:
            frozen = {k: v for k, v in tree.items() if k != "params"}
            return tree["params"], \
                lambda tp, f=frozen: {**f, "params": tp}
        return tree, lambda tp: tp

    @staticmethod
    def _split(x, microbatch):
        leaves = jax.tree_util.tree_leaves(x)
        total = leaves[0].shape[0]
        mb = microbatch or total
        if total % mb:
            raise ValueError(f"batch {total} not divisible by "
                             f"microbatch {mb}")
        k = total // mb
        return [jax.tree_util.tree_map(
            lambda a, i=i: a[i * mb:(i + 1) * mb], x) for i in range(k)]


def _stage_fn(module, stage_name, train: bool = False):
    if not train:
        def fn(params, x, _s=stage_name):
            return module.apply(params, x, train=False,
                                pipeline_stage=_s)
        return fn

    def fn_t(params, x, _s=stage_name):
        y, mutated = module.apply(params, x, train=True,
                                  mutable=["batch_stats"],
                                  pipeline_stage=_s)
        return y, mutated.get("batch_stats", {})
    return fn_t


def split_detector(module, variables, with_train: bool = False):
    """Stage-split any detector flax module (YoloV1/V2/V3/V4,
    models/detectors.py) for 2-stage pipelining: stage 0 = backbone
    (-> its feature taps), stage 1 = neck + head(s). Every detector's
    ``__call__`` takes a ``pipeline_stage`` arg and scopes its backbone
    params under "backbone", so the cut is the same for all four
    families (and for the resnet/custom backbones, which reuse the
    scope name). Returns ``(stages, params)`` for
    :class:`PipelineExecutor`; with ``with_train=True`` returns
    ``(stages, params, train_stages)`` where ``train_stages`` run
    train-mode BN (``train=True, mutable=["batch_stats"]`` —
    normalize with batch statistics, emit EMA-updated running stats)
    for from-scratch pipelined training. The cut carries the backbone
    taps — the natural YOLO stage boundary (the backbone holds most of
    the parameters; e.g. reference yolov4/models/darknet.py:72-136
    builds the same two halves as one keras graph). The default
    ``stages`` use frozen BN statistics (eval semantics) — the
    deployment/fine-tuning contract; both training modes match the
    same-semantics single-device step exactly
    (tests/test_pipeline.py)."""
    def pick(tree, invert=False):
        return {k: v for k, v in tree.items()
                if (k == "backbone") != invert}

    if "backbone" not in variables.get("params", {}):
        raise ValueError("split_detector needs a 'backbone' param "
                         "scope in the variable tree")
    p0 = {c: pick(variables[c]) for c in variables if variables[c]}
    p1 = {c: pick(variables[c], invert=True)
          for c in variables if variables[c]}
    stages = [_stage_fn(module, "backbone"), _stage_fn(module, "neck")]
    if with_train:
        return stages, [p0, p1], [
            _stage_fn(module, "backbone", train=True),
            _stage_fn(module, "neck", train=True)]
    return stages, [p0, p1]


_EARLY_SCOPES = frozenset({"stem", "stage1", "stage2", "stage3"})


def split_yolov4(module, variables, n_stages: int = 2,
                 with_train: bool = False):
    """Stage-split a YoloV4 flax module for pipelining.

    ``n_stages=2``: CSPDarknet-53 backbone | SPP/FPN/PAN neck + heads
    (== :func:`split_detector`). ``n_stages=3`` additionally cuts the
    stock backbone after its c3 stage: stem+stages1-3 | stages4-5 |
    neck+heads (``backbone_early``/``backbone_late`` pipeline stages,
    models/detectors.py) — stage boundaries carry c3, then
    (c3, c4, c5). Returns ``(stages, params)`` for
    :class:`PipelineExecutor` (``(stages, params, train_stages)`` with
    ``with_train=True`` — train-mode-BN stage fns, see
    :func:`split_detector`); the default ``stages`` run the
    frozen-BN-statistics forward."""
    if n_stages == 2:
        return split_detector(module, variables, with_train=with_train)
    if n_stages != 3:
        raise ValueError(f"n_stages must be 2 or 3, got {n_stages}")
    if "backbone" not in variables.get("params", {}):
        raise ValueError("split_yolov4 needs a 'backbone' param scope")
    unknown = set(variables["params"]["backbone"]) - _EARLY_SCOPES \
        - {"stage4", "stage5"}
    if unknown:
        raise ValueError(
            "3-stage split requires the stock csp_darknet backbone "
            f"(unexpected backbone scopes: {sorted(unknown)})")

    def pick_bb(tree, early):
        bb = {k: v for k, v in tree.get("backbone", {}).items()
              if (k in _EARLY_SCOPES) == early}
        return {"backbone": bb} if bb else {}

    def pick_rest(tree):
        return {k: v for k, v in tree.items() if k != "backbone"}

    cols = [c for c in variables if variables[c]]
    p0 = {c: t for c in cols if (t := pick_bb(variables[c], True))}
    p1 = {c: t for c in cols if (t := pick_bb(variables[c], False))}
    p2 = {c: t for c in cols if (t := pick_rest(variables[c]))}
    names = ["backbone_early", "backbone_late", "neck"]
    stages = [_stage_fn(module, n) for n in names]
    if with_train:
        return stages, [p0, p1, p2], [
            _stage_fn(module, n, train=True) for n in names]
    return stages, [p0, p1, p2]
