"""Train/eval step factories: pure functions jit-compiled over a mesh.

The whole train step — forward (BN in batch mode), multi-level loss,
backward, optimizer update, metric computation — is one XLA program.
Under a ("data",) mesh with the batch sharded on ``data`` and state
replicated, XLA's SPMD partitioner inserts the gradient all-reduce and
makes BatchNorm statistics global-batch statistics automatically.
"""

from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32))


def _as_tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)


def _cast_input(x, input_rescale):
    """uint8 batches normalize ON DEVICE (x * rescale in f32): the
    host then ships 1 byte/pixel instead of 4 — feeding is usually
    transfer-bound, so this is a 4x input-bandwidth win (and
    bit-identical to host-side rescale, tests/test_uint8_feed.py).
    Float inputs pass through untouched (already preprocessed)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * jnp.float32(input_rescale)
    return x


def make_train_step(apply_fn: Callable,
                    tx: optax.GradientTransformation,
                    loss_fns: Sequence[Callable],
                    metric_fns: Optional[Sequence[Sequence[Callable]]]
                    = None,
                    metric_names: Optional[Sequence[Sequence[str]]]
                    = None,
                    input_rescale: float = 1 / 255):
    """Build ``train_step(state, x, y_tuple) -> (state, logs)``.

    loss_fns: one loss per model output (summed).
    metric_fns/metric_names: per-output lists of metric closures.
    input_rescale: on-device normalization factor for uint8 image
        batches (see ``_cast_input``).
    """
    loss_fns = list(loss_fns)

    def train_step(state: TrainState, x, ys):
        ys = _as_tuple(ys)
        x = _cast_input(x, input_rescale)

        def loss_fn(params):
            outs, mutated = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            outs_t = _as_tuple(outs)
            total = jnp.float32(0.0)
            for lf, y_i, o_i in zip(loss_fns, ys, outs_t):
                total = total + lf(y_i, o_i)
            return total, (outs_t, mutated["batch_stats"])

        (loss, (outs_t, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        logs = {"loss": loss}
        if metric_fns is not None:
            for i, (fns, names, y_i, o_i) in enumerate(
                    zip(metric_fns, metric_names, ys, outs_t)):
                for fn, name in zip(fns, names):
                    logs[name] = fn(y_i, o_i)

        return TrainState(new_params, new_bs, new_opt,
                          state.step + 1), logs

    return train_step


def make_eval_step(apply_fn: Callable,
                   loss_fns: Sequence[Callable],
                   metric_fns=None, metric_names=None,
                   input_rescale: float = 1 / 255):
    """Build ``eval_step(state, x, y_tuple) -> logs`` (eval-mode BN)."""
    loss_fns = list(loss_fns)

    def eval_step(state: TrainState, x, ys):
        ys = _as_tuple(ys)
        x = _cast_input(x, input_rescale)
        outs = apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        outs_t = _as_tuple(outs)
        total = jnp.float32(0.0)
        for lf, y_i, o_i in zip(loss_fns, ys, outs_t):
            total = total + lf(y_i, o_i)
        logs = {"loss": total}
        if metric_fns is not None:
            for fns, names, y_i, o_i in zip(
                    metric_fns, metric_names, ys, outs_t):
                for fn, name in zip(fns, names):
                    logs[name] = fn(y_i, o_i)
        return logs

    return eval_step


class LRScaleState(NamedTuple):
    """State of the mutable learning-rate multiplier appended to every
    optimizer by :func:`make_optimizer` (see :func:`set_lr_multiplier`).
    """
    mult: jnp.ndarray


def _lr_scale() -> optax.GradientTransformation:
    """Final-position transform scaling updates by a state-held
    multiplier (initially 1). Because the multiplier lives in the
    optimizer STATE, callbacks can change the effective learning rate
    mid-training (keras ReduceLROnPlateau semantics) without
    recompiling the train step or resetting Adam/RMSProp moments —
    the reference gets this for free from tf.keras's mutable
    ``optimizer.lr`` variable; this is the jit-compatible equivalent."""

    def init_fn(params):
        del params
        return LRScaleState(mult=jnp.ones((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map(
            lambda g: g * state.mult.astype(g.dtype), updates)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def _is_lr_scale(node):
    return isinstance(node, LRScaleState)


def get_lr_multiplier(opt_state):
    """Read the mutable learning-rate multiplier (1.0 if the optimizer
    was built without one, e.g. a user-supplied raw optax transform
    passed straight to the train step)."""
    for node in jax.tree_util.tree_leaves(
            opt_state, is_leaf=_is_lr_scale):
        if _is_lr_scale(node):
            return node.mult
    return jnp.ones((), jnp.float32)


def set_lr_multiplier(opt_state, value):
    """Return ``opt_state`` with the learning-rate multiplier replaced
    (same tree structure — safe to feed back into the compiled step)."""
    value = jnp.asarray(value, jnp.float32)

    def repl(node):
        if _is_lr_scale(node):
            return LRScaleState(mult=value)
        return node

    return jax.tree_util.tree_map(repl, opt_state, is_leaf=_is_lr_scale)


def make_optimizer(optimizer="adam", learning_rate=1e-4,
                   frozen: Optional[Callable] = None,
                   accumulate_steps: int = 1,
                   ema_decay: Optional[float] = None
                   ) -> optax.GradientTransformation:
    """Build an optax transform from a keras-style spec.

    Args:
        optimizer: "adam" | "sgd" | "rmsprop" | "adamw" or an optax
            GradientTransformation (returned unchanged).
        learning_rate: float or optax schedule.
        frozen: optional predicate (path_tuple, leaf) -> bool marking
            parameters to freeze (e.g. v4 anchors when
            ``anchors_trainable`` is False).
        accumulate_steps: >1 wraps in optax.MultiSteps (gradient
            accumulation for effective batches beyond HBM).
        ema_decay: if set, maintain an exponential moving average of
            updates (production-serving weight smoothing).
    """
    if isinstance(optimizer, optax.GradientTransformation):
        tx = optimizer
    elif optimizer == "adam":
        # eps follows tf.keras (1e-7), not optax's 1e-8 — the epsilon
        # the reference's compile("adam") actually trains with. The
        # conv inits likewise follow the reference per family
        # (models/layers.py docstring); the round-4 seed matrix that
        # credited "glorot ~2x" was confounded with this eps change
        # (corrected round-5 matrix in BASELINE.md).
        tx = optax.adam(learning_rate, eps=1e-7)
    elif optimizer == "adamw":
        tx = optax.adamw(learning_rate, eps=1e-7)
    elif optimizer == "sgd":
        tx = optax.sgd(learning_rate, momentum=0.9)
    elif optimizer == "rmsprop":
        tx = optax.rmsprop(learning_rate, eps=1e-7)
    else:
        raise ValueError(f"Unknown optimizer: {optimizer}")

    if ema_decay is not None:
        tx = optax.chain(tx, optax.ema(ema_decay))
    if frozen is not None:
        def label_fn(params):
            flat = jax.tree_util.tree_map_with_path(
                lambda path, leaf: "frozen" if frozen(path, leaf)
                else "train", params)
            return flat
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    # mutable LR multiplier, outermost so it scales what actually
    # reaches the parameters (MultiSteps emits zeros between applies —
    # scaling zeros is exact)
    return optax.chain(tx, _lr_scale())
