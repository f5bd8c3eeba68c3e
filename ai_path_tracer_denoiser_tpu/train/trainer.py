"""Training loop: Adam + StepLR, BPTT over 7-frame sequences.

TPU re-design of train.py:30-112.  The reference's per-sequence python loop
with module-attribute hidden state becomes one jitted ``train_step`` whose
inner ``lax.scan`` runs the sequence and whose single backward pass is the
BPTT through all 7 frames (loss.backward(), train.py:99).  Data-parallel
training shards the sequence batch over the ``data`` mesh axis (parallel/dp).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelOptions, TrainOptions
from ..models.autoencoder import apply_sequence, init_autoencoder
from .loss import sequence_loss
from .schedule import step_lr


@dataclasses.dataclass
class TrainState:
    params: dict
    bn_state: dict
    opt_state: optax.OptState
    step: jnp.ndarray          # () int32
    lr: jnp.ndarray            # () f32 — set per epoch by the driver


jax.tree_util.register_dataclass(
    TrainState, ["params", "bn_state", "opt_state", "step", "lr"], [])


def _optimizer():
    # Adam lr=1e-3 (train.py:41); lr is injected per-step for StepLR.
    return optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)


def init_train_state(key, model_options: ModelOptions = ModelOptions(),
                     train_options: TrainOptions = TrainOptions()) -> TrainState:
    params, bn_state = init_autoencoder(key, model_options)
    opt_state = _optimizer().init(params)
    return TrainState(params=params, bn_state=bn_state, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32),
                      lr=jnp.asarray(train_options.lr, jnp.float32))


def loss_fn(params, bn_state, inputs, targets,
            train_options: TrainOptions = TrainOptions(),
            bf16: bool = False, axis_name: Optional[str] = None,
            model_options: Optional[ModelOptions] = None):
    """BPTT loss over one batch of sequences.

    inputs: (T, N, H, W, 10) time-major; targets: (T, N, H, W, 3).
    Returns (total, (metrics, new_bn_state)).
    """
    outputs, _, new_bn = apply_sequence(params, bn_state, inputs,
                                        train=True, bf16=bf16,
                                        axis_name=axis_name,
                                        remat=train_options.remat_frames,
                                        options=model_options)
    total, metrics = sequence_loss(
        outputs, targets, train_options.w_spatial, train_options.w_gradient,
        train_options.w_temporal, train_options.frame_ramp[:inputs.shape[0]],
        axis_name=axis_name)
    return total, (metrics, new_bn)


def train_step(state: TrainState, inputs: jnp.ndarray, targets: jnp.ndarray,
               train_options: TrainOptions = TrainOptions(),
               axis_name: Optional[str] = None,
               model_options: Optional[ModelOptions] = None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step (forward 7 frames -> single backward -> Adam)."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (total, (metrics, new_bn)), grads = grad_fn(
        state.params, state.bn_state, inputs, targets, train_options,
        train_options.bf16_compute, axis_name, model_options)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
    opt = _optimizer()
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = state.lr
    updates, opt_state = opt.update(grads, opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, bn_state=new_bn, opt_state=opt_state,
                      step=state.step + 1, lr=state.lr), metrics


def _device_prefetch(batches: Iterable, bf16_inputs: bool = False,
                     depth: int = 2):
    """Stage batches on device ahead of compute.

    ``jax.device_put`` returns before the copy completes, so enqueueing the
    next batch's host->device transfer while the current step runs hides
    the transfer behind compute — on tunneled TPU hosts (~250-400 MB/s H2D)
    the raw transfer of a batch-8 7-frame window (~190 MB at f32) otherwise
    dominates the ~0.3 s device step.  ``bf16_inputs`` additionally ships
    the G-buffer inputs as bfloat16 (half the bytes): with bf16 conv
    compute the first consumer casts to bf16 anyway, so the rounding point
    just moves from device to host.  Targets ship bf16 too: 8 mantissa
    bits give ~0.2% relative error on [0,1] radiance, the same order as
    the 1/255 quantization the reference's PNG ground truth carries
    (preprocess.py:13-51 divides 8-bit PNGs by 255) — the loss upcasts to
    f32 on device.
    """
    import collections

    import numpy as np
    from jax import device_put

    # NOTE: staging from a separate producer thread was tried and is
    # PESSIMAL on the tunneled backend (~10x slower): concurrent
    # device_put and dispatch contend on the transport lock (observed
    # ~60% system CPU).  Inline depth-2 staging keeps transfers one batch
    # ahead of compute without cross-thread contention.
    buf = collections.deque()
    for x, y in batches:
        x, y = np.asarray(x), np.asarray(y)
        if bf16_inputs:
            import ml_dtypes
            x = x.astype(ml_dtypes.bfloat16)
            y = y.astype(ml_dtypes.bfloat16)
        buf.append((device_put(x), device_put(y)))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def fit(state: TrainState, data_iter_fn: Callable[[], Iterable],
        train_options: TrainOptions = TrainOptions(),
        epochs: Optional[int] = None,
        logger=None, checkpoint_fn=None, log_every: int = 5,
        model_options: Optional[ModelOptions] = None,
        start_epoch: int = 0):
    """Epoch driver (train.py:54-112): StepLR per epoch, periodic checkpoints.

    ``data_iter_fn()`` must yield (inputs (T,N,H,W,10), targets (T,N,H,W,3))
    numpy/jnp batches for one epoch; if it accepts an argument it receives
    the epoch index — shuffle with it (the reference's DataLoader reshuffles
    every epoch; a constant order would quietly degrade training).
    ``start_epoch`` resumes the StepLR schedule mid-run (epochs already
    covered by a loaded checkpoint).
    """
    import inspect
    takes_epoch = False
    try:
        takes_epoch = len(inspect.signature(data_iter_fn).parameters) >= 1
    except (TypeError, ValueError):
        pass
    epochs = epochs if epochs is not None else train_options.epochs
    jit_step = jax.jit(lambda s, x, y: train_step(s, x, y, train_options,
                                                  model_options=model_options))
    overall_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        lr = step_lr(train_options.lr, epoch, train_options.lr_step_epochs,
                     train_options.lr_gamma)
        state = dataclasses.replace(state, lr=jnp.asarray(lr, jnp.float32))
        t0 = time.time()
        total, count = 0.0, 0
        batches = data_iter_fn(epoch) if takes_epoch else data_iter_fn()
        staged = _device_prefetch(batches, bf16_inputs=train_options.bf16_compute)
        epoch_base = overall_step

        def _log(i, metrics):
            # ONE host fetch for all metrics: on a tunneled device each
            # readback costs a full RTT (~0.3 s); per-scalar float() calls
            # here used to dominate the step time.
            nonlocal total, count
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            total += m["total"]
            count += 1
            if logger is not None:
                logger.scalars(epoch_base + i + 1, m)
            print(f"Epoch [{epoch}] Step [{i}] "
                  f"Total {m['total']:.4f} L1 {m['l1']:.4f} "
                  f"HFEN {m['hfen']:.4f} "
                  f"Temporal {m['temporal']:.4f} lr {lr:g}")

        # Metrics are SAMPLED every ``log_every`` steps and fetched
        # log_every steps behind the dispatch: the fetch RTT over the
        # tunnel rivals the device step itself, so per-step fetching
        # roughly doubles wall time (measured 0.75 s/step vs ~0.2 s).
        # Unsampled metrics are dropped on-device for free.
        pending = None
        n_steps = 0
        for i, (inputs, targets) in enumerate(staged):
            state, metrics = jit_step(state, inputs, targets)
            n_steps = i + 1
            if i % log_every == 0:
                if pending is not None:
                    _log(*pending)
                pending = (i, metrics)
        if pending is not None:
            _log(*pending)
        overall_step += n_steps
        dt = time.time() - t0
        if count:
            print(f"Epoch {epoch}: avg loss {total / count:.4f} ({dt:.1f}s)")
        if checkpoint_fn is not None and epoch % train_options.checkpoint_every_epochs == 0:
            checkpoint_fn(state, epoch)
    if checkpoint_fn is not None:
        checkpoint_fn(state, "final")
    return state


def recalibrate_bn(state: TrainState, batches, n_batches: int,
                   train_options: Optional[TrainOptions] = None,
                   model_options: Optional[ModelOptions] = None
                   ) -> TrainState:
    """Re-estimate BatchNorm running statistics with frozen weights.

    Under the batch-4 recurrent BPTT regime the momentum-tracked running
    estimates lag the batch statistics the network was actually trained
    against (measured ~5 dB of held-out PSNR in the r3 campaign).  A short
    pass of forward-only train-mode steps (no optimizer) lets the running
    stats converge on the final weights before the deployable export —
    the standard "BN recalibration" trick.

    ``batches``: iterable of (inputs (T,N,H,W,10), targets) — targets are
    ignored.  Returns the state with updated ``bn_state`` only.
    """
    from ..models import apply_sequence

    topt = train_options if train_options is not None else TrainOptions()
    mopt = model_options

    @jax.jit
    def fwd(bn, x):
        _, _, new_bn = apply_sequence(state.params, bn, x, train=True,
                                      bf16=topt.bf16_compute, options=mopt)
        return new_bn

    bn = state.bn_state
    seen = 0
    for x, _ in batches:
        bn = fwd(bn, jnp.asarray(x))
        seen += 1
        if seen >= n_batches:
            break
    jax.block_until_ready(jax.tree_util.tree_leaves(bn)[0])
    return dataclasses.replace(state, bn_state=bn)
