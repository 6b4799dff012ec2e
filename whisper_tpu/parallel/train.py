"""Sharded fine-tuning step (dp x tp mesh).

The reference is inference-only; this module adds the training capability a
production ASR stack needs: teacher-forced cross-entropy fine-tuning of the
full encoder-decoder, jit-compiled over a `Mesh` with megatron-style tensor
parallelism (sharding.py) and data parallelism on the batch axis. XLA derives
the collectives (tp all-reduces inside the layers, dp gradient psum) from the
sharding annotations — no explicit communication code.
"""

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import graphs
from ..models.dims import ModelDimensions
from .sharding import shard_params


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def loss_fn(params, batch, *, n_audio_head, n_text_head, pad_id: int = -100):
    """batch: mel (B, n_mels, 3000) f32; tokens (B, T) i32; next-token
    cross-entropy with pad positions (== pad_id) masked out."""
    mel, tokens = batch["mel"], batch["tokens"]
    targets = tokens[:, 1:]
    inputs = jnp.maximum(tokens[:, :-1], 0)

    xa = graphs.encode(params["encoder"], mel, n_head=n_audio_head)
    ck, cv = graphs.cross_kv(params["decoder"], xa, n_head=n_text_head)
    logits = graphs.decoder_forward(
        params["decoder"], inputs, ck, cv, n_head=n_text_head
    )

    mask = (targets != pad_id).astype(jnp.float32)
    safe_targets = jnp.maximum(targets, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(
    dims: ModelDimensions,
    mesh: Mesh,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
):
    """Returns (optimizer, jitted train_step) with dp/tp shardings applied.

    train_step(state, batch) -> (state, loss); batch mel/tokens are sharded
    over dp on the batch axis, params/opt-state over tp per sharding.py.
    """
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)

    step_fn = partial(
        _train_step,
        tx=tx,
        n_audio_head=dims.n_audio_head,
        n_text_head=dims.n_text_head,
    )

    batch_sharding = {
        "mel": NamedSharding(mesh, P("dp", None, None)),
        "tokens": NamedSharding(mesh, P("dp", None)),
    }

    def init_state(params) -> TrainState:
        params = shard_params(params, mesh)
        opt_state = tx.init(params)
        return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))

    jitted = jax.jit(step_fn, donate_argnums=(0,), in_shardings=(None, batch_sharding))
    return init_state, jitted


def _train_step(state: TrainState, batch, *, tx, n_audio_head, n_text_head):
    loss, grads = jax.value_and_grad(
        partial(loss_fn, n_audio_head=n_audio_head, n_text_head=n_text_head)
    )(state.params, batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
