"""Draft-model distillation: train a small Whisper student against a frozen
target model so speculative decoding has an in-domain draft.

speculative.py's acceptance rate — the whole speedup — depends on the draft
agreeing with the target's argmax. A generic tiny checkpoint agrees less the
further the serving domain drifts from Whisper's training data; this driver
closes the loop the way LLM serving stacks do (distill a draft on your own
traffic): teacher-forced KL distillation of a small student (tiny-class by
default) against the frozen target's logits, on a manifest of your audio.
Records without reference text are pseudo-labeled by the target itself, so
an UNLABELED pile of production audio is enough.

The student shares the target's tokenizer (n_vocab) and mel frontend
(n_mels) by construction, so the result plugs straight into
`model.set_draft_model(load_model(out_dir))` — transcribe()/decode() then
run their greedy attempts speculatively with token-identical output.

Loss (standard Hinton distillation, pad-masked, next-token):
    (1 - alpha) * CE(student, labels) + alpha * tau^2 * KL(teacher/tau || student/tau)

Runs single-device or sharded: pass a (dp, tp) mesh and both models' params
shard per parallel/sharding.py; XLA derives the collectives.

No reference analog (the reference is inference-only); this is the training
half of the speculative serving mode, built on the same static-shape batch
pipeline as finetune.py.

Usage:

    python -m whisper_tpu.distill manifest.jsonl --model turbo --draft tiny \
        --steps 2000 --batch 8 --out ./draft_ckpt [--dp 4 --tp 2]
    # then:
    model = whisper_tpu.load_model("turbo")
    model.set_draft_model(whisper_tpu.load_model("./draft_ckpt"))
"""

import dataclasses
import os
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Union

import numpy as np

from .finetune import PAD_ID, batches, load_manifest
from .models.dims import MODEL_DIMS, ModelDimensions
from .tokenizer import get_tokenizer


def draft_dims(target_dims: ModelDimensions, preset: str = "tiny") -> ModelDimensions:
    """Dimensions for a draft student: the preset's size with the TARGET's
    vocab and mel count, so tokenizer and frontend are shared (the
    set_draft_model contract, models/whisper.py)."""
    base = MODEL_DIMS[preset] if isinstance(preset, str) else preset
    return dataclasses.replace(
        base, n_vocab=target_dims.n_vocab, n_mels=target_dims.n_mels
    )


def pseudo_label(model, records: List[dict], language: Optional[str] = "en",
                 **decode_options) -> List[dict]:
    """Fill missing "text" fields by transcribing with the target model —
    distillation's labels ARE the teacher's behavior, so unlabeled audio is
    valid input."""
    out = []
    for rec in records:
        if rec.get("text") or rec.get("tokens") is not None:
            out.append(rec)
            continue
        r = model.transcribe(
            rec["audio"], language=language, temperature=0.0, verbose=None,
            **decode_options,
        )
        out.append({**rec, "text": r["text"].strip()})
    return out


class DistillState(NamedTuple):
    params: Dict
    opt_state: object
    step: object


def distill_loss(
    student_params,
    teacher_params,
    batch,
    *,
    heads_s,  # (n_audio_head, n_text_head) of the student
    heads_t,  # (n_audio_head, n_text_head) of the teacher
    alpha: float,
    tau: float,
    pad_id: int = PAD_ID,
):
    """Pad-masked next-token CE + temperature-tau KL to the frozen teacher.

    Both models consume the same mel (draft_dims pins n_mels equal); the
    teacher's forward is under stop_gradient, so XLA drops its backward
    graph entirely."""
    import jax
    import jax.numpy as jnp

    from .models import graphs

    mel, tokens = batch["mel"], batch["tokens"]
    targets = tokens[:, 1:]
    inputs = jnp.maximum(tokens[:, :-1], 0)

    def forward(params, n_audio_head, n_text_head):
        xa = graphs.encode(params["encoder"], mel, n_head=n_audio_head)
        ck, cv = graphs.cross_kv(params["decoder"], xa, n_head=n_text_head)
        return graphs.decoder_forward(
            params["decoder"], inputs, ck, cv, n_head=n_text_head
        )

    z_s = forward(student_params, *heads_s)
    z_t = jax.lax.stop_gradient(forward(teacher_params, *heads_t))

    mask = (targets != pad_id).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    safe_targets = jnp.maximum(targets, 0)

    logp_s = jax.nn.log_softmax(z_s, axis=-1)
    nll = -jnp.take_along_axis(logp_s, safe_targets[..., None], axis=-1)[..., 0]
    ce = jnp.sum(nll * mask) / denom

    logp_st = jax.nn.log_softmax(z_s / tau, axis=-1)
    logp_tt = jax.nn.log_softmax(z_t / tau, axis=-1)
    kl_tok = jnp.sum(jnp.exp(logp_tt) * (logp_tt - logp_st), axis=-1)
    kl = jnp.sum(kl_tok * mask) / denom

    loss = (1.0 - alpha) * ce + alpha * (tau * tau) * kl
    return loss, {"ce": ce, "kl": kl}


def make_distill_step(
    dims_t: ModelDimensions,
    dims_s: ModelDimensions,
    mesh,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    alpha: float = 0.5,
    tau: float = 2.0,
):
    """Returns (init_state, jitted step). step(state, teacher_params, batch)
    -> (state, (loss, aux)); the student state is donated, the teacher tree
    is read-only (shard it once with parallel.sharding.shard_params)."""
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.sharding import shard_params

    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    lfn = partial(
        distill_loss,
        heads_s=(dims_s.n_audio_head, dims_s.n_text_head),
        heads_t=(dims_t.n_audio_head, dims_t.n_text_head),
        alpha=alpha,
        tau=tau,
    )

    def init_state(student_params) -> DistillState:
        import jax.numpy as jnp

        student_params = shard_params(student_params, mesh)
        return DistillState(student_params, tx.init(student_params), jnp.int32(0))

    def step_fn(state: DistillState, teacher_params, batch):
        (loss, aux), grads = jax.value_and_grad(lfn, has_aux=True)(
            state.params, teacher_params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return DistillState(params, opt_state, state.step + 1), (loss, aux)

    batch_sharding = {
        "mel": NamedSharding(mesh, P("dp", None, None)),
        "tokens": NamedSharding(mesh, P("dp", None)),
    }
    jitted = jax.jit(
        step_fn, donate_argnums=(0,), in_shardings=(None, None, batch_sharding)
    )
    return init_state, jitted


def run_distill(
    model,
    draft: Union[str, ModelDimensions],
    manifest: List[dict],
    *,
    steps: int,
    batch_size: int,
    out_dir: str,
    mesh=None,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    alpha: float = 0.5,
    tau: float = 2.0,
    max_tokens: int = 128,
    checkpoint_every: int = 0,
    language: Optional[str] = "en",
    log=print,
    seed: int = 0,
) -> List[float]:
    """Distill `model` into a fresh `draft`-sized student over `manifest`;
    writes an orbax checkpoint dir that load_model() reads and
    set_draft_model() accepts. Returns the per-step total-loss history."""
    import jax
    import jax.numpy as jnp

    from .checkpoint import save_checkpoint
    from .models.params import init_random_params
    from .parallel.mesh import make_mesh
    from .parallel.sharding import shard_params

    if steps < 1:
        # a zero-step run would still write a random-weights "draft"
        # checkpoint to out_dir — refuse rather than leave a garbage artifact
        raise ValueError(f"steps must be >= 1, got {steps}")
    if mesh is None:
        mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    dims_s = draft_dims(model.dims, draft)
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task="transcribe",
    )

    unlabeled = [r for r in manifest if not r.get("text") and r.get("tokens") is None]
    if unlabeled:
        n_missing = len(unlabeled)
        log(f"pseudo-labeling {n_missing} unlabeled records with the target model")
        manifest = pseudo_label(model, manifest, language=language)

    init_state, step = make_distill_step(
        model.dims, dims_s, mesh,
        learning_rate=learning_rate, weight_decay=weight_decay,
        alpha=alpha, tau=tau,
    )
    state = init_state(init_random_params(dims_s, seed=seed))
    # the teacher tree is read-only and rides every step: place it on the
    # mesh once (tp-sharded per sharding.py; replicated over dp)
    teacher = shard_params(
        jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), model.params), mesh
    )

    it = batches(
        manifest,
        tokenizer,
        n_mels=dims_s.n_mels,
        batch_size=batch_size,
        max_tokens=max_tokens,
        seed=seed,
    )

    history: List[float] = []
    for i in range(1, steps + 1):
        state, (loss, aux) = step(state, teacher, next(it))
        loss = float(loss)
        if not np.isfinite(loss):
            raise FloatingPointError(f"non-finite distill loss at step {i}: {loss}")
        history.append(loss)
        log(
            f"step {i}/{steps}  loss {loss:.4f}  "
            f"ce {float(aux['ce']):.4f}  kl {float(aux['kl']):.4f}"
        )
        if checkpoint_every and i % checkpoint_every == 0 and i < steps:
            save_checkpoint(out_dir, jax.device_get(state.params), dims_s, i)
    save_checkpoint(out_dir, jax.device_get(state.params), dims_s, steps)
    return history


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="distill a Whisper model into a speculative-decoding draft"
    )
    parser.add_argument("manifest", help="JSON-lines {audio[, text]}; missing "
                        "text is pseudo-labeled by the target model")
    parser.add_argument("--model", default="turbo", help="target (teacher) model")
    parser.add_argument("--draft", default="tiny", help="student size preset")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--out", default="./draft_ckpt")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--tau", type=float, default=2.0)
    parser.add_argument("--max_tokens", type=int, default=128)
    parser.add_argument("--checkpoint_every", type=int, default=0)
    parser.add_argument("--language", default="en")
    parser.add_argument("--dp", type=int, default=None)
    parser.add_argument("--tp", type=int, default=1)
    args = parser.parse_args(argv)

    from . import load_model
    from .parallel.mesh import make_mesh

    model = load_model(args.model)
    mesh = None
    if args.dp is not None or args.tp != 1:
        mesh = make_mesh(dp=args.dp, tp=args.tp)
    history = run_distill(
        model,
        args.draft,
        load_manifest(args.manifest, require_text=False),
        steps=args.steps,
        batch_size=args.batch,
        out_dir=args.out,
        mesh=mesh,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        alpha=args.alpha,
        tau=args.tau,
        max_tokens=args.max_tokens,
        checkpoint_every=args.checkpoint_every,
        language=args.language,
    )
    print(
        f"final loss {history[-1]:.4f}; draft checkpoint at "
        f"{os.path.abspath(args.out)} — attach with "
        "model.set_draft_model(whisper_tpu.load_model(out_dir))"
    )


if __name__ == "__main__":
    main()
