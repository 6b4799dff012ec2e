"""The user-facing Whisper model object.

Holds dimensions, device parameters, and the jitted graph set (encode /
cross_kv / prefill / decode_step). Mirrors the reference `Whisper` module's
public surface (/root/reference/whisper/model.py:31-135): transcribe / decode
/ detect_language methods, `is_multilingual`, `num_languages`,
`set_alignment_heads`. Unlike the reference — where `Whisper.logits` is
commented out and language auto-detection crashes (model.py:96-107) —
language detection works here.
"""

import base64
import gzip
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import profiling
from . import graphs
from .dims import ModelDimensions
from .params import init_random_params_device

_LN_KEYS = ("ln_g", "ln_b")


def cast_params(params: Dict, dtype) -> Dict:
    """Cast matmul weights to `dtype`; LayerNorm scale/shift stay float32
    (they're consumed inside the f32 normalization anyway)."""

    def cast(path, leaf):
        if any(path.endswith(k) for k in _LN_KEYS):
            return jnp.asarray(leaf, dtype=jnp.float32)
        return jnp.asarray(leaf, dtype=dtype)

    def walk(tree, prefix=""):
        return {
            k: walk(v, f"{prefix}{k}/") if isinstance(v, dict) else cast(f"{prefix}{k}", v)
            for k, v in tree.items()
        }

    return walk(params)


class Whisper:
    def __init__(
        self,
        dims: ModelDimensions,
        params: Optional[Dict] = None,
        name: str = "custom",
        compute_dtype: str = "bfloat16",
    ):
        from ..runtime_config import configure_jax_cache

        configure_jax_cache()  # persistent compile cache (TPU backend only)

        self.dims = dims
        self.name = name
        self.compute_dtype = jnp.dtype(compute_dtype)
        if params is None:
            # generated directly on device: no multi-GB host->TPU transfer
            params = init_random_params_device(dims, dtype=self.compute_dtype)
        self.params = cast_params(params, self.compute_dtype)

        # default alignment heads: all heads of the upper half of layers
        half = dims.n_text_layer // 2
        self.alignment_heads: List[Tuple[int, int]] = [
            (l, h)
            for l in range(half, dims.n_text_layer)
            for h in range(dims.n_text_head)
        ]

        n_audio_head = dims.n_audio_head
        n_text_head = dims.n_text_head

        self._encode = jax.jit(partial(graphs.encode, n_head=n_audio_head))
        self._cross_kv = jax.jit(partial(graphs.cross_kv, n_head=n_text_head))

        def _encode_ckv(enc, dec, mel):
            xa = graphs.encode(enc, mel, n_head=n_audio_head)
            ck, cv = graphs.cross_kv(dec, xa, n_head=n_text_head)
            return xa, ck, cv

        self._encode_ckv_fn = _encode_ckv
        # encoder + cross-KV as ONE program: per decoded window this saves an
        # execute round trip (remote PJRT) and lets XLA overlap the first
        # cross-KV projections with the encoder tail
        self._encode_ckv = jax.jit(_encode_ckv)
        # sharded variants, built by set_mesh()
        self._encode_sharded = None
        self._cross_kv_sharded = None
        self._encode_ckv_sharded = None
        self._prefill = jax.jit(partial(graphs.prefill, n_head=n_text_head))
        self._decode_step = jax.jit(
            partial(graphs.decode_step, n_head=n_text_head), donate_argnums=(3,)
        )
        self._logits = jax.jit(graphs.hidden_to_logits)
        self._prefill_align_cache = {}
        self._align_replay_cache = {}
        self._token_prob_cache = {}

    # ---- graph entry points -------------------------------------------------

    def _mesh_pick(self, plain, sharded, batch: int):
        """The sharded jit when a mesh is set and the batch splits over dp;
        the plain single-device jit otherwise (transcribe()'s per-window
        n_audio=1 calls under a dp>1 mesh)."""
        mesh = getattr(self, "mesh", None)
        if (
            sharded is not None
            and mesh is not None
            and batch % mesh.shape.get("dp", 1) == 0
        ):
            return sharded
        return plain

    def encode(self, mel) -> jax.Array:
        """mel: (B, n_mels, 3000) -> audio features (B, 1500, d)."""
        with profiling.timed("encoder"):
            mel = jnp.asarray(mel)
            fn = self._mesh_pick(self._encode, self._encode_sharded, mel.shape[0])
            out = fn(self.params["encoder"], mel)
            profiling.maybe_block(out)
        return out

    def cross_kv(self, xa) -> Tuple[jax.Array, jax.Array]:
        with profiling.timed("cross_kv"):
            fn = self._mesh_pick(self._cross_kv, self._cross_kv_sharded, xa.shape[0])
            ck, cv = fn(self.params["decoder"], xa)
            profiling.maybe_block(cv)
        return ck, cv

    def encode_with_cross_kv(self, mel):
        """mel (B, n_mels, 3000) -> (xa, cK, cV) in one device program."""
        with profiling.timed("encoder"):
            mel = jnp.asarray(mel)
            fn = self._mesh_pick(
                self._encode_ckv, self._encode_ckv_sharded, mel.shape[0]
            )
            xa, ck, cv = fn(
                self.params["encoder"], self.params["decoder"], mel
            )
            profiling.maybe_block(cv)
        return xa, ck, cv

    def prefill(self, tokens, n_valid, ck, cv):
        """tokens: (B, n) int32 -> (hidden (B, 256, d), kv (L, 2, B, 256, d)).
        Pads tokens to PREFILL_LEN internally."""
        tokens = jnp.asarray(tokens, dtype=jnp.int32)
        B, n = tokens.shape
        if n > graphs.PREFILL_LEN:
            raise ValueError(
                f"initial token length {n} exceeds prefill window {graphs.PREFILL_LEN}"
            )
        padded = jnp.zeros((B, graphs.PREFILL_LEN), dtype=jnp.int32)
        padded = jax.lax.dynamic_update_slice(padded, tokens, (0, 0))
        with profiling.timed("prefill"):
            hidden, kv = self._prefill(
                self.params["decoder"], padded, jnp.int32(n_valid), ck, cv
            )
            profiling.maybe_block(kv)
        return hidden, kv

    def prefill_align(self, tokens, n_valid, ck, cv):
        """Prefill that also returns alignment-head cross-attention scores."""
        key = tuple(self.alignment_heads)
        if key not in self._prefill_align_cache:
            self._prefill_align_cache[key] = jax.jit(
                partial(
                    graphs.prefill_with_alignment,
                    n_head=self.dims.n_text_head,
                    alignment_heads=key,
                )
            )
        fn = self._prefill_align_cache[key]
        tokens = jnp.asarray(tokens, dtype=jnp.int32)
        B, n = tokens.shape
        padded = jnp.zeros((B, graphs.PREFILL_LEN), dtype=jnp.int32)
        padded = jax.lax.dynamic_update_slice(padded, tokens, (0, 0))
        return fn(self.params["decoder"], padded, jnp.int32(n_valid), ck, cv)

    def alignment_replay(
        self, tokens, n_valid, ck, cv, row_ids, n_frames: int, eot: int,
        qk_scale: float = 1.0, medfilt_width: int = 7,
    ):
        """Run the whole word-timestamp replay as one device program:
        prefill + alignment-head capture + token probs + softmax/z-norm/
        median-filter cost-matrix processing (graphs.alignment_outputs).
        Returns device arrays (text_probs (P,), matrix (P, 1500))."""
        key = (tuple(self.alignment_heads), eot, medfilt_width)
        if key not in self._align_replay_cache:
            self._align_replay_cache[key] = jax.jit(
                partial(
                    graphs.alignment_outputs,
                    n_head=self.dims.n_text_head,
                    alignment_heads=tuple(self.alignment_heads),
                    eot=eot,
                    medfilt_width=medfilt_width,
                )
            )
        fn = self._align_replay_cache[key]
        tokens = jnp.asarray(tokens, dtype=jnp.int32)
        B, n = tokens.shape
        padded = jnp.zeros((B, graphs.PREFILL_LEN), dtype=jnp.int32)
        padded = jax.lax.dynamic_update_slice(padded, tokens, (0, 0))
        return fn(
            self.params["decoder"],
            padded,
            jnp.int32(n_valid),
            ck,
            cv,
            jnp.asarray(row_ids, dtype=jnp.int32),
            jnp.int32(n_frames // 2),
            jnp.float32(qk_scale),
        )

    def sampled_token_probs(self, hidden, row_ids, eot: int):
        """hidden (P, d), row_ids (P,) int32 -> (P,) f32: per-row softmax
        probability over the text vocabulary (logits[:, :eot]) of that
        row's id, computed ON DEVICE.

        The word-timestamp replay only needs one probability per sampled
        token; fetching the raw (256, n_vocab) f32 logits to compute them
        on the host cost ~53 MB of host transfer per window on remote-PJRT
        backends (measured: the word_timestamps path ran transfer-bound at
        ~4.8x RT before this)."""
        if eot not in self._token_prob_cache:

            def f(dec, hidden, ids):
                logits = graphs.hidden_to_logits(dec, hidden)[:, :eot]
                probs = jax.nn.softmax(logits, axis=-1)
                return probs[jnp.arange(probs.shape[0]), ids]

            self._token_prob_cache[eot] = jax.jit(f)
        return self._token_prob_cache[eot](
            self.params["decoder"],
            hidden,
            jnp.asarray(row_ids, dtype=jnp.int32),
        )

    def decode_step(self, tokens, pos, cache, src, ck, cv):
        with profiling.timed("decode_step"):
            logits, cache = self._decode_step(
                self.params["decoder"],
                jnp.asarray(tokens, dtype=jnp.int32),
                jnp.int32(pos),
                cache,
                jnp.asarray(src, dtype=jnp.int32),
                ck,
                cv,
            )
            profiling.maybe_block(logits)
        return logits, cache

    def hidden_to_logits(self, hidden):
        return self._logits(self.params["decoder"], hidden)

    def new_cache(self, beam: int):
        return graphs.make_empty_cache(
            self.dims.n_text_layer, beam, self.dims.n_text_state, self.compute_dtype
        )

    def kv_to_cache(self, kv, beam: int):
        return graphs.kv_to_cache(kv, beam, self.compute_dtype)

    def kv_to_cache_grouped(self, kv, n_group: int):
        """kv (L, 2, n_audio, P, d) -> cache (L, 2, n_audio*n_group, 448, d),
        each audio's prefill K/V broadcast across its sampling group."""
        kv = jnp.repeat(kv, n_group, axis=2)
        L, two, B, P, d = kv.shape
        cache = jnp.zeros((L, 2, B, graphs.CACHE_SLOTS, d), dtype=self.compute_dtype)
        return jax.lax.dynamic_update_slice(
            cache, kv.astype(self.compute_dtype), (0, 0, 0, 0, 0)
        )

    # ---- metadata ------------------------------------------------------------

    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.dims.n_vocab - 51765 - int(self.is_multilingual)

    def set_alignment_heads(self, dump: bytes):
        """Install the published per-model alignment-head mask (base85+gzip
        packed bools of shape (n_text_layer, n_text_head))."""
        array = np.frombuffer(gzip.decompress(base64.b85decode(dump)), dtype=bool)
        mask = array.reshape(self.dims.n_text_layer, self.dims.n_text_head)
        self.alignment_heads = [
            (int(l), int(h)) for l, h in np.argwhere(mask)
        ]

    def set_draft_model(self, draft, k: int = 4):
        """Attach a draft model for speculative greedy decoding.

        With a draft installed, decode()/transcribe() run their greedy
        temperature-0 attempts through the speculative engine
        (whisper_tpu/speculative.py) — the draft proposes `k` tokens per
        round, this model verifies all of them in one decoder pass; emitted
        tokens are identical to plain greedy by construction. The t > 0
        fallback ladder and beam search automatically use the plain engine.

        The transcribe() path feeds both models from one mel, so the draft
        must share this model's n_mels (true for distil-style drafts; an
        80-mel tiny drafting a 128-mel v3 target works at the engine level
        via frontend.clip_frontend_spec, not through transcribe()).
        """
        if draft is None:
            self.draft_model = None
            return
        if draft.dims.n_vocab != self.dims.n_vocab:
            raise ValueError(
                "draft must share the tokenizer/vocab "
                f"({draft.dims.n_vocab} vs {self.dims.n_vocab})"
            )
        if draft.dims.n_mels != self.dims.n_mels:
            raise ValueError(
                "transcribe()-level speculation feeds both models one mel; "
                f"draft n_mels {draft.dims.n_mels} != {self.dims.n_mels} "
                "(use SpeculativeEngine + clip_frontend_spec directly)"
            )
        self.draft_model = draft
        self.draft_k = int(k)
        self._spec_engine = None  # rebuilt lazily by the decoding task

    def set_mesh(self, mesh):
        """Run this model's whole decode surface — decode()/transcribe()/
        transcribe_batch/ContinuousBatcher/server — through the sharded
        engines (parallel/serve.py) AND sharded encoder/cross-KV programs
        over `mesh`: the audio batch splits over the mesh's `dp` axis and
        attention heads over `tp`. Batches not divisible by dp (e.g.
        transcribe()'s per-window n_audio=1) compile unsharded — correct,
        just not distributed — so keep serving batch sizes (ContinuousBatcher
        slots, transcribe_batch streams) at a multiple of dp. Pass None to
        restore single-device engines."""
        self.mesh = mesh
        self._fused_engine = None  # rebuilt lazily by the decoding task
        self._spec_engine = None
        if mesh is None:
            self._encode_sharded = None
            self._cross_kv_sharded = None
            self._encode_ckv_sharded = None
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import param_shardings

        enc_sh = param_shardings(self.params["encoder"], mesh)
        dec_sh = param_shardings(self.params["decoder"], mesh)
        from ..parallel.serve import _frame_axis

        dp3 = NamedSharding(mesh, P("dp", None, None))
        # frames shard over sp (when present) so decode consumes the
        # cross-K/V in place — see parallel/serve.py on sp-in-decode
        ckv_out = NamedSharding(
            mesh, P(None, "dp", "tp", None, _frame_axis(mesh, self))
        )
        n_audio_head, n_text_head = self.dims.n_audio_head, self.dims.n_text_head
        self._encode_sharded = jax.jit(
            partial(graphs.encode, n_head=n_audio_head),
            in_shardings=(enc_sh, dp3),
            out_shardings=dp3,
        )
        self._cross_kv_sharded = jax.jit(
            partial(graphs.cross_kv, n_head=n_text_head),
            in_shardings=(dec_sh, dp3),
            out_shardings=(ckv_out, ckv_out),
        )
        self._encode_ckv_sharded = jax.jit(
            self._encode_ckv_fn,
            in_shardings=(enc_sh, dec_sh, dp3),
            out_shardings=(dp3, ckv_out, ckv_out),
        )

    # ---- high-level API (bound in __init__ to avoid circular imports) --------

    def decode(self, mel, options=None, **kwargs):
        from ..decoding import decode as decode_fn

        return decode_fn(self, mel, options, **kwargs)

    def detect_language(self, mel_or_features, tokenizer=None):
        from ..decoding import detect_language as detect_fn

        return detect_fn(self, mel_or_features, tokenizer)

    def transcribe(self, audio, **kwargs):
        from ..transcribe import transcribe as transcribe_fn

        return transcribe_fn(self, audio, **kwargs)
