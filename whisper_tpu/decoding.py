"""Per-window decoding engine: options, logit filters, greedy/beam search.

Semantics contract is the reference engine (/root/reference/whisper/decoding.py):
same DecodingOptions/DecodingResult fields, same initial-token construction,
same suppression sets, same timestamp rules (including the
timestamp-probability-mass rule), same beam bookkeeping with patience, same
length-penalty ranking — so greedy decoding is token-for-token identical.

Execution maps onto the four compiled graphs:
  * the encoder + cross-KV run once per window;
  * the first decoder pass is a single batched prefill (beams are identical
    before sampling, so it runs once and the KV cache is broadcast — the
    reference loops beam-by-beam through its Decoder256, decoder.py:216-234);
  * each subsequent token is one jitted `decode_step` whose cache is donated,
    with any beam reorder from the previous step fused in as a gather;
  * sampling, filters and beam bookkeeping run host-side on the (n_batch,
    n_vocab) logits — exactly the split the reference uses. A fully-fused
    on-device loop lives in engine_fused.py for the performance path.

This fork of Whisper broke `detect_language` (model.logits removed,
reference model.py:96-107); it is restored here.

PROVENANCE: the reference file above (itself openai/whisper, MIT license) is
the semantic SPEC for the option surface, suppression sets, initial-token
trimming, timestamp rules and beam bookkeeping — they ARE the parity
contract (token-for-token greedy/beam equality is pinned against the live
reference in tests/test_decoding.py). The code is this repo's own
expression of that spec; the execution split (what runs in which compiled
graph) is documented above and has no reference counterpart.
"""

from dataclasses import dataclass, field, replace
from typing import TYPE_CHECKING, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .audio import CHUNK_LENGTH
from .tokenizer import Tokenizer, get_tokenizer
from .utils import compression_ratio

if TYPE_CHECKING:
    from .models.whisper import Whisper


def _as_array(x):
    """Coerce lists/torch tensors to numpy but leave numpy AND jax device
    arrays untouched — a device-resident mel window must not round-trip
    through the host just for an ndim/shape check."""
    if hasattr(x, "detach"):  # torch tensor (possibly CUDA / requires_grad)
        x = x.detach()
        x = x.cpu().numpy() if hasattr(x, "cpu") else np.asarray(x)
        return x
    return x if hasattr(x, "ndim") and hasattr(x, "shape") else np.asarray(x)


def _log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x.astype(np.float32)
    m = x.max(axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=axis, keepdims=True))


def detect_language(
    model: "Whisper", mel, tokenizer: Optional[Tokenizer] = None
) -> Tuple[np.ndarray, Union[dict, List[dict]]]:
    """Detect the spoken language from a mel window (or precomputed audio
    features). Returns (language token id(s), probability dict(s))."""
    if tokenizer is None:
        tokenizer = get_tokenizer(
            model.is_multilingual, num_languages=model.num_languages
        )
    lang_tok_missing = (
        tokenizer.language is None
        or tokenizer.language_token not in tokenizer.sot_sequence
    )
    if lang_tok_missing:
        raise ValueError(
            "This model doesn't have language tokens so it can't perform lang id"
        )

    mel = _as_array(mel)  # device arrays stay on device (no host round trip)
    single = mel.ndim == 2
    if single:
        mel = mel[None]

    if mel.shape[-2:] != (model.dims.n_audio_ctx, model.dims.n_audio_state):
        features = model.encode(mel)
    else:
        features = jnp.asarray(mel)

    n_audio = features.shape[0]
    ck, cv = model.cross_kv(features)
    tokens = np.full((n_audio, 1), tokenizer.sot, dtype=np.int32)
    hidden, _ = model.prefill(tokens, 1, ck, cv)
    logits = np.array(model.hidden_to_logits(hidden[:, 0]))  # (n_audio, vocab), writable

    mask = np.ones(logits.shape[-1], dtype=bool)
    mask[list(tokenizer.all_language_tokens)] = False
    logits[:, mask] = -np.inf
    language_tokens = logits.argmax(axis=-1)
    probs = np.exp(_log_softmax(logits))
    language_probs = [
        {
            c: float(probs[i, j])
            for j, c in zip(tokenizer.all_language_tokens, tokenizer.all_language_codes)
        }
        for i in range(n_audio)
    ]

    if single:
        return language_tokens[0], language_probs[0]
    return language_tokens, language_probs


@dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"  # "transcribe" or "translate"
    language: Optional[str] = None  # None -> auto-detect

    # sampling
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None  # independent samples when t > 0
    beam_size: Optional[int] = None  # beams when t == 0
    patience: Optional[float] = None  # beam search patience (arxiv:2204.05424)

    # ranking: None = length norm, else Google-NMT length penalty alpha
    length_penalty: Optional[float] = None

    prompt: Optional[Union[str, List[int]]] = None  # previous context
    prefix: Optional[Union[str, List[int]]] = None  # current-context prefix

    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True

    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    # kept for API compatibility with the reference; the TPU path computes in
    # bf16 with f32 accumulation regardless
    fp16: bool = True

    # TPU extension (not in the reference): attach this window's device
    # cross-K/V to each DecodingResult so a word-timestamp replay can reuse
    # it instead of recomputing. Off by default — the buffers are large
    # (~31 MB/window on turbo) and pin HBM for the result's lifetime;
    # transcribe()/batch/continuous turn it on when word_timestamps is set.
    keep_cross_kv: bool = False


@dataclass(frozen=True)
class DecodingResult:
    audio_features: object
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan
    # this window's decoder cross-K/V (device arrays, batch dim 1), carried so
    # the word-timestamp replay doesn't recompute them (transcribe.py/batch.py)
    cross_kv: Optional[tuple] = field(default=None, repr=False, compare=False)


class Inference:
    """Decoder execution state for one decode() call: cross-K/V, the 448-slot
    device KV cache, write offset, and the pending beam-reorder permutation
    (fused into the next step as a gather — replacing the reference's native
    rearrange_mkv memcpy, coreml.mm:251-277)."""

    def __init__(self, model: "Whisper", n_group: int):
        self.model = model
        self.n_group = n_group
        self.text_offset = 0
        self.cache = None
        self.ck = None
        self.cv = None
        self.pending_src: Optional[np.ndarray] = None

    def set_audio_features(self, audio_features, cross_kv=None):
        if cross_kv is not None:  # precomputed in the fused encode+cross-KV pass
            self.ck, self.cv = cross_kv
        else:
            self.ck, self.cv = self.model.cross_kv(audio_features)

    def logits(self, tokens: np.ndarray) -> np.ndarray:
        """tokens: (n_batch, cur_len) full sequences. Returns last-position
        logits (n_batch, n_vocab) float32. The first call runs the prefill
        and keeps its hidden states for logits_at() (no-speech probability)."""
        n_batch = tokens.shape[0]
        n_audio = n_batch // self.n_group

        if self.text_offset == 0:
            # prefill: all rows within a group are identical -> run one per audio
            unique = tokens[:: self.n_group]  # (n_audio, len)
            n = unique.shape[1]
            hidden, kv = self.model.prefill(unique, n, self.ck, self.cv)
            self.cache = self.model.kv_to_cache_grouped(kv, self.n_group)
            self.text_offset = n
            # logits at the sot index and the final position, per audio
            self.prefill_hidden = hidden  # (n_audio, 256, d)
            last = np.asarray(self.model.hidden_to_logits(hidden[:, n - 1]))
            out = np.repeat(last, self.n_group, axis=0)
            return out
        else:
            step_tokens = tokens[:, -1].astype(np.int32)
            src = self.pending_src
            if src is None:
                src = np.arange(n_batch, dtype=np.int32)
            self.pending_src = None
            # cross K/V stays one-per-audio; the step graph groups each
            # audio's beams onto its K/V (no per-beam replication)
            logits, self.cache = self.model.decode_step(
                step_tokens, self.text_offset, self.cache, src, self.ck, self.cv
            )
            self.text_offset += 1
            return np.array(logits)  # writable host copy for the logit filters

    def logits_at(self, position: int) -> np.ndarray:
        """Prefill logits at an absolute position (per audio, repeated over
        the group) — used for the no-speech probability at the sot index."""
        h = self.prefill_hidden[:, position]
        out = np.asarray(self.model.hidden_to_logits(h))
        return np.repeat(out, self.n_group, axis=0)

    def rearrange_kv_cache(self, source_indices: Sequence[int]):
        src = np.asarray(source_indices, dtype=np.int32)
        if self.pending_src is None:
            self.pending_src = src
        else:  # compose with any unapplied permutation
            self.pending_src = self.pending_src[src]

    def cleanup_caching(self):
        self.text_offset = 0
        self.cache = None
        self.pending_src = None


class SequenceRanker:
    def rank(self, tokens: List[List[np.ndarray]], sum_logprobs: List[List[float]]):
        raise NotImplementedError


class MaximumLikelihoodRanker(SequenceRanker):
    """Pick the sample with the highest logprob, normalized by simple length
    or the Google NMT length penalty."""

    def __init__(self, length_penalty: Optional[float]):
        self.length_penalty = length_penalty

    def rank(self, tokens, sum_logprobs):
        def scores(logprobs, lengths):
            result = []
            for logprob, length in zip(logprobs, lengths):
                # alpha=None -> plain per-token average; otherwise the
                # Google NMT penalty ((5+len)/6)^alpha (reference :228-235)
                if self.length_penalty is None:
                    result.append(logprob / length)
                else:
                    result.append(logprob / ((5 + length) / 6) ** self.length_penalty)
            return result

        lengths = [[len(t) for t in s] for s in tokens]
        return [np.argmax(scores(p, l)) for p, l in zip(sum_logprobs, lengths)]


class TokenDecoder:
    def reset(self):
        pass

    def update(
        self, tokens: np.ndarray, logits: np.ndarray, sum_logprobs: np.ndarray
    ) -> Tuple[np.ndarray, bool]:
        raise NotImplementedError

    def finalize(self, tokens: np.ndarray, sum_logprobs: np.ndarray):
        raise NotImplementedError


class GreedyDecoder(TokenDecoder):
    def __init__(self, temperature: float, eot: int, rng=None):
        self.temperature = temperature
        self.eot = eot
        # default to the global numpy stream so np.random.seed() makes t>0
        # decodes reproducible, matching the fused engine's rng_seed draw
        self.rng = rng if rng is not None else np.random

    def update(self, tokens, logits, sum_logprobs):
        if self.temperature == 0:
            next_tokens = logits.argmax(axis=-1)
        else:
            # Gumbel-max sampling from softmax(logits / T)
            scaled = logits.astype(np.float64) / self.temperature
            gumbel = -np.log(-np.log(self.rng.uniform(size=scaled.shape)))
            next_tokens = (scaled + gumbel).argmax(axis=-1)

        logprobs = _log_softmax(logits)
        current = logprobs[np.arange(logprobs.shape[0]), next_tokens]
        sum_logprobs += current * (tokens[:, -1] != self.eot)

        next_tokens[tokens[:, -1] == self.eot] = self.eot
        tokens = np.concatenate([tokens, next_tokens[:, None]], axis=-1)

        completed = bool((tokens[:, -1] == self.eot).all())
        return tokens, completed

    def finalize(self, tokens, sum_logprobs):
        tokens = np.pad(tokens, ((0, 0), (0, 0), (0, 1)), constant_values=self.eot)
        return tokens, sum_logprobs.tolist()


class BeamSearchDecoder(TokenDecoder):
    def __init__(
        self, beam_size: int, eot: int, inference: Inference,
        patience: Optional[float] = None,
    ):
        self.beam_size, self.eot, self.inference = beam_size, eot, inference
        self.patience = patience or 1.0
        # patience scales how many finished candidates to collect per audio
        # before stopping (reference decoding.py:337-345)
        self.max_candidates: int = round(beam_size * self.patience)
        self.finished_sequences = None
        assert self.max_candidates > 0, (
            f"Invalid beam size ({beam_size}) or patience ({patience})"
        )

    def reset(self):
        self.finished_sequences = None

    def update(self, tokens, logits, sum_logprobs):
        if tokens.shape[0] % self.beam_size != 0:
            raise ValueError(f"{tokens.shape}[0] % {self.beam_size} != 0")

        n_audio = tokens.shape[0] // self.beam_size
        if self.finished_sequences is None:
            self.finished_sequences = [{} for _ in range(n_audio)]

        logprobs = _log_softmax(logits)
        next_tokens, source_indices, finished_sequences = [], [], []
        for i in range(n_audio):
            scores, sources, finished = {}, {}, {}

            # enumerate candidates: top (beam+1) continuations of each beam.
            # argpartition prunes the vocab, then a stable sort of the small
            # head keeps exact tie order (ascending index on equal values —
            # matching torch.topk and the reference's dict insertion order).
            # The partition boundary only mis-selects if >8 entries tie at
            # the cut value, which finite f32 logits don't do in practice.
            k = self.beam_size + 1
            for j in range(self.beam_size):
                idx = i * self.beam_size + j
                prefix = tokens[idx].tolist()
                row = logprobs[idx]
                head = np.argpartition(-row, k + 8)[: k + 8 + 1]
                head = head[np.lexsort((head, -row[head]))]
                topk_idx = head[:k]
                for token in topk_idx:
                    new_logprob = float(sum_logprobs[idx] + row[token])
                    sequence = tuple(prefix + [int(token)])
                    scores[sequence] = new_logprob
                    sources[sequence] = idx

            # keep the top beam_size unfinished sequences; route EOT-ended
            # ones to the finished pool
            saved = 0
            for sequence in sorted(scores, key=scores.get, reverse=True):
                if sequence[-1] == self.eot:
                    finished[sequence] = scores[sequence]
                    continue
                sum_logprobs[len(next_tokens)] = scores[sequence]
                next_tokens.append(sequence)
                source_indices.append(sources[sequence])
                saved += 1
                if saved == self.beam_size:
                    break
            finished_sequences.append(finished)

        tokens = np.array(next_tokens, dtype=tokens.dtype)
        self.inference.rearrange_kv_cache(source_indices)

        # merge this step's finishers into the per-audio candidate pools,
        # best logprob first, capped at max_candidates (= beam * patience;
        # reference decoding.py:386-409). Decoding completes once every
        # pool is full.
        assert len(self.finished_sequences) == len(finished_sequences)
        for pool, fresh in zip(self.finished_sequences, finished_sequences):
            ranked = sorted(fresh, key=fresh.get, reverse=True)
            room = max(0, self.max_candidates - len(pool))
            pool.update((seq, fresh[seq]) for seq in ranked[:room])

        completed = all(
            len(pool) >= self.max_candidates for pool in self.finished_sequences
        )
        return tokens, completed

    def finalize(self, preceding_tokens, sum_logprobs):
        # fill with unfinished sequences if not enough finished ones exist
        sum_logprobs = np.asarray(sum_logprobs)
        for i, sequences in enumerate(self.finished_sequences):
            if len(sequences) < self.beam_size:
                for j in list(np.argsort(sum_logprobs[i]))[::-1]:
                    sequence = preceding_tokens[i, j].tolist() + [self.eot]
                    sequences[tuple(sequence)] = float(sum_logprobs[i][j])
                    if len(sequences) >= self.beam_size:
                        break

        tokens = [
            [np.array(seq) for seq in sequences.keys()]
            for sequences in self.finished_sequences
        ]
        sum_logprobs = [
            list(sequences.values()) for sequences in self.finished_sequences
        ]
        return tokens, sum_logprobs


class LogitFilter:
    def apply(self, logits: np.ndarray, tokens: np.ndarray) -> None:
        raise NotImplementedError


class SuppressBlank(LogitFilter):
    def __init__(self, tokenizer: Tokenizer, sample_begin: int):
        self.suppress = tokenizer.encode(" ") + [tokenizer.eot]
        self.sample_begin = sample_begin

    def apply(self, logits, tokens):
        if tokens.shape[1] == self.sample_begin:
            logits[:, self.suppress] = -np.inf


class SuppressTokens(LogitFilter):
    def __init__(self, suppress_tokens: Sequence[int]):
        self.suppress_tokens = list(suppress_tokens)

    def apply(self, logits, tokens):
        logits[:, self.suppress_tokens] = -np.inf


class ApplyTimestampRules(LogitFilter):
    """Timestamp-token grammar: timestamps come in pairs (except before EOT),
    never decrease, must start the sample, respect max_initial_timestamp, and
    win over text when their total probability mass is higher."""

    def __init__(
        self,
        tokenizer: Tokenizer,
        sample_begin: int,
        max_initial_timestamp_index: Optional[int],
    ):
        self.tokenizer = tokenizer
        self.sample_begin = sample_begin
        self.max_initial_timestamp_index = max_initial_timestamp_index

    def apply(self, logits, tokens):
        tok = self.tokenizer
        if tok.no_timestamps is not None:
            logits[:, tok.no_timestamps] = -np.inf

        for k in range(tokens.shape[0]):
            seq = tokens[k, self.sample_begin :].tolist()
            last_was_timestamp = len(seq) >= 1 and seq[-1] >= tok.timestamp_begin
            penultimate_was_timestamp = len(seq) < 2 or seq[-2] >= tok.timestamp_begin

            if last_was_timestamp:
                if penultimate_was_timestamp:  # pair complete: force non-timestamp
                    logits[k, tok.timestamp_begin :] = -np.inf
                else:  # mid-pair: forbid text tokens
                    logits[k, : tok.eot] = -np.inf

            timestamps = [t for t in seq if t >= tok.timestamp_begin]
            if timestamps:
                # monotonic timestamps; require nonzero-length segments
                if last_was_timestamp and not penultimate_was_timestamp:
                    timestamp_last = timestamps[-1]
                else:
                    timestamp_last = timestamps[-1] + 1
                logits[k, tok.timestamp_begin : timestamp_last] = -np.inf

        if tokens.shape[1] == self.sample_begin:
            # the sample must start with a timestamp
            logits[:, : tok.timestamp_begin] = -np.inf
            if self.max_initial_timestamp_index is not None:
                last_allowed = tok.timestamp_begin + self.max_initial_timestamp_index
                logits[:, last_allowed + 1 :] = -np.inf

        # prefer timestamps when their probability mass beats every text token
        logprobs = _log_softmax(logits)
        for k in range(tokens.shape[0]):
            ts_slice = logprobs[k, tok.timestamp_begin :]
            m = ts_slice.max()
            timestamp_logprob = m + np.log(np.exp(ts_slice - m).sum()) if np.isfinite(m) else -np.inf
            max_text_token_logprob = logprobs[k, : tok.timestamp_begin].max()
            if timestamp_logprob > max_text_token_logprob:
                logits[k, : tok.timestamp_begin] = -np.inf


class DecodingTask:
    """Wires one decode attempt: tokenizer, initial tokens, token decoder
    (greedy/beam), logit filters, and the inference backend, with the same
    derived quantities as the reference task (decoding.py:535-597)."""

    def __init__(self, model: "Whisper", options: DecodingOptions):
        self.model = model
        self.options: DecodingOptions = self._verify_options(options)
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=options.language or "en",
            task=options.task,
        )
        self.tokenizer: Tokenizer = tokenizer

        # group = concurrent hypotheses per audio; sample_len defaults to
        # half the text context (the reference's cap, decoding.py:553-556)
        self.n_group: int = options.beam_size or options.best_of or 1
        self.n_ctx: int = model.dims.n_text_ctx
        self.sample_len: int = options.sample_len or model.dims.n_text_ctx // 2

        self.sot_sequence = (
            tokenizer.sot_sequence_including_notimestamps
            if self.options.without_timestamps
            else tokenizer.sot_sequence
        )
        self.initial_tokens: Tuple[int, ...] = self._get_initial_tokens()
        self.sample_begin: int = len(self.initial_tokens)
        self.sot_index: int = self.initial_tokens.index(tokenizer.sot)

        self.inference = Inference(model, self.n_group)
        self.sequence_ranker = MaximumLikelihoodRanker(options.length_penalty)
        self._draft_ckv = None  # set per run() when speculation applies

        if options.beam_size is not None:
            self.decoder = BeamSearchDecoder(
                options.beam_size, tokenizer.eot, self.inference, options.patience
            )
        else:
            self.decoder = GreedyDecoder(options.temperature, tokenizer.eot)

        self.logit_filters: List[LogitFilter] = []
        if self.options.suppress_blank:
            self.logit_filters.append(SuppressBlank(self.tokenizer, self.sample_begin))
        if self.options.suppress_tokens:
            self.logit_filters.append(SuppressTokens(self._get_suppress_tokens()))
        if not options.without_timestamps:
            precision = CHUNK_LENGTH / model.dims.n_audio_ctx  # usually 0.02 s
            max_initial_timestamp_index = None
            if options.max_initial_timestamp:
                max_initial_timestamp_index = round(
                    options.max_initial_timestamp / precision
                )
            self.logit_filters.append(ApplyTimestampRules(
                tokenizer, self.sample_begin, max_initial_timestamp_index))

    def _verify_options(self, options: DecodingOptions) -> DecodingOptions:
        # same rejection set (and messages) as the reference :599-612
        bad = None
        if options.beam_size is not None and options.best_of is not None:
            bad = "beam_size and best_of can't be given together"
        elif options.temperature == 0 and options.best_of is not None:
            bad = "best_of with greedy sampling (T=0) is not compatible"
        elif options.patience is not None and options.beam_size is None:
            bad = "patience requires beam_size to be given"
        elif options.length_penalty is not None and not (
            0 <= options.length_penalty <= 1
        ):
            bad = "length_penalty (alpha) should be a value between 0 and 1"
        if bad:
            raise ValueError(bad)
        return options

    def _get_initial_tokens(self) -> Tuple[int, ...]:
        """Initial sequence: [sot_prev + trimmed prompt] + sot_sequence +
        [trimmed prefix].

        Trim rules are the parity contract (reference decoding.py:614-640,
        pinned by tests/test_decoding.py): string prompts/prefixes are
        encoded with a leading space after stripping; a prefix keeps its
        LAST ``n_ctx//2 - sample_len`` tokens when sample_len is set; a
        prompt keeps its last ``n_ctx//2 - 1`` tokens behind a sot_prev
        marker prepended to the whole sequence.
        """

        def as_ids(text_or_ids) -> List[int]:
            if isinstance(text_or_ids, str):
                return self.tokenizer.encode(" " + text_or_ids.strip())
            return list(text_or_ids)

        seq = list(self.sot_sequence)
        if self.options.prefix:
            prefix = as_ids(self.options.prefix)
            if self.sample_len is not None:
                prefix = prefix[-(self.n_ctx // 2 - self.sample_len) :]
            seq += prefix
        if self.options.prompt:
            prompt = as_ids(self.options.prompt)
            seq = [self.tokenizer.sot_prev] + prompt[-(self.n_ctx // 2 - 1) :] + seq
        return tuple(seq)

    def _get_suppress_tokens(self) -> Tuple[int, ...]:
        suppress_tokens = self.options.suppress_tokens

        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]

        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            suppress_tokens.extend(self.tokenizer.non_speech_tokens)
        elif suppress_tokens is None or len(suppress_tokens) == 0:
            suppress_tokens = []
        else:
            assert isinstance(suppress_tokens, list), "suppress_tokens must be a list"

        # task/control specials are always suppressed (reference :654-666).
        # Copy first: without it `+=` extends the CALLER's list in place,
        # growing a reused options.suppress_tokens on every decode.
        tok = self.tokenizer
        suppress_tokens = list(suppress_tokens)
        suppress_tokens += [tok.transcribe, tok.translate, tok.sot, tok.sot_prev,
                            tok.sot_lm]
        if tok.no_speech is not None:
            suppress_tokens.append(tok.no_speech)
        return tuple(sorted(set(suppress_tokens)))

    def _detect_language(self, audio_features, tokens: np.ndarray):
        languages = [self.options.language] * audio_features.shape[0]
        lang_probs = None

        if self.options.language is None or self.options.task == "lang_id":
            # audio_features is always batched (n_audio, 1500, d) here, so
            # detect_language returns per-audio lists
            lang_tokens, lang_probs = detect_language(
                self.model, audio_features, self.tokenizer
            )
            languages = [max(probs, key=probs.get) for probs in lang_probs]
            if self.options.language is None:
                tokens[:, self.sot_index + 1] = lang_tokens

        return languages, lang_probs

    def _can_fuse(self) -> bool:
        """The fused on-device loop handles single- and multi-stream batches
        (the compiled graph is keyed on n_audio, so callers should keep batch
        sizes stable). Initial sequences beyond the 256-slot prefill window
        are unsupported on BOTH paths (the host path's model.prefill raises
        too — same hard cap as the reference's decoder256 graph); in practice
        they cannot occur via transcribe(), which trims prompts to
        n_text_ctx//2 - 1 = 223 tokens. The guard only keeps this task from
        compiling a fused program that could never run."""
        return (
            getattr(self.model, "use_fused_decode", True)
            and len(self.initial_tokens) <= 256
        )

    def _can_speculate(self) -> bool:
        """Speculative decoding applies to the fused greedy temperature-0
        path only (the transcription hot path); beam search and the t > 0
        fallback ladder run the plain engine. The sequence ceiling must stay
        un-binding: the spec engine's verify chunk needs K+1 free slots, so
        near-448-token decodes fall back rather than risk an early stop."""
        draft = getattr(self.model, "draft_model", None)
        if draft is None:
            return False
        k = getattr(self.model, "draft_k", 4)
        return (
            self.options.beam_size is None
            and self.options.temperature == 0
            and self.n_group == 1
            and self.sample_begin + self.sample_len <= self.n_ctx - k - 1
        )

    def _main_loop_fused(self, tokens: np.ndarray):
        """Run the whole sampling loop as one on-device program
        (engine_fused.fused_decode), then convert results to the host-loop's
        output contract. For beam search, the device finished-sequence buffer
        is poured into BeamSearchDecoder.finished_sequences so finalize() and
        ranking behave identically."""
        from .engine_fused import FusedEngine

        if getattr(self.model, "_fused_engine", None) is None:
            mesh = getattr(self.model, "mesh", None)
            if mesh is not None:
                # model.set_mesh(mesh): the WHOLE product surface
                # (decode/transcribe/batch/continuous/server) runs through the
                # sharded engine — dp over the audio batch, tp over heads
                from .parallel.serve import DataParallelEngine

                self.model._fused_engine = DataParallelEngine(self.model, mesh)
            else:
                self.model._fused_engine = FusedEngine(self.model)
        engine: FusedEngine = self.model._fused_engine

        tokenizer = self.tokenizer
        beam_search = self.options.beam_size is not None
        suppress_ids = []
        blank_ids = []
        for f in self.logit_filters:
            if isinstance(f, SuppressTokens):
                suppress_ids = f.suppress_tokens
            elif isinstance(f, SuppressBlank):
                blank_ids = f.suppress
        use_timestamps = any(
            isinstance(f, ApplyTimestampRules) for f in self.logit_filters
        )
        max_initial = None
        for f in self.logit_filters:
            if isinstance(f, ApplyTimestampRules):
                max_initial = f.max_initial_timestamp_index

        common = dict(
            sot_index=self.sot_index,
            suppress_ids=suppress_ids,
            blank_ids=blank_ids,
            max_initial_ts_index=max_initial if use_timestamps else None,
            sample_len=self.sample_len,
            use_timestamps=use_timestamps,
            temperature=self.options.temperature,
            eot=tokenizer.eot,
            timestamp_begin=tokenizer.timestamp_begin,
            no_timestamps=tokenizer.no_timestamps,
            no_speech=tokenizer.no_speech if tokenizer.no_speech is not None else 0,
        )
        # per-audio rows rather than self.initial_tokens: language
        # detection may have overwritten the language token slot
        rows = tokens[:: self.n_group].astype(np.int32)

        if self._draft_ckv is not None:
            # speculative greedy: the draft proposes, the target verifies —
            # emitted tokens are the target's filtered argmax by
            # construction, so the fused/host parity contract is unchanged
            from .speculative import SpeculativeEngine

            draft = self.model.draft_model
            k = getattr(self.model, "draft_k", 4)
            mesh = getattr(self.model, "mesh", None)
            key = (id(draft), k, id(mesh) if mesh is not None else None)
            if (
                getattr(self.model, "_spec_engine_key", None) != key
                or getattr(self.model, "_spec_engine", None) is None
            ):
                if mesh is not None:
                    from .parallel.serve import DataParallelSpeculativeEngine

                    self.model._spec_engine = DataParallelSpeculativeEngine(
                        self.model, draft, mesh, k=k
                    )
                else:
                    self.model._spec_engine = SpeculativeEngine(
                        self.model, draft, k=k
                    )
                self.model._spec_engine_key = key
            (
                out_tokens,
                n_tokens,
                sum_logprobs,
                no_speech_prob,
                ftok,
                fscore,
                flen,
                fcount,
            ) = self.model._spec_engine.run(
                rows,
                self.inference.ck,
                self.inference.cv,
                self._draft_ckv[0],
                self._draft_ckv[1],
                **common,
            )
        else:
            (
                out_tokens,
                n_tokens,
                sum_logprobs,
                no_speech_prob,
                ftok,
                fscore,
                flen,
                fcount,
            ) = engine.run(
                rows,
                self.inference.ck,
                self.inference.cv,
                n_group=self.n_group,
                beam_search=beam_search,
                max_candidates=(
                    self.decoder.max_candidates if beam_search else 0
                ),
                # a fresh seed matters only when the sampling branch can
                # execute; at temperature 0 a fixed seed keeps the engine's
                # device-scalar cache to one entry instead of one per window
                rng_seed=(
                    np.random.randint(0, 2**31 - 1)
                    if self.options.temperature > 0
                    else 0
                ),
                **common,
            )

        n = int(n_tokens)
        tokens = out_tokens[:, :n].astype(np.int64)  # (n_audio*n_group, n)
        sum_logprobs = sum_logprobs.astype(np.float64)
        if tokenizer.no_speech is not None:
            no_speech_probs = [
                float(p) for p in no_speech_prob for _ in range(self.n_group)
            ]
        else:
            no_speech_probs = [np.nan] * tokens.shape[0]

        if beam_search:
            pools = []
            for a in range(ftok.shape[0]):
                finished = {}
                for i in range(int(fcount[a])):
                    seq = tuple(int(t) for t in ftok[a, i, : int(flen[a, i])])
                    finished[seq] = float(fscore[a, i])
                pools.append(finished)
            self.decoder.finished_sequences = pools

        return tokens, sum_logprobs, no_speech_probs

    def _main_loop(self, audio_features, tokens: np.ndarray):
        n_batch = tokens.shape[0]

        if self._can_fuse():
            return self._main_loop_fused(tokens)

        sum_logprobs = np.zeros(n_batch, dtype=np.float64)
        no_speech_probs = [np.nan] * n_batch

        try:
            for i in range(self.sample_len):
                logits = self.inference.logits(tokens)

                if i == 0 and self.tokenizer.no_speech is not None:
                    sot_logits = self.inference.logits_at(self.sot_index)
                    probs_at_sot = np.exp(_log_softmax(sot_logits))
                    no_speech_probs = probs_at_sot[
                        :, self.tokenizer.no_speech
                    ].tolist()

                for logit_filter in self.logit_filters:
                    logit_filter.apply(logits, tokens)

                tokens, completed = self.decoder.update(tokens, logits, sum_logprobs)

                if completed or tokens.shape[-1] > self.n_ctx:
                    break
        finally:
            self.inference.cleanup_caching()

        return tokens, sum_logprobs, no_speech_probs

    def run(self, mel) -> List[DecodingResult]:
        self.decoder.reset()
        tokenizer = self.tokenizer
        mel = _as_array(mel)
        n_audio = mel.shape[0]

        if mel.shape[-2:] == (
            self.model.dims.n_audio_ctx,
            self.model.dims.n_audio_state,
        ):
            audio_features, cross_kv = jnp.asarray(mel), None
        else:
            # one device program for encoder + cross-KV (saves a round trip
            # per window and fuses the projections into the encoder tail)
            audio_features, ck, cv = self.model.encode_with_cross_kv(mel)
            cross_kv = (ck, cv)
        tokens = np.tile(np.array([self.initial_tokens], dtype=np.int64), (n_audio, 1))

        languages, language_probs = self._detect_language(audio_features, tokens)
        if self.options.task == "lang_id":
            return [
                DecodingResult(
                    audio_features=features, language=language, language_probs=probs
                )
                for features, language, probs in zip(
                    np.asarray(audio_features), languages, language_probs
                )
            ]

        self.inference.set_audio_features(audio_features, cross_kv)

        # speculative decoding: the draft shares this window's mel (enforced
        # by set_draft_model), so its cross-K/V is one more encode pass
        self._draft_ckv = None
        if cross_kv is not None and self._can_speculate():
            _, dck, dcv = self.model.draft_model.encode_with_cross_kv(mel)
            self._draft_ckv = (dck, dcv)

        tokens = np.repeat(tokens, self.n_group, axis=0)

        tokens, sum_logprobs, no_speech_probs = self._main_loop(audio_features, tokens)

        # audio_features stays a device array: DecodingResult.audio_features
        # is only re-consumed on device (word-timestamp cross-KV replay), so
        # materializing it would cost a ~8 MB device->host->device round trip
        # per window on the remote-PJRT path
        no_speech_probs = no_speech_probs[:: self.n_group]
        assert audio_features.shape[0] == len(no_speech_probs) == n_audio

        tokens = tokens.reshape(n_audio, self.n_group, -1)
        sum_logprobs = sum_logprobs.reshape(n_audio, self.n_group)

        tokens, sum_logprobs = self.decoder.finalize(tokens, sum_logprobs)
        tokens = [
            [t[self.sample_begin : np.nonzero(t == tokenizer.eot)[0][0]] for t in s]
            for s in tokens
        ]

        selected = self.sequence_ranker.rank(tokens, sum_logprobs)
        tokens: List[List[int]] = [
            [int(v) for v in t[i]] for i, t in zip(selected, tokens)
        ]
        texts: List[str] = [tokenizer.decode(t).strip() for t in tokens]

        sum_logprobs: List[float] = [lp[i] for i, lp in zip(selected, sum_logprobs)]
        avg_logprobs: List[float] = [
            lp / (len(t) + 1) for t, lp in zip(tokens, sum_logprobs)
        ]

        # carry this window's cross-K/V (already computed for decoding) so the
        # word-timestamp replay doesn't pay a recompute program per window —
        # only when asked: the rows pin large HBM buffers for the result's
        # lifetime, so plain decode() callers must not accumulate them
        ckv_rows: List[Optional[tuple]] = [None] * n_audio
        if cross_kv is not None and self.options.keep_cross_kv:
            ck, cv = cross_kv
            if n_audio == 1:
                ckv_rows = [(ck, cv)]
            else:
                # cross-K/V is (L, B, H, dh, T): batch is axis 1
                ckv_rows = [
                    (ck[:, i : i + 1], cv[:, i : i + 1]) for i in range(n_audio)
                ]

        fields = (
            texts,
            languages,
            tokens,
            list(audio_features),
            avg_logprobs,
            no_speech_probs,
            ckv_rows,
        )
        if len(set(map(len, fields))) != 1:
            raise RuntimeError(f"inconsistent result lengths: {list(map(len, fields))}")

        return [
            DecodingResult(
                audio_features=features,
                language=language,
                tokens=tokens,
                text=text,
                temperature=self.options.temperature,
                avg_logprob=avg_logprob,
                compression_ratio=compression_ratio(text),
                no_speech_prob=no_speech_prob,
                cross_kv=ckv,
            )
            for text, language, tokens, features, avg_logprob, no_speech_prob, ckv in zip(
                *fields
            )
        ]


def decode(
    model: "Whisper",
    mel,
    options: Optional[DecodingOptions] = None,
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30-second mel window(s): mel (n_mels, 3000) or (B, n_mels, 3000)."""
    mel = _as_array(mel)
    if single := mel.ndim == 2:
        mel = mel[None]

    options = options or DecodingOptions()
    if kwargs:
        options = replace(options, **kwargs)

    result = DecodingTask(model, options).run(mel)
    return result[0] if single else result
