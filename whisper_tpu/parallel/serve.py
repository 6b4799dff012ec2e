"""Data-parallel (+ tensor-parallel) batched inference over a device mesh.

The natural scale axis for ASR serving is data parallelism over audio
streams: each 30-second window is independent once encoded, so a `(dp, tp)`
mesh splits the batch over `dp` while megatron-style weight shardings
(parallel/sharding.py) split heads over `tp`. The whole fused decode loop —
prefill, while_loop, beam bookkeeping — is ONE jitted program; GSPMD inserts
the collectives, which ride ICI on a real slice.

The reference is strictly single-device (one ANE; files processed
sequentially, /root/reference/whisper/transcribe.py:626-638) — there is no
analog. Usage:

    mesh = make_mesh(dp=4, tp=2)
    eng = DataParallelEngine(model, mesh)
    out = eng.run(initial_tokens, ck, cv, n_group=5, beam_search=True, ...)

Tested on a virtual 8-device CPU mesh (tests/test_parallel.py); the driver's
dryrun validates multi-chip compilation the same way.
"""

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine_fused import FusedConfig, FusedEngine
from ..speculative import SpeculativeEngine
from .sharding import param_shardings


def _frame_axis(mesh: Mesh, model):
    """The mesh axis (or None) carrying the cross-K/V 1500-frame dimension:
    `sp` when present and it divides n_audio_ctx evenly — sequence
    parallelism on the DECODE surface (the encoder analog lives in
    parallel/sequence.py)."""
    sp = mesh.shape.get("sp", 1)
    return "sp" if sp > 1 and model.dims.n_audio_ctx % sp == 0 else None


class DataParallelEngine(FusedEngine):
    """FusedEngine whose compiled graphs shard the audio batch over `dp` and
    the attention heads over `tp`. n_audio must be divisible by dp (keep
    serving batches at a fixed multiple of the mesh's dp degree)."""

    def __init__(self, model, mesh: Mesh, weights: str = ""):
        super().__init__(model, weights=weights)
        self.mesh = mesh

    def _jit_options(self, cfg: FusedConfig) -> dict:
        """Sharding annotations only — cfg construction (bucket selection,
        kernel flags) is inherited from FusedEngine so the sharded engine can
        never silently diverge from the single-device configuration."""
        mesh = self.mesh
        dp = mesh.shape.get("dp", 1)
        if cfg.n_audio % dp != 0:
            # a batch the mesh can't split (e.g. transcribe()'s per-window
            # n_audio=1 fallback ladder under a dp>1 mesh): compile without
            # sharding annotations — correct, just not distributed. Serving
            # paths keep their batches at a multiple of dp for the sharded
            # compile (ContinuousBatcher slots, transcribe_batch streams).
            return {}
        # _decoder_params() so the sharding tree matches the arg tree when
        # the engine runs with weight-only int8 decode (extra @scale leaves)
        dec_sharding = param_shardings(self._decoder_params(), mesh)
        repl = NamedSharding(mesh, P())
        # ck/cv: (L, A, H, dh, 1500) — batch over dp, heads over tp, and the
        # 1500-frame axis over sp when the mesh carries one: cross-attention
        # reads are the decode step's second-largest bandwidth sink, so each
        # sp rank holds (and streams) 1/sp of the cross-K/V while GSPMD
        # inserts the softmax max/sum collectives (int8 mode quantizes them
        # INSIDE the program — the per-frame scales shard along)
        ckv_spec = NamedSharding(
            mesh, P(None, "dp", "tp", None, _frame_axis(mesh, self.model))
        )
        in_shardings = (
            dec_sharding,
            NamedSharding(mesh, P("dp", None)),  # initial tokens (A, 448)
            repl,  # sample_begin
            ckv_spec,
            ckv_spec,
            repl,  # sot_index
            repl,  # suppress mask
            repl,  # blank mask
            repl,  # max_initial_ts_index
            repl,  # sample_len
            repl,  # temperature
            repl,  # rng_seed
        )
        return {"in_shardings": in_shardings}


def dp_encode(model, mesh: Mesh):
    """Batched encoder sharded over (dp, tp): mel (A, n_mels, 3000) -> xa.
    Returns a jitted callable."""
    from ..models import graphs

    enc_sharding = param_shardings(model.params["encoder"], mesh)
    return jax.jit(
        partial(graphs.encode, n_head=model.dims.n_audio_head),
        in_shardings=(enc_sharding, NamedSharding(mesh, P("dp", None, None))),
    )


def dp_cross_kv(model, mesh: Mesh):
    """Batched cross-KV sharded over (dp, tp): xa (A, 1500, d) -> (ck, cv).
    With an sp axis, the outputs land frame-sharded so the decode program
    consumes them in place (no resharding between the two programs)."""
    from ..models import graphs

    dec_sharding = param_shardings(model.params["decoder"], mesh)
    return jax.jit(
        partial(graphs.cross_kv, n_head=model.dims.n_text_head),
        in_shardings=(dec_sharding, NamedSharding(mesh, P("dp", None, None))),
        out_shardings=NamedSharding(
            mesh, P(None, "dp", "tp", None, _frame_axis(mesh, model))
        ),
    )


class DataParallelSpeculativeEngine(SpeculativeEngine):
    """SpeculativeEngine whose compiled program shards BOTH models' weights
    (megatron-style over `tp`) and the audio batch over `dp`. Decoding
    semantics and cfg construction are inherited so the sharded engine can
    never silently diverge from the single-device speculative path
    (token-identity pinned on the virtual mesh, tests/test_parallel.py)."""

    def __init__(self, model, draft_model, mesh: Mesh, k: int = 4, weights: str = ""):
        super().__init__(model, draft_model, k=k, weights=weights)
        self.mesh = mesh

    def _jit_options(self, cfg) -> dict:
        mesh = self.mesh
        dp = mesh.shape.get("dp", 1)
        if cfg.n_audio % dp != 0:
            return {}  # see DataParallelEngine._jit_options
        dec_t = param_shardings(self._decoder_params(), mesh)
        dec_d = param_shardings(self._draft_decoder_params(), mesh)
        repl = NamedSharding(mesh, P())
        tp = mesh.shape.get("tp", 1)

        def ckv_spec(n_head, model):
            # a draft with fewer heads than tp keeps its cross-K/V head axis
            # replicated (GSPMD still shards the dp batch axis); the frame
            # axis shards over sp exactly as in DataParallelEngine
            head_axis = "tp" if n_head % tp == 0 else None
            return NamedSharding(
                mesh, P(None, "dp", head_axis, None, _frame_axis(mesh, model))
            )

        ckv_t = ckv_spec(self.model.dims.n_text_head, self.model)
        ckv_d = ckv_spec(self.draft.dims.n_text_head, self.draft)
        in_shardings = (
            dec_t,
            dec_d,
            NamedSharding(mesh, P("dp", None)),  # initial tokens (A, 448)
            repl,  # sample_begin
            ckv_t,  # ck_t
            ckv_t,  # cv_t
            ckv_d,  # ck_d
            ckv_d,  # cv_d
            repl,  # sot_index
            repl,  # suppress mask
            repl,  # blank mask
            repl,  # max_initial_ts_index
            repl,  # sample_len
        )
        return {"in_shardings": in_shardings}
