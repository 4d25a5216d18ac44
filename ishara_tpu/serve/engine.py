"""Batch-1 streaming inference engine.

TPU-native equivalent of the reference's ``TFLiteModel`` export (nb cell 13):
raw landmark frames -> thin -> normalize/resample -> encoder -> greedy CTC
collapse -> short-output fallback, fused into ONE compiled XLA executable via
``jax.jit(...).lower().compile()`` — the analogue of the serialized TFLite
graph, but resident on a TPU chip.

The reference's fallback substitutes the constant phrase "2 a-e -aroe"
(ids hardcoded from the public static-greedy baseline) whenever the decode
yields fewer than 3 characters; reproduced here.

Both engines share one per-sequence program builder
(:func:`make_serving_program`): :class:`InferenceEngine` compiles it at
batch 1, :class:`BatchedEngine` maps the SAME program over a static batch —
so every serving option (fused Pallas kernels, int8 weight streaming,
on-device beam search) is available in both.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EncoderConfig
from ..data import landmarks as lm
from ..data.vocab import PAD_TOKEN_IDX
from ..decode.greedy import greedy_decode
from ..models.encoder import IsharaEncoder
from ..preprocess.pipeline import GroupStats, preprocess

# Reference constant-phrase fallback ids (nb cell 13), in the CTC vocab.
FALLBACK_IDS = np.array([17, 0, 32, 12, 36, 0, 12, 32, 49, 46, 36], np.int32)


def prepare_serving_variables(variables: dict, fused: bool | str) -> dict:
    """Host-side variable prep for a serving option: int8 fused mode stores
    the matmul weights int8 in HBM (quantized once here, dequantized inside
    the kernels)."""
    if fused == "int8":
        from ..ops.fused_block import quantize_serving_weights

        variables = dict(variables)
        variables["params"] = quantize_serving_weights(variables["params"])
    return variables


def make_serving_program(
    model: IsharaEncoder,
    stats: GroupStats,
    max_out: int,
    decode: str = "greedy",
    beam_width: int = 8,
    beam_top_k: int = 8,
    fused: bool | str = False,
    dma: bool = False,
):
    """The per-sequence serving program ``(variables, raw [T,276], length)
    -> (ids [max_out], count)`` — preprocess, encoder, decode, fallback.

    ``decode``: "greedy" (reference parity) or "beam" (on-device CTC prefix
    beam search, decode/beam_device.py).

    ``fused=True`` runs the encoder through the whole-block Pallas kernels
    (ops/fused_block.py — one kernel per block instead of ~40 XLA ops;
    batch-1 serving is op-count bound, see RESULTS.md). ``fused="int8"``
    additionally expects :func:`prepare_serving_variables`-quantized weights
    and dequantizes INSIDE the kernels — quartering the weight stream that
    dominates the fused path. The round-1 negative result (int8 +
    in-*program* XLA dequant, much slower because XLA re-materializes the
    dequantized tree per sequence) does not apply in-kernel; see RESULTS.md.
    Supported for the squeezeformer/conformer/hybrid families and the
    conv-interleaved conv_hybrid/conv_transformer families (each
    conv-stack + attention-block group is one grid-pipelined kernel)."""
    cfg: EncoderConfig = model.cfg
    if decode not in ("greedy", "beam"):
        raise ValueError(f"decode must be 'greedy' or 'beam', got {decode!r}")
    if fused not in (False, True, "int8"):
        raise ValueError(f"fused must be False, True or 'int8', got {fused!r}")

    def program(variables, raw, length):
        x = preprocess(raw, length, stats, cfg.frame_len, thin=True,
                       dominant_hand=cfg.dominant_hand)
        if fused:
            from ..ops.fused_block import fused_encoder_forward

            cdt = "int8" if fused == "int8" else jnp.bfloat16
            # dma: manual double-buffered weight prefetch in the stacked
            # kernels — measured ~4-7% faster at the flagship encoder in
            # paired round-4 probes (RESULTS.md "double-buffered DMA")
            logits = fused_encoder_forward(cfg, variables, x,
                                           compute_dtype=cdt, dma=dma)
        else:
            logits = model.apply(variables, x[None], training=False)[0]
        if decode == "beam":
            from ..decode.beam_device import beam_search_device

            lp = jax.nn.log_softmax(logits, axis=-1)
            ids, count, _ = beam_search_device(
                lp, beam_width=beam_width, top_k=beam_top_k, max_len=max_out)
        else:
            ids, count = greedy_decode(logits, max_len=max_out)
        # reference fallback: <3 chars -> constant phrase (cropped if a
        # caller configures max_out below the 11-char fallback)
        nfb = min(len(FALLBACK_IDS), max_out)
        fb = jnp.full((max_out,), PAD_TOKEN_IDX, jnp.int32)
        fb = fb.at[:nfb].set(jnp.asarray(FALLBACK_IDS[:nfb]))
        use_fb = count < 3
        ids = jnp.where(use_fb, fb, ids.astype(jnp.int32))
        count = jnp.where(use_fb, nfb, count)
        return ids, count

    return program


class InferenceEngine:
    """Compiles the full landmarks->ids pipeline to a single executable."""

    def __init__(
        self,
        model: IsharaEncoder,
        variables: dict,
        stats: GroupStats | None = None,
        max_raw_frames: int = 384,
        max_out: int = lm.MAX_PHRASE_LENGTH,
        decode: str = "greedy",
        beam_width: int = 8,
        beam_top_k: int = 8,
        fused: bool | str = False,
        dma: bool = False,
    ):
        """See :func:`make_serving_program` for the option semantics."""
        self.model = model
        self.stats = stats or GroupStats.identity()
        self.max_raw_frames = max_raw_frames
        self.max_out = max_out
        self.frame_len = model.cfg.frame_len
        # original (unfused) tree kept for diagnostic forwards that go
        # through model.apply (clients.topk_classes)
        self.raw_variables = variables
        self.variables = prepare_serving_variables(variables, fused)
        self._program = make_serving_program(
            model, self.stats, max_out, decode=decode,
            beam_width=beam_width, beam_top_k=beam_top_k, fused=fused,
            dma=dma)
        shape = jax.ShapeDtypeStruct((max_raw_frames, lm.N_COLS), jnp.float32)
        lshape = jax.ShapeDtypeStruct((), jnp.int32)
        self._compiled = (
            jax.jit(self._program)
            .lower(self.variables, shape, lshape)
            .compile()
        )

    def program_fn(self):
        """The raw (uncompiled) program for embedding into larger graphs
        (e.g. sequential multi-sequence benchmarking, server batching)."""
        return self._program

    def __call__(self, raw_frames: np.ndarray) -> tuple[np.ndarray, int]:
        """raw [T, 276] (any T) -> (ids [max_out], count). Host-side pad/crop
        to the static buffer; everything else on device."""
        T = raw_frames.shape[0]
        buf = np.zeros((self.max_raw_frames, lm.N_COLS), np.float32)
        n = min(T, self.max_raw_frames)
        buf[:n] = raw_frames[:n]
        ids, count = self._compiled(self.variables, buf, np.int32(max(n, 1)))
        return np.asarray(ids), int(count)

    def predict_text(self, raw_frames: np.ndarray, tokenizer) -> str:
        ids, count = self(raw_frames)
        return tokenizer.decode(ids[:count])


class BatchedEngine:
    """Fixed-batch serving engine for throughput-oriented deployment: the
    SAME per-sequence program as :class:`InferenceEngine` (shared builder,
    all options available), mapped over a static batch (the reference's
    TFLite path is strictly batch-1; this is the production-batching
    extension).

    The unfused path vmaps the program (one batched XLA executable); the
    fused paths ``lax.map`` it (the whole-block Pallas kernels are batch-1
    grid designs, so they run per-sequence but stay inside one device
    program with no host round-trips between sequences)."""

    def __init__(self, model, variables, batch_size: int = 8,
                 stats: GroupStats | None = None, max_raw_frames: int = 384,
                 max_out: int = lm.MAX_PHRASE_LENGTH,
                 decode: str = "greedy", beam_width: int = 8,
                 beam_top_k: int = 8, fused: bool | str = False):
        self.batch_size = batch_size
        self.max_raw_frames = max_raw_frames
        self.max_out = max_out
        stats = stats or GroupStats.identity()
        self.variables = prepare_serving_variables(variables, fused)
        one = make_serving_program(
            model, stats, max_out, decode=decode,
            beam_width=beam_width, beam_top_k=beam_top_k, fused=fused)

        if fused:
            def program(variables, raws, lengths):
                return jax.lax.map(
                    lambda rl: one(variables, rl[0], rl[1]), (raws, lengths))
        else:
            def program(variables, raws, lengths):
                return jax.vmap(lambda r, l: one(variables, r, l))(
                    raws, lengths)

        shape = jax.ShapeDtypeStruct(
            (batch_size, max_raw_frames, lm.N_COLS), jnp.float32)
        lshape = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
        self._compiled = (
            jax.jit(program).lower(self.variables, shape, lshape).compile()
        )

    def __call__(self, sequences: list[np.ndarray]):
        """list of [T_i, 276] arrays (<= batch_size) -> (ids [B, max_out],
        counts [B]) for the first len(sequences) rows."""
        B = self.batch_size
        bufs = np.zeros((B, self.max_raw_frames, lm.N_COLS), np.float32)
        lens = np.ones((B,), np.int32)
        for i, s in enumerate(sequences[:B]):
            n = min(s.shape[0], self.max_raw_frames)
            bufs[i, :n] = s[:n]
            lens[i] = max(n, 1)
        ids, counts = self._compiled(self.variables, bufs, lens)
        return np.asarray(ids), np.asarray(counts)
