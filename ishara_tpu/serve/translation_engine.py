"""Batch-1 serving engine for the encoder-decoder (translation) family.

Completes the serving surface for the torch-path model: raw landmarks ->
preprocess -> grouped reshape -> encoder (once) -> autoregressive greedy
decode -> token ids + confidence, compiled to one XLA executable, mirroring
:class:`ishara_tpu.serve.engine.InferenceEngine` for the CTC family.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..data import landmarks as lm
from ..decode.autoregressive import (
    beam_translate_cached,
    greedy_translate,
    greedy_translate_cached,
)
from ..preprocess.pipeline import GroupStats, frame_mask, preprocess


class TranslationEngine:
    def __init__(
        self,
        model,
        variables: dict,
        stats: GroupStats | None = None,
        frame_len: int = lm.FRAME_LEN,
        max_raw_frames: int = 384,
        max_out: int = lm.MAX_PHRASE_LENGTH,
        sos: int = 1,
        eos: int = 2,
        pad: int = 0,
        kv_cache: bool = True,
        decode: str = "greedy",
        beam_width: int = 4,
        length_penalty: float = 0.0,
        early_exit: bool = True,
        fused: bool = False,
    ):
        """``kv_cache=True`` (default) decodes with per-layer self-attention
        K/V caches and once-computed cross-attention K/V (O(S) decoder work
        per sequence); ``False`` keeps the full-prefix-recompute oracle.
        ``decode="beam"`` runs KV-cached beam search (beams ride the batch
        axis; requires ``kv_cache=True``). ``fused=True`` runs the ENTIRE
        decode loop (greedy or beam) as one Pallas kernel
        (ops/decoder_kernel.py): VMEM-resident decoder weights across all
        steps, caches in scratch — the translation counterpart of
        ``InferenceEngine(fused=...)``. ``fused="auto"`` consults the
        measured selection table (ops/selection.py) AND the kernel's VMEM
        budget; an explicit ``fused=True`` at a geometry over the budget
        also degrades gracefully (the kernel wrappers fall back to the XLA
        while_loop with a one-line log instead of a Mosaic compile error)."""
        if decode not in ("greedy", "beam"):
            raise ValueError(f"decode must be 'greedy' or 'beam', got {decode!r}")
        if decode == "beam" and not kv_cache:
            raise ValueError("beam decode requires kv_cache=True")
        if fused == "auto":
            from ..ops.decoder_kernel import fused_decode_fits
            from ..ops.selection import translation_decode_fused

            fused = (translation_decode_fused(model.feature_dim, frame_len)
                     and fused_decode_fits(
                         model, frame_len, max_out,
                         beam_width if decode == "beam" else 1))
        self.variables = variables
        self.max_raw_frames = max_raw_frames
        self.max_out = max_out
        stats = stats or GroupStats.identity()
        if decode == "beam" and fused:
            from ..ops.decoder_kernel import fused_beam_translate

            def decode_fn(model, variables, x, mask, **kw):
                tokens, conf, _ = fused_beam_translate(
                    model, variables, x, mask, beam_width=beam_width,
                    length_penalty=length_penalty, **kw)
                return tokens, conf
        elif decode == "beam":
            def decode_fn(model, variables, x, mask, **kw):
                tokens, conf, _ = beam_translate_cached(
                    model, variables, x, mask, beam_width=beam_width,
                    length_penalty=length_penalty, **kw)
                return tokens, conf
        elif fused:
            from ..ops.decoder_kernel import fused_greedy_translate

            decode_fn = fused_greedy_translate
        elif kv_cache:
            import functools

            # early_exit=True (default): the decode while_loop stops at the
            # first all-eos step, so a typical phrase pays ~len(phrase)
            # decoder steps instead of max_out. False = fixed 64-step cost
            # (the round-3 comparable benchmark mode); identical tokens.
            decode_fn = functools.partial(greedy_translate_cached,
                                          early_exit=early_exit)
        else:
            decode_fn = greedy_translate

        def program(variables, raw, length):
            flat = preprocess(raw, length, stats, frame_len)
            mask = frame_mask(flat)[None]
            x = flat.reshape(1, frame_len, lm.N_LANDMARKS, 3)
            tokens, confidence = decode_fn(
                model, variables, x, mask, max_len=max_out,
                sos=sos, eos=eos, pad=pad,
            )
            return tokens[0], confidence[0]

        self._program = program
        shape = jax.ShapeDtypeStruct((max_raw_frames, lm.N_COLS), jnp.float32)
        lshape = jax.ShapeDtypeStruct((), jnp.int32)
        self._compiled = (
            jax.jit(program).lower(variables, shape, lshape).compile()
        )

    def program_fn(self):
        """The raw (uncompiled) program, for embedding into larger graphs
        (e.g. the chained-slope bench loop)."""
        return self._program

    def __call__(self, raw_frames: np.ndarray) -> tuple[np.ndarray, float]:
        """raw [T, 276] -> (token ids [max_out], confidence)."""
        T = raw_frames.shape[0]
        buf = np.zeros((self.max_raw_frames, lm.N_COLS), np.float32)
        n = min(T, self.max_raw_frames)
        buf[:n] = raw_frames[:n]
        tokens, conf = self._compiled(self.variables, buf, np.int32(max(n, 1)))
        return np.asarray(tokens), float(conf)

    def predict_text(self, raw_frames: np.ndarray, tokenizer) -> tuple[str, float]:
        tokens, conf = self(raw_frames)
        return tokenizer.decode(tokens), conf


class BatchedTranslationEngine:
    """Fixed-batch throughput engine for the translation family: vmapped
    preprocess feeding ONE batched KV-cached greedy decode (the whole batch
    shares the decode while_loop, so EOS early-exit stops at the slowest
    sequence). The reference never batches its AR validation decode
    (integration.py:799-868 loops the val loader at eval batch size with
    full-prefix recompute); this is the production-batching extension,
    mirroring :class:`ishara_tpu.serve.engine.BatchedEngine` for CTC."""

    def __init__(
        self,
        model,
        variables: dict,
        batch_size: int = 8,
        stats: GroupStats | None = None,
        frame_len: int = lm.FRAME_LEN,
        max_raw_frames: int = 384,
        max_out: int = lm.MAX_PHRASE_LENGTH,
        sos: int = 1,
        eos: int = 2,
        pad: int = 0,
        early_exit: bool = True,
    ):
        self.variables = variables
        self.batch_size = batch_size
        self.max_raw_frames = max_raw_frames
        self.max_out = max_out
        stats = stats or GroupStats.identity()

        def program(variables, raws, lengths):
            flat = jax.vmap(
                lambda r, l: preprocess(r, l, stats, frame_len)
            )(raws, lengths)                               # [B, T, 276]
            mask = frame_mask(flat)                        # [B, T]
            x = flat.reshape(batch_size, frame_len, lm.N_LANDMARKS, 3)
            return greedy_translate_cached(
                model, variables, x, mask, max_len=max_out,
                sos=sos, eos=eos, pad=pad, early_exit=early_exit,
            )

        self._program = program
        shape = jax.ShapeDtypeStruct(
            (batch_size, max_raw_frames, lm.N_COLS), jnp.float32)
        lshape = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
        self._compiled = (
            jax.jit(program).lower(variables, shape, lshape).compile()
        )

    def program_fn(self):
        return self._program

    def __call__(self, raws: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
        """list of B [T_i, 276] arrays -> (tokens [B, max_out], conf [B])."""
        if len(raws) != self.batch_size:
            raise ValueError(
                f"expected {self.batch_size} sequences, got {len(raws)}")
        buf = np.zeros(
            (self.batch_size, self.max_raw_frames, lm.N_COLS), np.float32)
        lens = np.zeros((self.batch_size,), np.int32)
        for i, r in enumerate(raws):
            n = min(r.shape[0], self.max_raw_frames)
            buf[i, :n] = r[:n]
            lens[i] = max(n, 1)
        tokens, conf = self._compiled(self.variables, buf, lens)
        return np.asarray(tokens), np.asarray(conf)

    def predict_texts(self, raws: list[np.ndarray], tokenizer) -> list[str]:
        tokens, _ = self(raws)
        return [tokenizer.decode(t) for t in tokens]
