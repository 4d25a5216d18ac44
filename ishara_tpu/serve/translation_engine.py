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
    ):
        """``kv_cache=True`` (default) decodes with per-layer self-attention
        K/V caches and once-computed cross-attention K/V (O(S) decoder work
        per sequence); ``False`` keeps the full-prefix-recompute oracle.
        ``decode="beam"`` runs KV-cached beam search (beams ride the batch
        axis; requires ``kv_cache=True``)."""
        if decode not in ("greedy", "beam"):
            raise ValueError(f"decode must be 'greedy' or 'beam', got {decode!r}")
        if decode == "beam" and not kv_cache:
            raise ValueError("beam decode requires kv_cache=True")
        self.variables = variables
        self.max_raw_frames = max_raw_frames
        self.max_out = max_out
        stats = stats or GroupStats.identity()
        if decode == "beam":
            def decode_fn(model, variables, x, mask, **kw):
                tokens, conf, _ = beam_translate_cached(
                    model, variables, x, mask, beam_width=beam_width,
                    length_penalty=length_penalty, **kw)
                return tokens, conf
        else:
            decode_fn = (greedy_translate_cached if kv_cache
                         else greedy_translate)

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
