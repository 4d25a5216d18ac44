import numpy as np

from ishara_tpu.data.tokenizer import CTCTokenizer, Seq2SeqTokenizer
from ishara_tpu.data.vocab import ASLFR_CHARS, NUM_CLASSES, PAD_TOKEN_IDX


def test_vocab_shape():
    assert len(ASLFR_CHARS) == 59
    assert NUM_CLASSES == 60
    assert PAD_TOKEN_IDX == 59


def test_ctc_roundtrip():
    tok = CTCTokenizer()
    assert tok.vocab_size == 60
    text = "hello world 3-2"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # fixed-length encoding pads with blank and decodes back clean
    padded = tok.encode(text, max_len=64)
    assert padded.shape == (64,)
    assert (padded[len(text):] == PAD_TOKEN_IDX).all()
    assert tok.decode(padded) == text


def test_ctc_known_ids():
    tok = CTCTokenizer()
    assert tok.char_to_idx[" "] == 0
    assert tok.char_to_idx["a"] == 32
    assert tok.char_to_idx["z"] == 57
    assert tok.char_to_idx["~"] == 58
    assert tok.char_to_idx["^"] == 59


def test_seq2seq_roundtrip():
    tok = Seq2SeqTokenizer()
    text = "abc def"
    ids = tok.encode(text, max_len=32)
    assert ids[0] == tok.sos_token
    assert tok.decode(ids) == text
    # eos terminates decoding
    ids2 = np.concatenate([ids[: len(text) + 1], [tok.eos_token], ids[:3]])
    assert tok.decode(ids2) == text
