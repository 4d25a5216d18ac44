import numpy as np
import pytest

from ishara_tpu.data.cache import ShardedASLFR, write_shards
from ishara_tpu.data.synthetic import SyntheticASLFR
from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.utils.prefetch import prefetch


def test_shard_roundtrip(tmp_path):
    ds = SyntheticASLFR(num_sequences=10, frames_per_char=4)
    out = write_shards(ds, tmp_path / "shards", shard_size=4)
    sharded = ShardedASLFR(out)
    assert len(sharded) == 10
    for i in (0, 4, 9):  # spans all three shards
        x1, p1 = ds.render(i)
        x2, p2 = sharded.render(i)
        assert p1 == p2
        np.testing.assert_allclose(
            np.nan_to_num(x1), np.nan_to_num(x2), rtol=1e-6)
    tok = CTCTokenizer()
    b = sharded.batch([0, 5], tok, max_frames=64)
    assert b["raw"].shape == (2, 64, 276)


def test_prefetch_order_and_errors():
    assert list(prefetch(iter(range(20)))) == list(range(20))

    def boom():
        yield 1
        raise ValueError("boom")

    with pytest.raises(ValueError):
        list(prefetch(boom()))
