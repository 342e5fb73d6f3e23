"""Entropy backends: roundtrip + the native range coder beats/nears xz on
diff-like text."""

import numpy as np
import pytest

from minicom_tpu.entropy import backend
from minicom_tpu import native


@pytest.mark.parametrize("codec", ["xz", "bz2", "zlib", "store", "o1rc"])
def test_backend_roundtrip(rng, codec):
    data = bytes(rng.integers(0, 64, size=10000, dtype=np.uint8)) + b"0\n" * 500
    blob = backend.compress(codec, data)
    assert backend.decompress(codec, blob, len(data)) == data


def test_o1rc_empty_and_tiny():
    for data in [b"", b"A", b"ACGT" * 3]:
        blob = native.o1rc_encode(data)
        assert native.o1rc_decode(blob, len(data)) == data


def test_o1rc_compresses_structured(rng):
    # diff-stream-like data: mostly "0\n" with occasional letters
    rows = []
    for _ in range(3000):
        if rng.random() < 0.8:
            rows.append(b"0")
        else:
            rows.append(b"17G44")
    data = b"\n".join(rows) + b"\n"
    blob = native.o1rc_encode(data)
    assert len(blob) < len(data) // 4
    assert native.o1rc_decode(blob, len(data)) == data


def test_auto_codec_container(tmp_path, rng):
    from minicom_tpu.io import container
    streams = {"a": bytes(1000), "b": bytes(rng.integers(0, 255, 5000, np.uint8))}
    p = tmp_path / "t.mtc"
    container.write_container(str(p), {"x": 1}, streams, "auto")
    meta, got = container.read_container(str(p))
    assert got == streams
    assert all(e["codec"] in ("xz", "o1rc") for e in meta["streams"])
