"""Entropy backends: roundtrip + the native range-coder family beats/nears xz
on the stream classes it is assigned to."""

import numpy as np
import pytest

from minicom_tpu.entropy import backend
from minicom_tpu import native


@pytest.mark.parametrize("codec", ["xz", "bz2", "zlib", "store", "o1rc",
                                   "o2rc", "dnarc", "dz", "dzt", "trans1",
                                   "trans2", "p2:o1rc", "p4:xz",
                                   "p2:dnarc", "p2:trans1"])
def test_backend_roundtrip(rng, codec):
    data = bytes(rng.integers(0, 64, size=10000, dtype=np.uint8)) + b"0\n" * 500
    blob = backend.compress(codec, data)
    assert backend.decompress(codec, blob, len(data)) == data


@pytest.mark.parametrize("family", ["o1rc", "o2rc", "dnarc"])
def test_rc_empty_and_tiny(family):
    for data in [b"", b"A", b"ACGT" * 3]:
        blob = native.rc_encode(family, data)
        assert native.rc_decode(family, blob, len(data)) == data


def test_dz_empty_and_tiny():
    for data in [b"", b"A", b"ACGT" * 3]:
        blob = native.dz_encode(data)
        assert native.dz_decode(blob, len(data)) == data


def test_dz_dedupes_fwd_and_rc_repeats(rng):
    """The LZ front end must capture long repeats in BOTH orientations (the
    consensus stream's contigs cover loci in arbitrary orientation, r05) and
    beat plain whole-stream dnarc on repeat-heavy packed DNA."""
    seq = rng.integers(0, 4, 60000, dtype=np.uint8)
    rc = (3 - seq)[::-1]
    full = np.concatenate([seq, seq.copy(), rc,
                           rng.integers(0, 4, 20000, dtype=np.uint8)])
    packed = np.zeros((len(full) + 3) // 4, np.uint8)
    for i in range(4):
        part = full[i::4]
        packed[: len(part)] |= part << (2 * i)
    data = packed.tobytes()
    blob = backend.compress("dz", data)
    assert backend.decompress("dz", blob, len(data)) == data
    # the two repeated copies (1 fwd + 1 rc) are half the stream; dz must
    # reduce them to near-free copy tokens
    assert len(blob) < len(data) * 0.60
    # a bad magic/version must raise (deeper corruption is the container
    # CRC's job, io/container.py)
    corrupt = bytes([blob[0] ^ 0xFF]) + blob[1:]
    with pytest.raises(ValueError):
        backend.decompress("dz", corrupt, len(data))


def test_ctx_trans_models_context(rng):
    """The on-chip context rANS (device_ctx_rans.py) must beat its own
    order-0 sibling on markov-structured data, and the k it ships degrades
    when the dense table would not fit (big alphabets)."""
    # order-1 structure over a 16-symbol alphabet: next symbol = prev +- 1
    n = 60000
    steps = rng.integers(-1, 2, n).cumsum() % 16
    data = (steps + 48).astype(np.uint8).tobytes()
    b0 = backend.compress("trans", data)
    b1 = backend.compress("trans1", data)
    assert backend.decompress("trans1", b1, len(data)) == data
    assert len(b1) < 0.75 * len(b0)
    # alphabet ~250: trans2's dense A^2*A table cannot fit -> degrades, but
    # must still roundtrip
    big = bytes(rng.integers(0, 250, 50000, dtype=np.uint8))
    b2 = backend.compress("trans2", big)
    assert backend.decompress("trans2", b2, len(big)) == big


def test_dzt_matches_dz_transform(rng):
    """dzt (dz matcher + fully on-chip entropy) reconstructs exactly and
    stays size-competitive with host dz on repeat-heavy packed DNA."""
    seq = rng.integers(0, 4, 120000, dtype=np.uint8)
    full = np.concatenate([seq, (3 - seq)[::-1],
                           rng.integers(0, 4, 40000, dtype=np.uint8)])
    packed = np.zeros((len(full) + 3) // 4, np.uint8)
    for i in range(4):
        part = full[i::4]
        packed[: len(part)] |= part << (2 * i)
    data = packed.tobytes()
    bz = backend.compress("dz", data)
    bt = backend.compress("dzt", data)
    assert backend.decompress("dzt", bt, len(data)) == data
    assert len(bt) < 1.25 * len(bz)


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


def test_dnarc_exploits_repeats_and_rc(rng):
    """Repeated genome regions — forward AND reverse-complement — code at a
    fraction of a bit per base (the IR model of rangecoder.cpp)."""
    seq = rng.integers(0, 4, 20000, dtype=np.uint8)
    rc = (3 - seq)[::-1]
    full = np.concatenate([seq, seq, rc])
    packed = np.zeros((len(full) + 3) // 4, np.uint8)
    for i in range(4):
        part = full[i::4]
        packed[: len(part)] |= part << (2 * i)
    data = packed.tobytes()
    blob = backend.compress("dnarc", data)
    assert backend.decompress("dnarc", blob, len(data)) == data
    # unique content is 1/3 of the stream; repeats (fwd + rc) must shrink it
    # well below the 2-bit-packed raw size
    assert len(blob) < len(data) * 0.62
    # and beat xz -9e on the packed representation
    assert len(blob) < len(backend.compress("xz", data))


def test_plane_transform_is_exact(rng):
    dpos = rng.integers(0, 1 << 16, 5000, dtype=np.uint16).tobytes()
    for codec in ("p2:o1rc", "p2:xz"):
        blob = backend.compress(codec, dpos)
        assert backend.decompress(codec, blob, len(dpos)) == dpos
    # non-multiple lengths fall back to untransformed coding, still exact
    odd = dpos[:4097]
    blob = backend.compress("p2:o1rc", odd)
    assert backend.decompress("p2:o1rc", blob, len(odd)) == odd


def test_auto_codec_container(tmp_path, rng):
    from minicom_tpu.io import container
    streams = {"a": bytes(1000), "b": bytes(rng.integers(0, 255, 5000, np.uint8))}
    p = tmp_path / "t.mtc"
    container.write_container(str(p), {"x": 1}, streams, "auto")
    meta, got = container.read_container(str(p))
    assert got == streams
    assert all(e["codec"] in ("xz", "o1rc", "store") for e in meta["streams"])


# ---------------------------------------------------------------- device rANS

@pytest.mark.parametrize("payload", ["uniform", "skewed", "const", "text",
                                     "empty", "tiny"])
def test_device_rans_roundtrip(rng, payload):
    from minicom_tpu.entropy import device_rans
    data = {
        "uniform": bytes(rng.integers(0, 256, 50_000, dtype=np.uint8)),
        "skewed": bytes(rng.choice([0, 0, 0, 0, 1, 2, 65],
                                   40_000).astype(np.uint8)),
        "const": b"\x00" * 30_000,          # f == M: zero-bit symbols
        "text": (b"0\n" * 5000 + b"17G44\n" * 700),
        "empty": b"",
        "tiny": b"Q",
    }[payload]
    blob = device_rans.compress(data)
    assert device_rans.decompress(blob) == data
    if payload in ("skewed", "const", "text"):
        assert len(blob) < max(len(data), 2000)  # actually compresses


def test_device_rans_multiblock(rng):
    from minicom_tpu.entropy import device_rans
    # > BLOCK symbols -> several blocks incl. a padded tail tier
    data = bytes(rng.choice([3, 7, 7, 7, 9], device_rans.BLOCK + 12345)
                 .astype(np.uint8))
    blob = device_rans.compress(data)
    assert device_rans.decompress(blob) == data


def test_device_rans_near_entropy(rng):
    """Order-0 rANS should land within ~2% of the order-0 entropy bound."""
    from minicom_tpu.entropy import device_rans
    p = np.array([0.5, 0.25, 0.125, 0.0625, 0.0625])
    data = rng.choice(5, 200_000, p=p).astype(np.uint8).tobytes()
    h_bits = -(p * np.log2(p)).sum() * len(data)
    blob = device_rans.compress(data)
    overhead = 8 + 2 + 2 + 8 + 512 + 128 * 8   # frame + tables + states
    assert len(blob) - overhead < (h_bits / 8) * 1.02


def test_device_rans_backend_dispatch(rng):
    data = bytes(rng.integers(0, 8, 5000, dtype=np.uint8))
    blob = backend.compress("trans", data)
    assert backend.decompress("trans", blob, len(data)) == data
    blob = backend.compress("p2:trans", data)
    assert backend.decompress("p2:trans", blob, len(data)) == data
