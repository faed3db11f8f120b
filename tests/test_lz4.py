"""LZ4 codec tests: roundtrips plus decode of real kmtricks-produced frames."""

import io
import os
import random

import numpy as np
import pytest

from kmdiff_tpu.io.lz4 import (
    Lz4FrameReader,
    Lz4FrameWriter,
    compress_block,
    compress_frame,
    decompress_block,
    decompress_frame,
)


def _random_compressible(n, seed=0):
    rng = random.Random(seed)
    out = bytearray()
    words = [bytes([rng.randrange(4)] * rng.randrange(1, 20)) for _ in range(16)]
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


@pytest.mark.parametrize("size", [0, 1, 12, 13, 100, 5000, 70000])
@pytest.mark.parametrize("mode", ["store", "fast"])
def test_frame_roundtrip(size, mode):
    data = _random_compressible(size, seed=size)
    assert decompress_frame(compress_frame(data, mode=mode)) == data


def test_frame_roundtrip_incompressible():
    data = np.random.default_rng(0).bytes(100000)
    assert decompress_frame(compress_frame(data, mode="fast")) == data


def test_block_roundtrip():
    data = _random_compressible(10000, seed=7)
    comp = compress_block(data)
    assert len(comp) < len(data)
    assert decompress_block(comp) == data


def test_streaming_writer_reader():
    chunks = [_random_compressible(1234, seed=i) for i in range(20)]
    buf = io.BytesIO()
    with Lz4FrameWriter(buf, block_size=4096, mode="fast") as w:
        for c in chunks:
            w.write(c)
    buf.seek(0)
    r = Lz4FrameReader(buf)
    got = b""
    while True:
        piece = r.read(777)
        if not piece:
            break
        got += piece
    assert got == b"".join(chunks)


def test_decode_kmtricks_frame(fixture_dir):
    """Frames produced by the real kmtricks lz4 writer must decode; payload
    record size is 12 bytes (8B kmer + 4B count) for the k=20 fixture."""
    path = os.path.join(fixture_dir, "counts", "partition_0", "Case1.kmer.lz4")
    with open(path, "rb") as f:
        f.seek(41)  # skip kmtricks header
        data = Lz4FrameReader(f).read_all()
    assert len(data) % 12 == 0
    assert len(data) // 12 == 49
