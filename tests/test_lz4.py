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


# ---------------------------------------------------------------------------
# native io-codec (kmdiff_tpu/native/io_codec.cpp): cross-engine frame
# parity and one-pass record split/pack vs the numpy fallback
# ---------------------------------------------------------------------------

native = pytest.importorskip("kmdiff_tpu.native")


@pytest.mark.parametrize("size", [0, 1, 12, 100, 65535, 65536, (1 << 20) + 7])
@pytest.mark.parametrize("mode", ["store", "fast"])
def test_native_frame_cross_engine(size, mode):
    """Native-compressed frames decode through the Python block reader and
    Python-written frames decode through the native one-pass decoder."""
    data = _random_compressible(size, seed=size + 13)
    fr = native.lz4_frame_compress(data, mode=mode).tobytes()
    assert Lz4FrameReader(io.BytesIO(fr)).read_all() == data
    buf = io.BytesIO()
    with Lz4FrameWriter(buf, mode=mode) as w:
        w.write(data)
    assert native.lz4_frame_decompress(buf.getvalue()).tobytes() == data


def test_native_frame_decode_kmtricks(fixture_dir):
    """The real kmtricks-produced fixture frame decodes natively to the same
    bytes as the Python reader."""
    path = os.path.join(fixture_dir, "counts", "partition_0", "Case1.kmer.lz4")
    with open(path, "rb") as f:
        f.seek(41)
        raw = f.read()
    expect = Lz4FrameReader(io.BytesIO(raw)).read_all()
    assert native.lz4_frame_decompress(raw).tobytes() == expect


def test_native_frame_block_dependent():
    """Blocks whose matches reach into PREVIOUS blocks (block-dependent
    frames, FLG bit 5 clear) decode correctly through the contiguous-buffer
    native path."""
    import struct

    from kmdiff_tpu.utils.xxhash import xxh32

    data = _random_compressible(300, seed=3) * 40  # period < 64 KiB
    # hand-build a dependent frame: two stored-size blocks where block 2 is
    # one LZ4 sequence whose match offset points back into block 1
    b1 = data[:6000]
    b2_src = data[6000:12000]
    # encode b2 as a match-only reference to the repeated prefix: emit one
    # literal-free sequence is illegal as first sequence, so emit 12
    # literals then one long match into b1 (offset 6000 relative)
    lit = b2_src[:12]
    mlen = len(b2_src) - 12 - 5  # spec: last 5 bytes are literals
    tail = b2_src[12 + mlen:]
    seq = bytearray()
    seq.append((12 << 4) | 15)
    seq += lit
    seq += struct.pack("<H", 6000)  # match: same bytes 6000 earlier
    rest = mlen - 4 - 15
    while rest >= 255:
        seq.append(255)
        rest -= 255
    seq.append(rest)
    seq.append(len(tail) << 4)
    seq += tail
    flg = (1 << 6)  # version 1, block-DEPENDENT
    bd = 4 << 4
    hdr = bytes([flg, bd])
    frame = struct.pack("<I", 0x184D2204) + hdr
    frame += bytes([(xxh32(hdr) >> 8) & 0xFF])
    frame += struct.pack("<I", len(b1) | 0x80000000) + b1
    frame += struct.pack("<I", len(seq)) + bytes(seq)
    frame += struct.pack("<I", 0)
    assert native.lz4_frame_decompress(frame).tobytes() == data[:12000]


@pytest.mark.parametrize(
    "nw,cbytes,slots", [(1, 1, 1), (1, 2, 1), (1, 4, 1), (2, 4, 1), (4, 2, 1),
                        (1, 4, 20), (2, 1, 3)]
)
def test_native_record_split_pack(nw, cbytes, slots):
    rng = np.random.default_rng(nw * 100 + cbytes * 10 + slots)
    n = 4999
    kmers = rng.integers(0, 1 << 63, (n, nw), dtype=np.uint64)
    counts = rng.integers(0, 1 << (8 * cbytes), (n, slots)).astype(np.uint32)
    if slots == 1:
        counts = counts[:, 0]
    payload = native.pack_kmer_records(kmers, counts, cbytes)
    # payload layout matches the numpy fallback byte-for-byte
    rec = np.zeros((n, nw * 8 + cbytes * slots), dtype=np.uint8)
    rec[:, : nw * 8] = kmers.astype("<u8").view(np.uint8).reshape(n, nw * 8)
    cdt = {1: np.uint8, 2: np.uint16, 4: np.uint32}[cbytes]
    rec[:, nw * 8 :] = (
        np.ascontiguousarray(counts.astype(np.dtype(cdt).newbyteorder("<")))
        .view(np.uint8)
        .reshape(n, cbytes * slots)
    )
    assert np.array_equal(payload, rec.reshape(-1))
    k2, c2 = native.split_kmer_records(payload, n, nw, cbytes, slots)
    assert np.array_equal(k2, kmers)
    assert np.array_equal(c2.reshape(counts.shape), counts)


def test_native_split_rejects_bad_cbytes():
    """Untrusted header widths outside {1,2,4} must be rejected, not
    memcpy'd into the 4-byte widening temporary."""
    with pytest.raises(ValueError):
        native.split_kmer_records(np.zeros(32, np.uint8), 2, 1, 8, 1)
    with pytest.raises(ValueError):
        native.pack_kmer_records(
            np.zeros((2, 1), np.uint64), np.zeros(2, np.uint32), 3
        )
    with pytest.raises(ValueError):
        native.lz4_frame_compress(b"abc", mode="hc")


def test_read_kmer_file_rejects_bad_header(tmp_path):
    """A crafted count file declaring an 8-byte count width errors cleanly
    (FormatError) on both the native and fallback decode paths."""
    import struct

    from kmdiff_tpu.io.kmtricks import MAGIC, read_kmer_file
    from kmdiff_tpu.utils.exceptions import FormatError

    p = tmp_path / "evil.kmer.lz4"
    with open(p, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", 0))
        f.write(bytes([0]))  # uncompressed
        f.write(b"kmer".ljust(8, b"\x00"))
        f.write(struct.pack("<IIIII", 31, 1, 8, 0, 0))  # cbytes=8
        f.write(b"\x00" * 32)  # 2 records of 16 bytes
    with pytest.raises(FormatError):
        read_kmer_file(str(p))


def test_streaming_reader_block_linked():
    """Lz4FrameReader streams block-LINKED frames too: the native
    continue-decoder carries the 64 KiB match window between blocks, so
    the streaming output equals the native whole-frame decode."""
    import struct

    from kmdiff_tpu.utils.xxhash import xxh32

    data = _random_compressible(300, seed=7) * 40
    b1 = data[:6000]
    b2_src = data[6000:12000]
    lit = b2_src[:12]
    mlen = len(b2_src) - 12 - 5
    tail = b2_src[12 + mlen:]
    seq = bytearray()
    seq.append((12 << 4) | 15)
    seq += lit
    seq += struct.pack("<H", 6000)  # match reaches into block 1
    rest = mlen - 4 - 15
    while rest >= 255:
        seq.append(255)
        rest -= 255
    seq.append(rest)
    seq.append(len(tail) << 4)
    seq += tail
    flg = 1 << 6  # version 1, block-LINKED
    hdr = bytes([flg, 4 << 4])
    frame = struct.pack("<I", 0x184D2204) + hdr
    frame += bytes([(xxh32(hdr) >> 8) & 0xFF])
    frame += struct.pack("<I", len(b1) | 0x80000000) + b1
    frame += struct.pack("<I", len(seq)) + bytes(seq)
    frame += struct.pack("<I", 0)

    whole = native.lz4_frame_decompress(frame).tobytes()
    assert whole == data[:12000]
    r = Lz4FrameReader(io.BytesIO(frame))
    # drain in small reads to prove the window survives partial consumption
    out, chunks = b"", 0
    while True:
        c = r.read(777)
        if not c:
            break
        out += c
        chunks += 1
    assert chunks > 1 and out == whole
