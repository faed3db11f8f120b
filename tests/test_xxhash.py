"""xxHash known-answer + structural tests."""

from kmdiff_tpu.utils.xxhash import xxh32, xxh64


def test_xxh32_empty():
    assert xxh32(b"") == 0x02CC5D05


def test_xxh64_empty():
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_lengths_cover_all_paths():
    # exercise <16/<32 byte paths, lane loops, and 4-byte/1-byte tails
    seen = set()
    for n in [0, 1, 3, 4, 5, 15, 16, 17, 31, 32, 33, 63, 64, 100]:
        data = bytes(range(256))[:n] * 1
        h32, h64 = xxh32(data), xxh64(data)
        assert 0 <= h32 < 2**32 and 0 <= h64 < 2**64
        seen.add((h32, h64))
    assert len(seen) == 14  # all distinct


def test_seed_changes_hash():
    assert xxh64(b"kmdiff", 0) != xxh64(b"kmdiff", 1)
    assert xxh32(b"kmdiff", 0) != xxh32(b"kmdiff", 1)
