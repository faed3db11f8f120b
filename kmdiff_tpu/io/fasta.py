"""FASTA/FASTQ IO.

Writer emits the reference's significant-k-mer record format
(reference: include/kmdiff/aggregator.hpp:51-69):
  >{rank}_pval={p:%g}_control={int(mean_control)}_case={mean_case}
  {kmer}
where mean_control is integer-truncated and mean_case printed as the C++
default double format (integral doubles print without a decimal point).

Reader handles FASTA and FASTQ, plain or gzip, multi-line sequences —
the counting pipeline's input surface (reference reads via kseq++,
include/kmdiff/aggregator.hpp:9-10 and kmtricks' parsers).
"""

from __future__ import annotations

import gzip
import io

import numpy as np


def format_double(v: float) -> str:
    """C++ fmt/std::format default double formatting: shortest round-trip,
    no trailing '.0' on integral values."""
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(float(v))


def format_header(rank: int, pvalue: float, mean_control: float, mean_case: float) -> str:
    return (
        f"{rank}_pval={pvalue:g}_control={int(mean_control)}_case="
        f"{format_double(mean_case)}"
    )


class FastaWriter:
    """Streaming FASTA writer (one-line sequences; k-mers are short)."""

    def __init__(self, path: str):
        self._f = open(path, "w")

    def write(self, name: str, seq: str) -> None:
        self._f.write(f">{name}\n{seq}\n")

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _open_text(path: str):
    path = str(path)
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path)


def iter_records(path: str):
    """Yield (name, seq) from FASTA or FASTQ, plain or .gz."""
    with _open_text(path) as f:
        line = f.readline()
        while line and not line.strip():
            line = f.readline()
        if not line:
            return
        if line.startswith(">"):
            name = line[1:].rstrip()
            chunks: list[str] = []
            for line in f:
                if line.startswith(">"):
                    yield name, "".join(chunks)
                    name, chunks = line[1:].rstrip(), []
                else:
                    chunks.append(line.strip())
            yield name, "".join(chunks)
        elif line.startswith("@"):
            while line:
                name = line[1:].rstrip()
                seq = f.readline().rstrip()
                f.readline()  # '+' separator
                f.readline()  # qualities
                yield name, seq
                line = f.readline()
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {line[:1]!r})")


def read_sequences(path: str) -> list[bytes]:
    """All sequences of a FASTA/FASTQ file as ascii bytes."""
    return [seq.encode() for _name, seq in iter_records(path)]


def read_fasta(path: str) -> list[tuple[str, str]]:
    return list(iter_records(path))


def flat_codes(path: str) -> np.ndarray:
    """Vectorized FASTA/FASTQ -> 2-bit code stream for the counting engine.

    One pass over the raw bytes, no per-read Python loop:
      * header lines ('>' / '@') and FASTQ '+'/quality lines are masked to
        the INVALID code, so they break k-mer windows exactly like read
        boundaries;
      * newlines are then deleted, which JOINS multi-line FASTA sequences
        (correct) while the masked header between reads still separates
        them.
    Falls back to the record parser for malformed FASTQ (records must be
    strict 4-line groups).
    """
    from kmdiff_tpu.ops.codec import INVALID, encode_ascii_block

    if str(path).endswith(".gz"):
        with gzip.open(path, "rb") as f:
            buf = np.frombuffer(f.read(), dtype=np.uint8)
    else:
        with open(path, "rb") as f:
            buf = np.frombuffer(f.read(), dtype=np.uint8)
    if len(buf) == 0:
        return np.zeros(0, np.uint8)

    codes = encode_ascii_block(buf)
    nl = buf == 0x0A
    # line starts: position 0 + every position after a newline
    starts = np.flatnonzero(np.concatenate([[True], nl[:-1]]))
    starts = starts[starts < len(buf)]
    first = buf[starts]

    if buf[0] == 0x3E:  # '>' FASTA
        # mask header lines: line extents via the next start
        ends = np.append(starts[1:], len(buf))
        hdr = first == 0x3E
        mask = np.zeros(len(buf) + 1, np.int8)
        np.add.at(mask, starts[hdr], 1)
        np.add.at(mask, ends[hdr], -1)
        in_hdr = np.cumsum(mask[:-1]) > 0
        codes[in_hdr] = INVALID
    elif buf[0] == 0x40:  # '@' FASTQ
        # drop empty trailing lines for the shape check
        real = starts[starts < len(buf)]
        if len(real) % 4 == 0 and (buf[real[0::4]] == 0x40).all() and (
            buf[real[2::4]] == 0x2B
        ).all():
            ends = np.append(real[1:], len(buf))
            keep_line = np.zeros(len(real), bool)
            keep_line[1::4] = True  # sequence lines only
            mask = np.zeros(len(buf) + 1, np.int8)
            np.add.at(mask, real[~keep_line], 1)
            np.add.at(mask, ends[~keep_line], -1)
            in_other = np.cumsum(mask[:-1]) > 0
            codes[in_other] = INVALID
        else:  # malformed / multi-line FASTQ: generic parser
            from kmdiff_tpu.ops.codec import encode_ascii_block as _enc

            seqs = read_sequences(path)
            joined = b"\xff".join(bytes(s) for s in seqs)
            return _enc(np.frombuffer(joined, dtype=np.uint8))
    else:
        raise ValueError(f"{path}: not FASTA/FASTQ")

    return codes[~nl]


def sequences_to_arrays(seqs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack sequences into (flat uint8 ascii, offsets int64 [n+1]) — the
    columnar shape the counting kernels consume."""
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    if seqs:
        np.cumsum([len(s) for s in seqs], out=offsets[1:])
    flat = np.frombuffer(b"".join(seqs), dtype=np.uint8)
    return flat, offsets
