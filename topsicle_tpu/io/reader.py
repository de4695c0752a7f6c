"""Streaming FASTA/FASTQ reader (plain or gzip), no third-party deps.

Replicates the observable behavior of the reference's I/O layer
(/root/reference/Topsicle/allsteps.py:36-50,127-149, which delegates to
Bio.SeqIO):

- format is sniffed from the first character: '@' -> fastq, '>' -> fasta
  (allsteps.py:41-47); sniffing failure yields None;
- record id = first whitespace-delimited token of the header (Biopython
  convention);
- FASTA sequences may wrap over multiple lines; FASTQ records are the
  standard 4-line form (ONT/PacBio emit 4-line records).
"""

from __future__ import annotations

import dataclasses
import gzip
import io
from typing import Iterator, Optional


class InputFileError(RuntimeError):
    """A single input file could not be read to the end (truncated gzip,
    malformed record, IO failure).  The engine logs it and continues
    with the remaining files — in the reference, the same condition
    kills the whole fork-pool run after hours (a deliberate robustness
    deviation, documented in PARITY.md)."""

    def __init__(self, path: str, cause: BaseException):
        super().__init__(f"cannot read input file {path}: {cause}")
        self.path = path
        self.cause = cause


@dataclasses.dataclass
class SeqRecord:
    """One read. `header` is the full header line without the '>'/'@'
    marker; `id` is its first token.  `qual` is None for FASTA."""

    id: str
    header: str
    seq: str
    qual: Optional[str] = None

    def __len__(self) -> int:
        return len(self.seq)


def _open_text(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, "rt", encoding="utf-8")


def sniff_format(path: str) -> Optional[str]:
    """'fastq' | 'fasta' | None by first non-empty character."""
    try:
        with _open_text(path) as fh:
            first = fh.readline().strip()
    except (OSError, UnicodeDecodeError):
        return None
    if first.startswith("@"):
        return "fastq"
    if first.startswith(">"):
        return "fasta"
    return None


def extension_format(path: str) -> str:
    """Format implied by the file extension.

    The reference uses this (not content sniffing) to pick the subset
    file's format and name (main.py:68-81): fastq only for
    .fastq/.fq(.gz); anything else is treated as fasta."""
    base = path[:-3] if path.endswith(".gz") else path
    return "fastq" if base.endswith((".fastq", ".fq")) else "fasta"


def parse_records(path: str, fmt: Optional[str] = None) -> Iterator[SeqRecord]:
    """Yield SeqRecords; `fmt` overrides sniffing."""
    fmt = fmt or sniff_format(path)
    if fmt is None:
        return
    with _open_text(path) as fh:
        if fmt == "fastq":
            yield from _parse_fastq(fh)
        else:
            yield from _parse_fasta(fh)


def _parse_fastq(fh: io.TextIOBase) -> Iterator[SeqRecord]:
    while True:
        header = fh.readline()
        if not header:
            return
        header = header.rstrip("\n")
        if not header:
            continue
        if not header.startswith("@"):
            raise ValueError(f"malformed FASTQ header: {header[:80]!r}")
        seq = fh.readline().rstrip("\n")
        plus = fh.readline()
        if not plus.startswith("+"):
            raise ValueError("malformed FASTQ record: missing '+' line")
        qual = fh.readline().rstrip("\n")
        h = header[1:]
        yield SeqRecord(id=h.split()[0] if h else "", header=h, seq=seq, qual=qual)


def _parse_fasta(fh: io.TextIOBase) -> Iterator[SeqRecord]:
    header: Optional[str] = None
    chunks: list = []
    for line in fh:
        line = line.rstrip("\n")
        if line.startswith(">"):
            if header is not None:
                h = header
                yield SeqRecord(id=h.split()[0] if h else "", header=h, seq="".join(chunks))
            header = line[1:]
            chunks = []
        elif line:
            chunks.append(line)
    if header is not None:
        h = header
        yield SeqRecord(id=h.split()[0] if h else "", header=h, seq="".join(chunks))
