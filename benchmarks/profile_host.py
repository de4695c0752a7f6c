"""Host-only pipeline microbench: parse -> encode -> batch assembly,
NO device work.

Measures what the host feeding a chip can sustain — the round-2
weakness was per-read Python (slice/copy loop in the native reader,
per-read TRC selection) capping a fast-transfer deployment at a few
thousand reads/s.  Round 3 moved the path to block granularity
(native Block API + ends_batch_flat + vectorized _select_hits); this
bench records the resulting rate.

Usage: python benchmarks/profile_host.py [n_reads]
Prints one JSON line: {"host_reads_per_s": ..., "host_mbps": ...,
"stage": {...}}.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.e2e_cli import make_fastq  # noqa: E402
from topsicle_tpu.config import TopsicleConfig  # noqa: E402
from topsicle_tpu.io import batch as batching  # noqa: E402
from topsicle_tpu.pipeline import JaxEngine  # noqa: E402
from topsicle_tpu.io.writer import RunLog  # noqa: E402


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    tmp = tempfile.mkdtemp()
    fq = os.path.join(tmp, "synthetic.fastq.gz")
    make_fastq(fq, n_reads)

    cfg = TopsicleConfig(input_dir=fq, output_dir=os.path.join(tmp, "o"),
                         pattern="CCCTAAA", slide=6)
    eng = JaxEngine(cfg, log=RunLog(None, echo=False))

    # pass 1: parse/encode only (native C++ inflate+parse+encode when
    # available, else the pure-Python reader), block granularity
    t0 = time.time()
    reads = 0
    bases = 0
    for blk in eng._iter_blocks(fq):
        reads += len(blk)
        bases += int(blk.offs[-1])
    parse_s = time.time() - t0

    # pass 2: parse + full step-1 host assembly (ends + 2-bit pack) —
    # everything the launch path does on host before the transfer
    B = cfg.batch_size
    t0 = time.time()
    n_batches = 0
    for blk in eng._iter_blocks(fq):
        ends, ends_len_blk = batching.ends_batch_flat(blk.codes, blk.offs,
                                                      cfg.no_bp)
        n = len(blk)
        ends_len = np.zeros(B, np.int32)
        ends_len[:n] = ends_len_blk
        if n < B:
            ends = np.concatenate(
                [ends, np.full((B - n, 2, cfg.no_bp), 0xFF, np.uint8)], axis=0)
        flat = ends.reshape(B * 2, -1)
        batching.pack_codes(flat)
        n_batches += 1
    asm_s = time.time() - t0

    # pass 3: global-mode shard assembly (round-4 block-piece path of
    # _run_phrase_global: per-block vectorized ends + slab concatenates
    # + per-read meta tuples).  Target: within ~1.2x of pass 2, so a
    # pod's host side keeps up with files mode at the same batch size.
    t0 = time.time()
    it = eng._iter_blocks(fq)
    cur = None
    exhausted = False
    order0 = 0
    while True:
        buf = []
        pieces_e, pieces_l = [], []
        while len(buf) < B and not exhausted:
            if cur is None:
                try:
                    blk = next(it)
                    e, ln = batching.ends_batch_flat(blk.codes, blk.offs,
                                                     cfg.no_bp)
                    cur = [blk, e, ln, 0]
                except StopIteration:
                    exhausted = True
                    break
            blk, e, ln, pos = cur
            take = min(B - len(buf), len(blk) - pos)
            pieces_e.append(e[pos:pos + take])
            pieces_l.append(ln[pos:pos + take])
            for j in range(pos, pos + take):
                buf.append((0, fq, order0 + j, blk.ids[j], blk, j))
            cur[3] = pos + take
            if cur[3] >= len(blk):
                order0 += len(blk)
                cur = None
        if not buf:
            break
        n = len(buf)
        ends = np.full((B, 2, cfg.no_bp), 0xFF, np.uint8)
        ends_len = np.zeros(B, np.int32)
        ends[:n] = np.concatenate(pieces_e, axis=0)
        ends_len[:n] = np.concatenate(pieces_l)
        batching.pack_codes(ends.reshape(B * 2, -1))
    glob_s = time.time() - t0

    out = {
        "host_reads_per_s": round(reads / asm_s),
        "host_mbps": round(bases / asm_s / 1e6, 1),
        "reads": reads,
        "mean_read_bp": round(bases / max(1, reads)),
        "stage": {
            "parse_encode_reads_per_s": round(reads / parse_s),
            "parse_encode_mbps": round(bases / parse_s / 1e6, 1),
            "batch_assembly_overhead_s": round(asm_s - parse_s, 2),
            "global_assembly_reads_per_s": round(reads / glob_s),
            "global_vs_files_ratio": round(glob_s / asm_s, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
