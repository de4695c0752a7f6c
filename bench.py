"""Benchmark: end-to-end device scan throughput on synthetic ONT-like
reads (the BASELINE.json primary metric family).

Prints ONE JSON line:
  {"metric": "scan_throughput", "value": <Mbp/s>, "unit": "Mbp/s",
   "vs_baseline": <value / 0.4>}

Baseline: the reference demo implies ~0.4 Mbp/s end-to-end on one CPU
worker (BASELINE.md).  This bench measures the same work per read —
step-1 TRC counting over both 1000-bp ends plus the step-2 windowed
scan + changepoint over up to maxlengthtelo bp — on one chip.

Extra diagnostics go to stderr only.
"""

import json
import sys
import time

import numpy as np


def make_reads(rng, B, L, pattern="CCCTAAA"):
    """Telomere-like synthetic reads, already encoded (codes 0..3)."""
    base = rng.integers(0, 4, (B, L), dtype=np.uint8)
    # plant telomere repeats of random lengths at the start
    pat = np.frombuffer(pattern.encode(), np.uint8)
    lut = np.full(256, 0, np.uint8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    pat_codes = lut[pat]
    telo_lens = rng.integers(500, 5000, B)
    reps = int(np.ceil(telo_lens.max() / len(pat_codes))) + 1
    tiled = np.tile(pat_codes, reps)
    for i in range(B):
        tl = int(telo_lens[i])
        seg = tiled[:tl].copy()
        noise = rng.random(tl) < 0.05
        seg[noise] = rng.integers(0, 4, int(noise.sum()), dtype=np.uint8)
        base[i, :tl] = seg
    return base


def main():
    import jax

    from topsicle_tpu.io import batch as batching
    from topsicle_tpu.kmers import telophrase_kmers
    from topsicle_tpu.models import TelomereScanModel

    rng = np.random.default_rng(42)
    B = 64
    read_len = 20000          # ~ONT long read
    no_bp = 1000
    window_size, slide, trimfirst, mlt = 100, 6, 100, 20000

    model = TelomereScanModel(
        telophrase_kmers("CCCTAAA", 5), window_size=window_size, slide=slide
    )

    reads = make_reads(rng, B, read_len)
    ends = np.stack(
        [np.stack([r[:no_bp], r[-no_bp:][::-1]]) for r in reads]
    ).astype(np.uint8)
    tails = [batching.extract_tail(r, "forward", trimfirst, mlt) for r in reads]
    tail_codes, lens = batching.tails_batch(tails, max(len(t) for t in tails))
    n_windows = batching.window_counts_for_lengths(lens, window_size, slide)

    def step():
        c = model.step1_counts(ends)
        t, has = model.step2_boundary(tail_codes, n_windows)
        return c, t, has

    # compile + warmup
    t0 = time.time()
    step()
    print(f"[bench] compile+warmup {time.time()-t0:.1f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = step()
    dt = time.time() - t0

    bp_per_iter = B * (2 * no_bp + tail_codes.shape[1])
    mbps = bp_per_iter * iters / dt / 1e6
    reads_per_s = B * iters / dt
    print(f"[bench] {reads_per_s:.0f} reads/s, {mbps:.1f} Mbp/s "
          f"({iters} iters, {dt:.2f}s)", file=sys.stderr)

    print(json.dumps({
        "metric": "scan_throughput",
        "value": round(mbps, 1),
        "unit": "Mbp/s",
        "vs_baseline": round(mbps / 0.4, 1),
    }))


if __name__ == "__main__":
    main()
