"""Decompose the bench launch loop (diagnostics only)."""
import sys, time
import numpy as np
import jax

from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import telophrase_kmers
from topsicle_tpu.models import TelomereScanModel
from bench import make_reads


def run_loop(label, launch, variants, iters=20, depth=4):
    outs = []
    for v in variants[:2]:
        outs.append(launch(v))
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(launch(variants[i % len(variants)]))
        if len(outs) > depth:
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"[prof3] {label}: {dt*1e3:.1f} ms/iter", file=sys.stderr, flush=True)
    return dt


def main():
    rng = np.random.default_rng(42)
    B, read_len, no_bp = 128, 20000, 1000
    window_size, slide, trimfirst, mlt = 100, 6, 100, 20000
    model = TelomereScanModel(telophrase_kmers("CCCTAAA", 5),
                              window_size=window_size, slide=slide)
    print(f"[prof3] device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    variants = []
    for v in range(4):
        reads = make_reads(rng, B, read_len)
        ends = np.stack([np.concatenate([r[:no_bp], r[-no_bp:][::-1]]) for r in reads])
        ep, em = batching.pack_batch(ends.reshape(B * 2, no_bp))
        tails = [batching.extract_tail(r, "forward", trimfirst, mlt) for r in reads]
        tail_codes, lens = batching.tails_batch(tails, max(len(t) for t in tails))
        tp, tm = batching.pack_batch(tail_codes)
        nw = batching.window_counts_for_lengths(lens, window_size, slide).astype(np.int32)
        variants.append((ep.reshape(B, 2, -1), em.reshape(B, 2, -1), tp, tm, nw))

    # resident device copies
    dev = [tuple(jax.device_put(a) for a in v) for v in variants]

    def full(v):
        ep, em, tp, tm, nw = v
        c = model._step1(jax.device_put(ep), jax.device_put(em), model.table)
        t, has = model._step2(jax.device_put(tp), jax.device_put(tm),
                              jax.device_put(nw), model.table)
        return c, t, has

    def resident(v):
        ep, em, tp, tm, nw = v
        c = model._step1(ep, em, model.table)
        t, has = model._step2(tp, tm, nw, model.table)
        return c, t, has

    def step1_only(v):
        ep, em, tp, tm, nw = v
        return model._step1(jax.device_put(ep), jax.device_put(em), model.table)

    def step2_only(v):
        ep, em, tp, tm, nw = v
        return model._step2(jax.device_put(tp), jax.device_put(tm),
                            jax.device_put(nw), model.table)

    def puts_only(v):
        return [jax.device_put(a) for a in v]

    run_loop("full launch (puts+1+2)", full, variants)
    run_loop("resident (no puts)", resident, dev)
    run_loop("step1 only (+puts)", step1_only, variants)
    run_loop("step2 only (+puts)", step2_only, variants)
    run_loop("puts only", puts_only, variants)
    run_loop("full depth1", full, variants, depth=1)
    run_loop("full depth8", full, variants, depth=8)


if __name__ == "__main__":
    main()
