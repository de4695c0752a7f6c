"""Benchmark: honest device scan throughput + end-to-end engine rate.

Prints ONE JSON line:
  {"metric": "device_scan_throughput", "value": <Mbp/s>, "unit": "Mbp/s",
   "vs_baseline": <value / 0.4>, ...secondary fields...}

Baseline: the reference demo implies ~0.4 Mbp/s end-to-end on one CPU
worker (BASELINE.md).

Measurement integrity (changed 2026-08-20): on this dev environment's
tunneled TPU backend, `jax.block_until_ready` returns without waiting
for execution, so any loop synced with it times *dispatch*, not compute
— the round-1 recorded 27,263 Mbp/s was such an artifact.  Every number
here is now synced by a device->host copy of the results (np.asarray),
the only reliable barrier on this backend.  Two loops:

- device-resident: one jitted program runs `iters` chained
  step1+step2 iterations inside lax.fori_loop (inputs XOR-perturbed by
  the loop index so loop-invariant code motion cannot hoist the work),
  then a single scalar checksum comes back.  Per-iter time is the slope
  between a short and a long chain, so dispatch latency and the D2H
  round trip cancel.
- with transfers: the production launch path (host 2-bit pack ->
  transfer -> both stages -> per-batch result sync) with 4 batches in
  flight, as the engine runs it.

Secondary fields: e2e engine reads/s on a synthetic gzipped FASTQ
(including parse, subset, CSV), and the per-process startup cost
(first-execution server-side compile over the tunnel) measured as
first-call minus steady-state.  Extra diagnostics on stderr.
"""

import json
import os
import sys
import time

import numpy as np


def make_reads(rng, B, L, pattern="CCCTAAA"):
    """Telomere-like synthetic reads, already encoded (codes 0..3)."""
    base = rng.integers(0, 4, (B, L), dtype=np.uint8)
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
    import jax.numpy as jnp

    from topsicle_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from topsicle_tpu.io import batch as batching
    from topsicle_tpu.kmers import telophrase_kmers
    from topsicle_tpu.models import TelomereScanModel
    from topsicle_tpu.models.telomere import (_step1_counts_lean,
                                              _step2_boundary_pallas,
                                              _step2_boundary_lean)

    rng = np.random.default_rng(42)
    B = 128
    read_len = 20000          # ~ONT long read
    no_bp = 1000
    window_size, slide, trimfirst, mlt = 100, 6, 100, 20000
    k = 5

    model = TelomereScanModel(
        telophrase_kmers("CCCTAAA", k), window_size=window_size, slide=slide
    )
    print(f"[bench] device: {jax.devices()[0]}, pallas={model.use_pallas}",
          file=sys.stderr, flush=True)

    # one host batch, production wire formats
    reads = make_reads(rng, B, read_len)
    ends = np.stack([np.concatenate([r[:no_bp], r[-no_bp:][::-1]]) for r in reads])
    ep = batching.pack_codes(ends.reshape(B * 2, no_bp)).reshape(B, 2, -1)
    el = np.full(B, no_bp, np.int32)
    tails = [batching.extract_tail(r, "forward", trimfirst, mlt) for r in reads]
    tail_codes, lens = batching.tails_batch(tails, mlt - trimfirst)
    Lpad = tail_codes.shape[1]
    nw = batching.window_counts_for_lengths(lens, window_size, slide).astype(np.int32)
    bp_per_iter = B * (2 * no_bp + Lpad)

    # ---- device-resident chained loop (see module docstring) -------------
    use_pallas = model.use_pallas
    if use_pallas:
        pp, piv = batching.pack_tails_phase_planar(tail_codes, k, window_size, slide)
    else:
        pp = batching.pack_codes(tail_codes)
        piv = lens.astype(np.int32)

    def resident_iters(ep, el, pp, piv, nw, table, iters):
        def body(i, acc):
            # XOR by (i&1) perturbs real data so the body cannot be
            # hoisted out of the loop; both stages still do full work
            x = jnp.uint8(i & 1)
            c = _step1_counts_lean(ep ^ x, el, table, k=k, greedy="chunked")
            if use_pallas:
                t, _ = _step2_boundary_pallas(
                    pp ^ x, piv, nw, table, k=k, K=model.K,
                    window_size=window_size, slide=slide, L=Lpad,
                    jump=5, min_size=2)
            else:
                t, _ = _step2_boundary_lean(
                    pp ^ x, piv, nw, table, k=k, window_size=window_size,
                    slide=slide, jump=5, min_size=2)
            return acc + jnp.sum(c) + jnp.sum(t) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))

    chain = jax.jit(resident_iters)
    cargs = (jnp.asarray(ep), jnp.asarray(el), jnp.asarray(pp),
             jnp.asarray(piv), jnp.asarray(nw), model.table)
    t0 = time.time()
    np.asarray(chain(*cargs, jnp.int32(1)))
    startup_s = time.time() - t0
    print(f"[bench] first-call (client+server compile + 1 iter): "
          f"{startup_s:.1f}s", file=sys.stderr, flush=True)

    n_small, n_big = 4, 68
    best = None
    for _ in range(3):
        t0 = time.time(); np.asarray(chain(*cargs, jnp.int32(n_small))); d_s = time.time() - t0
        t0 = time.time(); np.asarray(chain(*cargs, jnp.int32(n_big))); d_b = time.time() - t0
        per = (d_b - d_s) / (n_big - n_small)
        best = per if best is None else min(best, per)
    resident_mbps = bp_per_iter / best / 1e6
    print(f"[bench] device-resident: {best*1e3:.2f} ms/iter = "
          f"{B/best:.0f} reads/s, {resident_mbps:.1f} Mbp/s "
          f"(slope {n_small}->{n_big} iters, best of 3, D2H-synced)",
          file=sys.stderr, flush=True)

    # ---- with transfers: the production launch path ----------------------
    def launch():
        c = model.step1_counts_launch(ends.reshape(B, 2, no_bp), el)
        t, has = model.step2_boundary_launch(tail_codes, nw, lens)
        return c, t, has

    np.asarray(launch()[1])       # warm the launch-path programs
    iters = 16
    best_dt = None
    for _ in range(3):
        t0 = time.time()
        inflight = []
        for _ in range(iters):
            inflight.append(launch())
            if len(inflight) > 4:
                c, t, has = inflight.pop(0)
                np.asarray(c); np.asarray(t)
        for c, t, has in inflight:
            np.asarray(c); np.asarray(t)
        dt = time.time() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    xfer_mbps = bp_per_iter * iters / best_dt / 1e6
    print(f"[bench] with host pack+transfers (tunnel): "
          f"{B*iters/best_dt:.0f} reads/s, {xfer_mbps:.1f} Mbp/s "
          f"({iters} iters pipelined depth 4, best of 3, D2H-synced)",
          file=sys.stderr, flush=True)

    # ---- e2e engine secondary metric --------------------------------------
    e2e = {}
    if os.environ.get("TOPSICLE_BENCH_E2E", "1") not in ("0", "false"):
        import gzip as _gz
        import tempfile

        from benchmarks.e2e_cli import make_fastq
        from topsicle_tpu.config import TopsicleConfig
        from topsicle_tpu.io.writer import RunLog
        from topsicle_tpu.pipeline import JaxEngine

        n_reads = int(os.environ.get("TOPSICLE_BENCH_E2E_READS", "800"))
        tmp = tempfile.mkdtemp()
        fq = os.path.join(tmp, "synthetic.fastq.gz")
        make_fastq(fq, n_reads)
        total_bp = 0
        with _gz.open(fq, "rt") as fh:
            for i, line in enumerate(fh):
                if i % 4 == 1:
                    total_bp += len(line) - 1
        # one engine, two runs: run 1 pays whatever program-load cost the
        # environment charges; run 2 reuses the SAME jitted programs and
        # measures the steady-state engine (what a long job sustains)
        cfg = TopsicleConfig(input_dir=fq, output_dir=os.path.join(tmp, "o1"),
                             pattern="CCCTAAA", slide=6)
        eng = JaxEngine(cfg, log=RunLog(None, echo=False))
        t0 = time.time()
        eng.run()
        cold = time.time() - t0
        cfg.output_dir = os.path.join(tmp, "o2")
        t0 = time.time()
        eng.run()
        warm = time.time() - t0
        e2e = {"e2e_reads_per_s": round(n_reads / warm, 1),
               "e2e_mbps": round(total_bp / warm / 1e6, 2),
               "e2e_wall_s": round(warm, 1),
               "e2e_cold_wall_s": round(cold, 1), "e2e_reads": n_reads}
        print(f"[bench] e2e engine: {n_reads} reads / {total_bp/1e6:.1f} Mbp; "
              f"cold {cold:.1f}s, warm {warm:.1f}s = "
              f"{e2e['e2e_reads_per_s']} reads/s "
              f"(incl. gzip parse, step1, subset, step2, CSV, aggregates)",
              file=sys.stderr, flush=True)

    # Metric history: "scan_throughput" (r1 early, transfer-included) ->
    # "device_scan_throughput" (r1 final; measured with block_until_ready,
    # which this backend does not honor -> values were dispatch rate, not
    # compute) -> same name, D2H-synced slope measurement (2026-08-20).
    print(json.dumps({
        "metric": "device_scan_throughput",
        "value": round(resident_mbps, 1),
        "unit": "Mbp/s",
        "vs_baseline": round(resident_mbps / 0.4, 1),
        "sync": "d2h-chained",
        "transfer_mbps": round(xfer_mbps, 1),
        "startup_s": round(startup_s, 1),
        **e2e,
    }))


if __name__ == "__main__":
    main()
