"""One-off: lean-XLA vs fused-Pallas step-2 resident comparison +
larger-n warm e2e. Records go to BASELINE.md."""
import os, sys, time, tempfile
import numpy as np

sys.path.insert(0, "/root/repo")
from topsicle_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax, jax.numpy as jnp
from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import telophrase_kmers
from topsicle_tpu.models import TelomereScanModel
from topsicle_tpu.models.telomere import (_step2_boundary_lean,
                                          _step2_boundary_pallas_lean)
from bench import make_reads

model = TelomereScanModel(telophrase_kmers("CCCTAAA", 5), window_size=100, slide=6)
B, no_bp, mlt = 128, 1000, 20000
k = 5
rng = np.random.default_rng(42)
reads = make_reads(rng, B, mlt)
tails = [batching.extract_tail(r, "forward", 100, mlt) for r in reads]
tc, lens = batching.tails_batch(tails, mlt - 100)
Lpad = tc.shape[1]
nw = batching.window_counts_for_lengths(lens, 100, 6).astype(np.int32)

pl_ = batching.pack_tails_phase_planar_lean(tc, k, 100, 6)
px = batching.pack_codes(tc)


def chain(which):
    def f(pl_, px, lens2d, lens1d, nw, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            if which == "pallas":
                t, _ = _step2_boundary_pallas_lean(
                    pl_ ^ x, lens2d, nw, table, k=k, K=model.K,
                    window_size=100, slide=6, L=Lpad, jump=5, min_size=2)
            else:
                t, _ = _step2_boundary_lean(
                    px ^ x, lens1d, nw, table, k=k, window_size=100,
                    slide=6, jump=5, min_size=2)
            return acc + jnp.sum(t) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f)


args = (jnp.asarray(pl_), jnp.asarray(px),
        jnp.asarray(lens.astype(np.int32).reshape(-1, 1)),
        jnp.asarray(lens.astype(np.int32)), jnp.asarray(nw), model.table)
for which in ("pallas", "xla"):
    c = chain(which)
    t0 = time.time(); np.asarray(c(*args, jnp.int32(1)))
    print(f"[{which}] first: {time.time()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time(); np.asarray(c(*args, jnp.int32(4))); d4 = time.time()-t0
        t0 = time.time(); np.asarray(c(*args, jnp.int32(68))); d68 = time.time()-t0
        per = (d68-d4)/64
        best = per if best is None else min(best, per)
    print(f"[{which}] step-2 only: {best*1e3:.2f} ms/iter = "
          f"{B*Lpad/best/1e6:.0f} Mbp/s", flush=True)

# larger warm e2e
from benchmarks.e2e_cli import make_fastq
from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.io.writer import RunLog
from topsicle_tpu.pipeline import JaxEngine

n = 5000
tmp = tempfile.mkdtemp()
fq = os.path.join(tmp, "synthetic.fastq.gz")
make_fastq(fq, n)
cfg = TopsicleConfig(input_dir=fq, output_dir=os.path.join(tmp, "o1"),
                     pattern="CCCTAAA", slide=6)
eng = JaxEngine(cfg, log=RunLog(None, echo=False))
t0 = time.time(); eng.run(); cold = time.time()-t0
cfg.output_dir = os.path.join(tmp, "o2")
t0 = time.time(); eng.run(); warm = time.time()-t0
print(f"[e2e n={n}] cold {cold:.1f}s, warm {warm:.1f}s = {n/warm:.0f} reads/s",
      flush=True)
