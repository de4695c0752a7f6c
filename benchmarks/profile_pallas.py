"""Try compiling + timing the Pallas step-2 kernel on the real chip."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from topsicle_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import telophrase_kmers, pack_kmer_table
from topsicle_tpu.ops.pallas_kernels import step2_signal_pallas
import importlib
bench = importlib.import_module("bench")

rng = np.random.default_rng(42)
B, L = 128, 8192
reads = bench.make_reads(rng, B, L)
p, m = batching.pack_tails_phase_planar(reads, 5, 100, 6)
table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))

print(f"[pallas] device: {jax.devices()[0]}, B={B} L={L}", file=sys.stderr, flush=True)
t0 = time.perf_counter()
try:
    y = step2_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                            k=5, K=14, window_size=100, slide=6, L=L)
    jax.block_until_ready(y)
    print(f"[pallas] compile+run OK {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
except Exception as e:
    print(f"[pallas] FAILED after {time.perf_counter()-t0:.1f}s: {type(e).__name__}: {e}",
          file=sys.stderr, flush=True)
    sys.exit(1)

dp, dm = jax.device_put(p), jax.device_put(m)
for trial in range(3):
    t0 = time.perf_counter()
    outs = [step2_signal_pallas(dp, dm, table, k=5, K=14, window_size=100, slide=6, L=L)
            for _ in range(20)]
    jax.block_until_ready(outs)
    print(f"[pallas] resident: {(time.perf_counter()-t0)/20*1e3:.2f} ms/iter",
          file=sys.stderr, flush=True)
print("y[0,:8] =", np.asarray(y)[0, :8], file=sys.stderr)
