"""Cost model of host->device transfers through the tunnel: fixed
per-put latency vs bandwidth.  Cycles fresh buffers to defeat any
same-buffer caching (diagnostics only)."""
import sys, time
import numpy as np
import jax


def loop(label, thunks, iters=24, depth=4):
    outs = []
    for t in thunks[:2]:
        outs.append(t())
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(thunks[i % len(thunks)]())
        if len(outs) > depth:
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"[putmodel] {label}: {dt:.2f} ms/iter", file=sys.stderr, flush=True)


def main():
    print(f"[putmodel] device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    for size in (1 << 10, 1 << 17, 1 << 20, 1 << 22):
        bufs = [rng.integers(0, 255, size, dtype=np.uint8) for _ in range(8)]
        loop(f"1 put of {size>>10}KB", [lambda b=b: jax.device_put(b) for b in bufs])
    # 5 puts totalling 1MB vs 1 put of 1MB
    five = []
    for _ in range(8):
        bufs = [rng.integers(0, 255, 1 << 18 if i == 0 else 1 << 16, dtype=np.uint8)
                for i in range(5)]
        five.append(lambda bs=bufs: [jax.device_put(b) for b in bs])
    loop("5 puts ~0.5MB total", five)


if __name__ == "__main__":
    main()
