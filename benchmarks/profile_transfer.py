"""Transfer/dispatch decomposition experiments (diagnostics only)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, iters=20, warmup=3, sync_each=False):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        if sync_each:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"[prof2] {label}: {dt*1e3:.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    print(f"[prof2] device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    sizes = {
        "ep": (128, 2, 250), "em": (128, 2, 125),
        "tp": (128, 4975), "tm": (128, 2488),
    }
    arrs = {k: rng.integers(0, 255, v, dtype=np.uint8) for k, v in sizes.items()}
    nw = np.full(128, 3300, np.int32)
    total = sum(a.nbytes for a in arrs.values()) + nw.nbytes
    print(f"[prof2] total payload {total/1e6:.2f} MB", file=sys.stderr, flush=True)

    # A: 5 separate device_puts
    timeit("A separate puts x5", lambda: [jax.device_put(a) for a in (*arrs.values(), nw)])
    # B: one pytree put
    timeit("B pytree put", lambda: jax.device_put((*arrs.values(), nw)))
    # C: one concatenated buffer
    flat = np.concatenate([a.reshape(-1) for a in arrs.values()] + [nw.view(np.uint8).reshape(-1)])
    timeit("C concat put (1 buf)", lambda: jax.device_put(flat))
    # D: half-size buffer (what dropping masks would give)
    half = flat[: int(len(flat) * 0.68)].copy()
    timeit("D 0.68x buf put", lambda: jax.device_put(half))
    # E: dispatch-only: tiny jit call, not synced
    f = jax.jit(lambda x: x * 2)
    small = jax.device_put(jnp.zeros((128,), jnp.int32))
    jax.block_until_ready(f(small))
    timeit("E tiny jit call (async)", lambda: f(small))
    timeit("F tiny jit call (sync)", lambda: f(small), sync_each=True)
    # G: put + jit consume + async
    g = jax.jit(lambda *xs: sum(x.astype(jnp.int32).sum() for x in xs))
    jax.block_until_ready(g(*map(jax.device_put, (*arrs.values(), nw))))
    timeit("G put5+jit (async)", lambda: g(*map(jax.device_put, (*arrs.values(), nw))))
    # H: host->device via jnp.asarray inside jit arg (same as put?)
    timeit("H jit on host arrays direct", lambda: g(*arrs.values(), nw))


if __name__ == "__main__":
    main()
