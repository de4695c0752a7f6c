"""AOT executable cache: pin compiled TPU programs across processes.

The reference has no compile step (its hot loops run in CPython's regex
engine, allsteps.py:181-187,279-291); a TPU build compiles programs, and
on tunneled/remote TPU deployments the compile *service* charges
1-6 minutes per new program shape at its FIRST EXECUTION per process,
with large variance in both wait time (0.7-674 s observed) and emitted
binary quality (the same byte-identical program has measured 0.32 and
0.47 ms/iter on different draws — BASELINE.md "Measurement
methodology").  JAX's persistent compilation cache cannot help: it only
removes the client-side compile, while the charge is server-side.

This module removes the charge and pins the draw: after a program's
first successful compile, its *compiled executable* is serialized
(jax.experimental.serialize_executable) to a content-addressed file;
every later process deserializes and runs it directly.  Measured on
this environment: a program whose cold first execution charged 124 s
ran in 0.4 s after deserialize_and_load in a fresh process, with
identical results.  A cached good draw stays good forever.

Cache key = SHA-256 of (jax version, backend, device kinds + count,
the lowered StableHLO text).  Hashing the lowered text makes
invalidation automatic and exact: any change to the traced program —
ops code, k-mer table size, array shapes/dtypes, static parameters —
changes the text and therefore the key.  Lowering is client-side and
costs well under a second per shape.

Policy: enabled by default only on the TPU backend (CPU executables
embed host-specific machine features and the CPU tests never pay a
compile service anyway); TOPSICLE_AOT=0 disables, TOPSICLE_AOT=1
forces on (used by the unit tests on CPU).  Any failure anywhere —
serialization unsupported, stale cache file, changed topology — falls
back to the plain jit path silently; the cache is an accelerator, not
a correctness dependency.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
import weakref
from typing import Any, Dict, Optional, Tuple

import numpy as np

_REGISTRY: "weakref.WeakSet[AotJit]" = weakref.WeakSet()


def cache_stats() -> Dict[str, int]:
    """Process-wide tally of how this process's programs were obtained:
    {'disk': loaded from the executable cache, 'compile': compiled (and
    serialized) fresh, 'jit': fell back to plain jit}."""
    stats = {"disk": 0, "compile": 0, "jit": 0}
    for a in list(_REGISTRY):
        for s in a.sources.values():
            stats[s] = stats.get(s, 0) + 1
    return stats


def aot_cache_dir() -> str:
    env = os.environ.get("TOPSICLE_AOT_DIR")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "topsicle_tpu", "aot_cache")


def aot_enabled() -> bool:
    env = os.environ.get("TOPSICLE_AOT")
    if env is not None:
        return env.strip().lower() not in ("", "0", "false", "no")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _topology_tag() -> str:
    import jax

    devs = jax.devices()
    kinds = ",".join(sorted({d.device_kind for d in devs}))
    return f"{jax.__version__}|{jax.default_backend()}|{kinds}|{len(devs)}"


class AotJit:
    """Drop-in for jax.jit with a cross-process executable cache.

    Call semantics match jax.jit (including static_argnames); per
    argument-signature the first call lowers the program, loads a
    serialized executable from disk if one matches, else compiles and
    serializes.  Every subsequent call in the process dispatches the
    memoized executable directly.
    """

    def __init__(self, fn, *, static_argnames: Tuple[str, ...] = (),
                 name: Optional[str] = None, **jit_kwargs):
        import jax

        self._fn = fn
        self._static = tuple(static_argnames) if isinstance(
            static_argnames, (tuple, list)) else (static_argnames,)
        self._jit = jax.jit(fn, static_argnames=self._static or None,
                            **jit_kwargs)
        self._name = name or getattr(fn, "__name__", "fn")
        self._memo: Dict[Any, Any] = {}   # sig -> Compiled | None(fallback)
        self._lock = threading.Lock()
        # observability for tests / bench: how the current memo entries
        # were obtained ("disk" | "compile" | "jit") and which cache
        # file backs each (bench uses this to keep/restore best draws)
        self.sources: Dict[Any, str] = {}
        self.paths: Dict[Any, str] = {}
        _REGISTRY.add(self)

    # -- signature over dynamic args (shape/dtype) + static kwargs --------
    def _sig(self, args, kwargs):
        parts = []
        for a in args:
            shape = getattr(a, "shape", None)
            dtype = getattr(a, "dtype", None)
            if shape is None or dtype is None:
                parts.append(("scalar", repr(a)))
            else:
                parts.append((tuple(shape), str(dtype)))
        statics = tuple(sorted(
            (k, repr(v)) for k, v in kwargs.items() if k in self._static))
        dyn_kw = []
        for k, v in sorted(kwargs.items()):
            if k in self._static:
                continue
            shape = getattr(v, "shape", None)
            dtype = getattr(v, "dtype", None)
            if shape is None or dtype is None:
                # Python scalars: same rule as positional args — an int
                # and a float (or different values with distinct traced
                # types) must not share one memoized executable
                dyn_kw.append((k, ("scalar", repr(v))))
            else:
                dyn_kw.append((k, (tuple(shape), str(dtype))))
        return (tuple(parts), statics, tuple(dyn_kw))

    def _dynamic_kwargs(self, kwargs):
        return {k: v for k, v in kwargs.items() if k not in self._static}

    def _load_or_compile(self, args, kwargs):
        import jax
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        lowered = self._jit.lower(*args, **kwargs)
        key = hashlib.sha256(
            (_topology_tag() + "\x00" + lowered.as_text()).encode()
        ).hexdigest()
        cdir = aot_cache_dir()
        path = os.path.join(cdir, f"{self._name}-{key[:32]}.aot")
        self._last_path = path
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    payload, in_tree, out_tree, dev_ids = pickle.load(fh)
            except Exception:
                payload = None      # corrupt entry: recompile + overwrite
            if payload is not None:
                # deserialize against the executable's original device
                # list: the default (every backend device) makes a
                # 1-device program demand n-device-sharded args
                try:
                    by_id = {d.id: d for d in jax.devices()}
                    exec_devs = [by_id[i] for i in dev_ids]
                    return (
                        deserialize_and_load(
                            payload, in_tree, out_tree,
                            execution_devices=exec_devs),
                        "disk",
                    )
                except Exception:
                    pass
                # second attempt with the library default (all backend
                # devices) — covers executables whose assignment spans
                # devices the recording process could not enumerate
                try:
                    return (
                        deserialize_and_load(payload, in_tree, out_tree),
                        "disk",
                    )
                except Exception:
                    # changed topology / unloadable: fresh compile below
                    pass
        compiled = lowered.compile()
        try:
            payload, in_tree, out_tree = serialize(compiled)
            local = compiled._executable.xla_executable.local_devices()
            if (jax.process_count() > 1
                    and len(local) == len(jax.local_devices())):
                # multi-process GSPMD: the executable's assignment spans
                # every process's devices (our global mesh is always all
                # of jax.devices()), while local_devices() lists only
                # the addressable subset — record the global list so any
                # process can reconstruct the assignment
                dev_ids = [d.id for d in jax.devices()]
            else:
                dev_ids = [d.id for d in local]
            os.makedirs(cdir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree, dev_ids), fh)
            os.replace(tmp, path)   # atomic: concurrent processes race safely
        except Exception:
            pass                    # unserializable backend: still use compiled
        return compiled, "compile"

    def __call__(self, *args, **kwargs):
        if not aot_enabled():
            return self._jit(*args, **kwargs)
        sig = self._sig(args, kwargs)
        exe = self._memo.get(sig, False)
        if exe is False:
            with self._lock:
                exe = self._memo.get(sig, False)
                if exe is False:
                    self._last_path = None
                    try:
                        exe, src = self._load_or_compile(args, kwargs)
                    except Exception:
                        exe, src = None, "jit"
                    if exe is not None and src == "disk":
                        exe = self._validated(exe, sig, args, kwargs)
                        src = self.sources.get(sig, src)
                    self._memo[sig] = exe
                    self.sources.setdefault(sig, src)
                    if self._last_path:
                        self.paths[sig] = self._last_path
        if exe is None:
            return self._jit(*args, **kwargs)
        return exe(*args, **self._dynamic_kwargs(kwargs))

    def _validated(self, exe, sig, args, kwargs):
        """XLA:CPU's AOT loader occasionally deserializes an executable
        that fails at run time ('Function ... not found') even on the
        same machine; the TPU loader has shown no such failures.  On the
        CPU backend, execute the freshly loaded binary once and SYNC
        before trusting it — a failure deletes the stale entry and
        recompiles.  On TPU the load stays async (a synchronous probe
        would stall the engine's warmup-overlap on congested remote
        services for no observed benefit)."""
        import jax

        if jax.default_backend() != "cpu":
            self.sources[sig] = "disk"
            return exe
        try:
            out = exe(*args, **self._dynamic_kwargs(kwargs))
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf)
            self.sources[sig] = "disk"
            return exe
        except Exception:
            try:
                if self._last_path and os.path.exists(self._last_path):
                    os.remove(self._last_path)
            except OSError:
                pass
            try:
                exe, src = self._load_or_compile(args, kwargs)
                self.sources[sig] = src
                return exe
            except Exception:
                self.sources[sig] = "jit"
                return None
