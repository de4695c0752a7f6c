"""Encoded-block cache (io/blockcache.py): multi-telophrase runs parse
each input once and replay identical blocks for later phrases."""

import os

import numpy as np
import pytest

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.io import blockcache
from topsicle_tpu.io.writer import RunLog
from topsicle_tpu.pipeline import JaxEngine


def _input(tmp_path, n=3):
    rng = np.random.default_rng(21)
    p = tmp_path / "in"
    p.mkdir(exist_ok=True)
    f = p / "reads.fastq"
    with open(f, "w") as fh:
        for i in range(n):
            seq = ("CCCTAA" * 300)[:1400] + "".join(rng.choice(list("ACGT"), 9300))
            fh.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    return p, f


def _mk_budget(n):
    state = {"left": n}

    def reserve(k):
        if state["left"] >= k:
            state["left"] -= k
            return True
        return False

    def refund(k):
        state["left"] += k

    return reserve, refund, state


def test_roundtrip_and_invalidation(tmp_path):
    _, f = _input(tmp_path)
    out = str(tmp_path / "o")
    reserve, refund, _ = _mk_budget(10 << 20)
    w = blockcache.BlockCacheWriter(out, str(f), 9000, 8, reserve, refund)
    blocks = [(["a", "b"], np.arange(20, dtype=np.uint8),
               np.array([0, 8, 20], np.int64)),
              (["c"], np.arange(5, dtype=np.uint8), np.array([0, 5], np.int64))]
    for ids, codes, offs in blocks:
        assert w.add(ids, codes, offs)
    assert w.commit() > 0
    got = list(blockcache.open_cached_blocks(out, str(f), 9000, 8))
    assert len(got) == 2
    for (wi, wc, wo), (gi, gc, go) in zip(blocks, got):
        assert gi == wi
        np.testing.assert_array_equal(gc, wc)
        np.testing.assert_array_equal(go, wo)
    # different parameters or a touched input invalidate
    assert blockcache.open_cached_blocks(out, str(f), 9001, 8) is None
    assert blockcache.open_cached_blocks(out, str(f), 9000, 16) is None
    os.utime(f, ns=(1, 1))
    assert blockcache.open_cached_blocks(out, str(f), 9000, 8) is None


def test_budget_abandons_cleanly_and_refunds(tmp_path):
    _, f = _input(tmp_path)
    out = str(tmp_path / "o")
    reserve, refund, state = _mk_budget(10)
    w = blockcache.BlockCacheWriter(out, str(f), 9000, 8, reserve, refund)
    assert not w.add(["a"], np.arange(999, dtype=np.uint8),
                     np.array([0, 999], np.int64))
    assert w.exhausted
    assert w.commit() == 0
    assert state["left"] == 10                     # reservation refunded
    assert blockcache.open_cached_blocks(out, str(f), 9000, 8) is None
    if os.path.isdir(blockcache.cache_dir(out)):
        assert not os.listdir(blockcache.cache_dir(out))


def test_engine_reuse_resets_budget(tmp_path, monkeypatch):
    """bench.py runs one engine twice (cold/warm); the second run must
    start with a fresh cache budget — run 1's reservations die with its
    end-of-run clear — and produce a byte-identical CSV."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    indir, _ = _input(tmp_path)
    monkeypatch.setenv("TOPSICLE_BLOCK_CACHE_MB", "64")
    cfg = TopsicleConfig(
        input_dir=str(indir), output_dir=str(tmp_path / "r1"),
        pattern="CCCTAA", telophrase=[4, 5], batch_size=8,
        maxlengthtelo=2048)
    eng = JaxEngine(cfg, log=RunLog(None, echo=False))
    eng.run()
    budget_after_1 = eng._bc_left
    cfg.output_dir = str(tmp_path / "r2")
    eng.run()
    assert eng._bc_left == budget_after_1     # run 2 re-reserved from full
    a = (tmp_path / "r1" / "telolengths_all.csv").read_bytes()
    b = (tmp_path / "r2" / "telolengths_all.csv").read_bytes()
    assert a == b
    for r in ("r1", "r2"):
        assert not os.path.isdir(str(tmp_path / r / ".blockcache"))


def test_truncated_entry_detected_by_sentinel(tmp_path):
    """An entry truncated AFTER commit (rename survived a crash, data
    blocks didn't) must not replay as a clean short stream — that would
    silently drop the file's tail reads for later telophrases."""
    _, f = _input(tmp_path)
    out = str(tmp_path / "o")
    reserve, refund, _ = _mk_budget(10 << 20)
    w = blockcache.BlockCacheWriter(out, str(f), 9000, 8, reserve, refund)
    for i in range(3):
        w.add([f"x{i}"], np.arange(50, dtype=np.uint8),
              np.array([0, 50], np.int64))
    assert w.commit() > 0
    entry = blockcache._entry_path(out, str(f))
    data = open(entry, "rb").read()
    open(entry, "wb").write(data[: len(data) - 15])   # cut the sentinel
    it = blockcache.open_cached_blocks(out, str(f), 9000, 8)
    with pytest.raises(Exception):
        list(it)


def test_corrupt_replay_drops_entry_then_reparses(tmp_path, monkeypatch):
    """A cache entry corrupted after commit surfaces as InputFileError
    (loud unit failure, like any unreadable input), the entry is
    dropped, and the next iteration re-parses the real input."""
    import pickle

    import jax

    jax.config.update("jax_platforms", "cpu")
    indir, f = _input(tmp_path)
    monkeypatch.setenv("TOPSICLE_BLOCK_CACHE_MB", "64")
    out = tmp_path / "oc"
    cfg = TopsicleConfig(
        input_dir=str(indir), output_dir=str(out), pattern="CCCTAA",
        telophrase=[4, 5], batch_size=8, maxlengthtelo=2048)
    eng = JaxEngine(cfg, log=RunLog(None, echo=False))
    entry = blockcache._entry_path(str(out), str(f))
    os.makedirs(os.path.dirname(entry), exist_ok=True)
    with open(entry, "wb") as fh:
        pickle.dump(blockcache._header(str(f), 9000, 8), fh)
        fh.write(b"\x80garbage-not-a-pickle")

    from topsicle_tpu.io import reader

    with pytest.raises(reader.InputFileError):
        list(eng._iter_blocks(str(f)))
    assert not os.path.exists(entry)              # entry dropped
    blocks = list(eng._iter_blocks(str(f)))       # re-parses fine
    assert sum(len(b) for b in blocks) == 3


def test_multik_parses_once_and_matches_uncached(tmp_path, monkeypatch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    indir, _ = _input(tmp_path)

    calls = {"n": 0}
    real = JaxEngine._parse_blocks

    def counting(self, path):
        calls["n"] += 1
        return real(self, path)

    monkeypatch.setattr(JaxEngine, "_parse_blocks", counting)

    def run(outdir, cache_mb):
        monkeypatch.setenv("TOPSICLE_BLOCK_CACHE_MB", cache_mb)
        calls["n"] = 0
        cfg = TopsicleConfig(
            input_dir=str(indir), output_dir=str(tmp_path / outdir),
            pattern="CCCTAA", telophrase=[4, 5], batch_size=8,
            maxlengthtelo=2048)
        JaxEngine(cfg, log=RunLog(None, echo=False)).run()
        return calls["n"], (tmp_path / outdir / "telolengths_all.csv").read_bytes()

    n_cached, csv_cached = run("oc", "64")
    n_plain, csv_plain = run("op", "0")
    assert csv_cached == csv_plain           # byte-identical outputs
    assert n_plain == 2                      # one parse per phrase
    assert n_cached == 1                     # phrase 2 replayed the cache
    assert not os.path.isdir(blockcache.cache_dir(str(tmp_path / "oc")))
