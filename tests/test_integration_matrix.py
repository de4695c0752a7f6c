"""Combined-feature integration net: the streamed engine with every
round-4 subsystem active at once (multi-telophrase sweep + encoded-
block cache + reader-thread pool + native IO auto + small batches that
force multi-block streaming) must stay byte-identical to the host
oracle.  Catches interaction bugs that per-feature tests cannot."""

import gzip
import os

import numpy as np
import pytest

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.io.writer import RunLog
from topsicle_tpu.pipeline import make_engine


def _cohort(tmp_path, n_files=2, reads_per_file=14):
    rng = np.random.default_rng(77)
    bases = np.array(list("ACGT"))
    d = tmp_path / "in"
    d.mkdir()
    for f in range(n_files):
        path = d / f"s{f}.fastq.gz"
        with gzip.open(path, "wt") as fh:
            for i in range(reads_per_file):
                L = int(rng.integers(9200, 12000))
                seq = rng.choice(bases, L)
                kind = rng.random()
                if kind < 0.55:
                    tl = int(rng.integers(400, 1800))
                    tract = np.array(list(("CCCTAA" * 400)[:tl]))
                    noise = rng.random(tl) < 0.05
                    tract[noise] = rng.choice(bases, int(noise.sum()))
                    seq[:tl] = tract
                elif kind < 0.75:
                    tl = int(rng.integers(400, 1800))
                    tract = ("CCCTAA" * 400)[:tl]
                    rc = tract.translate(str.maketrans("ACGT", "TGCA"))[::-1]
                    seq[L - tl:] = np.array(list(rc))
                if kind > 0.9:
                    seq[100:103] = "N"      # force a dense-wire batch
                fh.write(f"@r{f}_{i}\n{''.join(seq)}\n+\n{'I' * L}\n")
    return d


def test_all_features_vs_oracle(tmp_path, monkeypatch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    indir = _cohort(tmp_path)
    monkeypatch.setenv("TOPSICLE_BLOCK_CACHE_MB", "64")

    kw = dict(input_dir=str(indir), pattern="CCCTAA", telophrase=[4, 5],
              maxlengthtelo=2048, batch_size=8)
    oj = tmp_path / "jax"
    cfg_j = TopsicleConfig(output_dir=str(oj), engine="jax", threads=3, **kw)
    make_engine(cfg_j, log=RunLog(str(oj), echo=False)).run()

    oo = tmp_path / "oracle"
    cfg_o = TopsicleConfig(output_dir=str(oo), engine="oracle", **kw)
    make_engine(cfg_o, log=RunLog(None, echo=False)).run()

    assert (oj / "telolengths_all.csv").read_bytes() == \
        (oo / "telolengths_all.csv").read_bytes()
    # subset artifacts byte-match too
    subs_j = sorted(p.name for p in oj.glob("*_trc_over_*"))
    subs_o = sorted(p.name for p in oo.glob("*_trc_over_*"))
    assert subs_j == subs_o and subs_j
    for name in subs_j:
        assert (oj / name).read_bytes() == (oo / name).read_bytes()
    # the block cache was active and cleaned up
    assert not os.path.isdir(str(oj / ".blockcache"))
