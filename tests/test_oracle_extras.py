"""Oracle engine flag extras (--read_check / --rawcountpattern / --plot)
and oracle-vs-jax rawcount equality."""

import pytest

from tests.conftest import requires_demo

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.oracle import OracleEngine
from topsicle_tpu.pipeline import JaxEngine


@requires_demo
def test_oracle_read_check_and_extras(demo_fastq, tmp_path):
    rid = "ERR11436636.206253"
    cfg = TopsicleConfig(
        input_dir=demo_fastq, output_dir=str(tmp_path / "o"), pattern="CCCTAAA",
        slide=6, read_check=rid, rawcountpattern=True, plot=True,
    )
    res = OracleEngine(cfg).run()
    assert len(res) == 1 and res[0].read_id == rid and res[0].telo_length == 1870
    assert (tmp_path / "o" / "rawcount_5_1.csv").exists()
    assert (tmp_path / "o" / "plot_5_1.png").exists()

    # rawcount CSV identical between oracle and jax engines
    cfg_j = TopsicleConfig(
        input_dir=demo_fastq, output_dir=str(tmp_path / "j"), pattern="CCCTAAA",
        slide=6, read_check=rid, rawcountpattern=True, batch_size=8,
    )
    JaxEngine(cfg_j).run()
    assert (tmp_path / "o" / "rawcount_5_1.csv").read_bytes() == \
           (tmp_path / "j" / "rawcount_5_1.csv").read_bytes()


@requires_demo
def test_oracle_read_check_missing_refused(demo_fastq, tmp_path):
    cfg = TopsicleConfig(
        input_dir=demo_fastq, output_dir=str(tmp_path), pattern="CCCTAAA",
        slide=6, read_check="nope",
    )
    with pytest.raises(ValueError):
        OracleEngine(cfg).run()
