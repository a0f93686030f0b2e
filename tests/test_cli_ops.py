"""CLI spmv/spmm operation benchmarks."""
import json

from benchmark_spgemm_using_csr_tpu.cli import main


def test_cli_spmv(capsys):
    rc = main(["gen:er:256", "--op", "spmv", "--runs", "1", "--warmup", "0", "--json"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["op"] == "spmv" and rec["verified"] is True


def test_cli_spmm(capsys):
    rc = main(
        ["gen:er:256", "--op", "spmm", "--spmm-k", "16", "--runs", "1",
         "--warmup", "0", "--json"]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["op"] == "spmm" and rec["verified"] is True


def test_cli_spadd(capsys):
    rc = main(
        ["gen:er:256", "--op", "spadd", "--runs", "1", "--warmup", "0",
         "--json"]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["op"] == "spadd" and rec["verified"] is True


def test_cli_sptrsv(capsys):
    rc = main(
        ["gen:er:256", "--op", "sptrsv", "--runs", "1", "--warmup", "0",
         "--json"]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["op"] == "sptrsv" and rec["verified"] is True
    assert rec["n_levels"] >= 1
