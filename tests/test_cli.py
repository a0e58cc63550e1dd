"""CLI drivers: flag parsing and end-to-end runs on tiny lattices."""

import os

import numpy as np
import pytest

from mugiq_tpu.cli import eigensolve as cli_eig
from mugiq_tpu.cli import loop as cli_loop
from mugiq_tpu.cli.common import read_momenta_file


def test_momenta_file(tmp_path):
    p = tmp_path / "moms.txt"
    p.write_text("0 0 0\n1 0 0\n-1 2 3\n")
    assert read_momenta_file(str(p)) == [(0, 0, 0), (1, 0, 0), (-1, 2, 3)]
    bad = tmp_path / "bad.txt"
    bad.write_text("1 2\n")
    with pytest.raises(ValueError):
        read_momenta_file(str(bad))


def test_eigensolve_cli(tmp_path, capsys):
    out = str(tmp_path / "evecs.h5")
    rc = cli_eig.main([
        "--dims", "4", "4", "4", "4", "--gauge", "unit",
        "--kappa", "0.12", "--eig-nev", "4", "--eig-nkr", "20",
        "--eig-tol", "1e-8", "--prec", "double", "--platform", "cpu",
        "--eig-vec-outfile", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
    from mugiq_tpu.io.gauge_io import load_evecs
    evecs, evals, sigma, _, attrs = load_evecs(out)
    assert evecs.shape == (4, 4, 4, 4, 4, 4, 3)
    assert np.all(evals.real > 0)
    assert attrs["kappa"] == "0.12"


def test_eigensolve_cli_mg(tmp_path):
    rc = cli_eig.main([
        "--dims", "4", "4", "4", "4", "--gauge", "weak:0.2",
        "--kappa", "0.12", "--eig-nev", "3", "--eig-nkr", "16",
        "--prec", "double", "--platform", "cpu",
        "--mugiq-use-mg", "yes", "--mg-levels", "2",
        "--mg-block-size", "2", "2", "2", "2", "--mg-nvec", "4",
        "--mg-setup-iters", "15",
    ])
    assert rc == 0


def test_loop_cli(tmp_path):
    moms = tmp_path / "moms.txt"
    moms.write_text("0 0 0\n1 0 0\n")
    h5 = str(tmp_path / "loops.h5")
    rc = cli_loop.main([
        "--dims", "4", "4", "4", "4", "--gauge", "unit",
        "--kappa", "0.12", "--eig-nev", "3", "--eig-nkr", "16",
        "--prec", "double", "--platform", "cpu",
        "--momenta-filename", str(moms),
        "--loop-do-nonlocal", "yes", "--displace-entry-string", "+z:1,2",
        "--loop-write-mom-space", "yes", "--loop-mom-space-filename", h5,
    ])
    assert rc == 0
    import h5py
    with h5py.File(h5) as f:
        assert "mom_+1_+0_+0" in f
        assert f["mom_+0_+0_+0/disp_+z_2/g5/loop"].shape == (4, 2)


def test_loop_cli_missing_filename(tmp_path):
    with pytest.raises(SystemExit):
        cli_loop.main([
            "--dims", "4", "4", "4", "4", "--platform", "cpu",
            "--loop-write-mom-space", "yes",
        ])
