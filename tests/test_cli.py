"""CLI surface: selftest, render, sweep, recover-pose."""

import json
import os
import sys

import numpy as np

from diffus_tpu.cli import main
from diffus_tpu.io import save_nifti
from diffus_tpu.phantoms import t1_phantom_3d


def test_cli_selftest(capsys):
    rc = main(["selftest"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["parity_max_rel_err"] < 1e-3


def test_cli_render_and_sweep(tmp_path, capsys):
    vol_path = os.path.join(str(tmp_path), "t1.nii.gz")
    save_nifti(vol_path, t1_phantom_3d((32, 32, 32)))
    out_path = os.path.join(str(tmp_path), "frame.npy")
    rc = main([
        "render", "--volume", vol_path, "--out", out_path,
        "--source", "16", "1", "16", "--rays", "8", "--samples", "24",
    ])
    assert rc == 0
    frame = np.load(out_path)
    assert frame.shape == (8, 24) and np.all(np.isfinite(frame))

    sweep_path = os.path.join(str(tmp_path), "sweep.npy")
    rc = main([
        "sweep", "--volume", vol_path, "--out", sweep_path,
        "--source", "16", "1", "16", "--rays", "4", "--samples", "16",
        "--poses", "3", "--jitter", "1.0",
    ])
    assert rc == 0
    frames = np.load(sweep_path)
    assert frames.shape == (3, 4, 16)


def test_cli_recover_pose(tmp_path, capsys):
    vol_path = os.path.join(str(tmp_path), "t1.nii.gz")
    save_nifti(vol_path, t1_phantom_3d((24, 24, 24)))
    rc = main([
        "recover-pose", "--volume", vol_path,
        "--true-source", "12", "1", "12", "--source", "13.5", "2.5", "11",
        "--rays", "8", "--samples", "16", "--steps", "60", "--lr", "0.05",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loss_last"] < out["loss_first"]
