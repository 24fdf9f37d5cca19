"""Smoke tests for the L7 experiment/figure tooling (reference
``render/gen_table_figs.py`` / ``render/make_vid.py``): the scripts
must parse real-shaped artifacts end-to-end, so refactors of the stat
JSON schema or the OBJ writers can't silently break the pipeline."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cell(root, name, stat, log_lines=()):
    d = os.path.join(root, name)
    os.makedirs(d)
    with open(os.path.join(d, "out.json"), "w") as f:
        json.dump(stat, f)
    with open(os.path.join(d, "log.txt"), "w") as f:
        f.write("\n".join(log_lines) + "\n")
    open(os.path.join(d, "done"), "w").close()


def test_gen_tables_smoke(tmp_path):
    root = str(tmp_path)
    base = {
        "V": 10, "F": 20, "force_rms_recomp": 1e-12, "iter": 2,
        "time_solve": 5.0, "time_solve_warm": 1.0,
        "pade": True,
        "pade_log": [
            {"a_bound": 1.0, "accepted": True, "t_max_a": 1.4},
            {"a_bound": 0.5, "accepted": False,
             "reject": "zero-norm coefficient"},
        ],
    }
    prof = (
        "  sparse_prep: calls=1 tot=0.2000s min=0.2s max=0.2s avg=0.2s",
        "  sparse_solve: calls=19 tot=0.3000s min=0.01s max=0.02s avg=0.015s",
    )
    _write_cell(root, "bob-arap-sanm-gravity", base, prof)
    nop = dict(base, pade=False, iter=3)
    del nop["pade_log"]
    _write_cell(root, "bob-arap-sanm_no_pade-gravity", nop, prof)
    _write_cell(
        root, "bob-arap-baseline-gravity",
        {"V": 10, "F": 20, "force_rms_recomp": 5e-11, "iter": 14,
         "time_solve": 50.0, "time_solve_warm": 10.0},
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_tables.py"),
         root],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert "gmean speedup" in out.stdout and "10.00x" in out.stdout
    assert "Pade benefit" in out.stdout
    assert "1/2 restarts accepted" in out.stdout, out.stdout
    assert "zero-norm coefficient" in out.stdout


def test_make_vid_smoke(tmp_path):
    # two OBJ frames of a moving triangle
    paths = []
    for i in range(2):
        p = tmp_path / f"frame-{i}.obj"
        z = 0.1 * i
        p.write_text(
            "v 0 0 %g\nv 1 0 %g\nv 0 1 %g\nf 1 2 3\n" % (z, z, z)
        )
        paths.append(str(p))
    gif = str(tmp_path / "seq.gif")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_vid.py"),
         *paths, "--out", gif],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(gif) and os.path.getsize(gif) > 100
