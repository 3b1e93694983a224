"""Rollout MAE evaluator vs a hand-computed oracle."""

import json

import numpy as np

from solver_in_the_loop_tpu.apps import evaluate
from solver_in_the_loop_tpu.core.resample import downsample_staggered
from solver_in_the_loop_tpu.io.scene import Scene


def test_evaluate_matches_manual_mae(tmp_path, capsys):
    rng = np.random.RandomState(0)
    run_sc = Scene(str(tmp_path / "run" / "sim_000000"))
    ref_sc = Scene(str(tmp_path / "ref" / "sim_000000"))
    n_steps = 3
    maes = []
    for t in range(1, n_steps + 1):
        u_lo = rng.randn(1, 8, 9).astype(np.float32)
        v_lo = rng.randn(1, 9, 8).astype(np.float32)
        u_hi = rng.randn(1, 16, 17).astype(np.float32)
        v_hi = rng.randn(1, 17, 16).astype(np.float32)
        run_sc.write_staggered("velTf", t, u_lo, v_lo)
        ref_sc.write_staggered("velo", 100 + t, u_hi, v_hi)
        u_g, v_g = downsample_staggered(u_hi, v_hi, 2)
        maes.append(0.5 * (np.abs(u_lo - np.asarray(u_g)).mean()
                           + np.abs(v_lo - np.asarray(v_g)).mean()))

    args = evaluate.build_parser().parse_args([
        "--run", run_sc.path, "--ref", ref_sc.path,
        "--ref-offset", "100", "--scale", "2", "--steps", str(n_steps),
    ])
    out = evaluate.run(args)
    np.testing.assert_allclose(out["mae_mean"], np.mean(maes), rtol=1e-5)
    np.testing.assert_allclose(out["mae_final"], maes[-1], rtol=1e-5)
    # prints one JSON line
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["steps"] == n_steps


def test_evaluate_errors_on_no_contiguous_frames(tmp_path):
    """A scene with no frame 1 (empty, or first frame id > 1) must exit loudly
    instead of producing an empty 0-step eval (ADVICE r3 item 1)."""
    import pytest

    run_sc = Scene(str(tmp_path / "run" / "sim_000000"))
    ref_sc = Scene(str(tmp_path / "ref" / "sim_000000"))
    # frames start at 5, not 1 -> no contiguous prefix from 1
    u = np.zeros((1, 8, 9), np.float32)
    v = np.zeros((1, 9, 8), np.float32)
    run_sc.write_staggered("velTf", 5, u, v)
    ref_sc.write_staggered("velo", 105, u, v)
    args = evaluate.build_parser().parse_args([
        "--run", run_sc.path, "--ref", ref_sc.path,
        "--ref-offset", "100", "--scale", "2", "--steps", "3",
    ])
    with pytest.raises(SystemExit):
        evaluate.run(args)
