"""PSO outer HPO loop tests: particle grid snapping, swarm convergence on
an analytic objective, scoring functions, config prepare/cleanup."""

import json
import os

import numpy as np
import pytest

from ddgan_tpu.pso import PSO, Particle, loss_stability_score, normalize_score
from ddgan_tpu.pso.evaluate import cleanup_experiment, prepare_config
from ddgan_tpu.pso.scoring import combined_score, compute_loss


SPACE = {
    "lr_g": [1e-6, 1e-3],
    "batch_size": [16, 128],
    "step": {"batch_size": 16},
}


def test_particle_respects_grid_and_bounds():
    p = Particle(SPACE, seed=0)
    assert 1e-6 <= p.position["lr_g"] <= 1e-3
    assert p.position["batch_size"] in range(16, 129, 16)
    # after updates, still snapped and clamped
    p.velocity = {"lr_g": 1.0, "batch_size": 1000.0}
    p.update_position(SPACE)
    assert p.position["lr_g"] == 1e-3
    assert p.position["batch_size"] == 128


def test_pso_converges_on_quadratic():
    space = {"x": [-5.0, 5.0], "y": [-5.0, 5.0], "step": {}}

    def evaluate(pos, seed):
        return (pos["x"] - 1.0) ** 2 + (pos["y"] + 2.0) ** 2

    pso = PSO(space, evaluate, num_particles=8, num_iterations=30,
              do_clamping=True, seed=3)
    best = pso.optimize()
    assert abs(best["x"] - 1.0) < 0.5
    assert abs(best["y"] + 2.0) < 0.5
    assert pso.global_best_score < 0.3


def test_scoring_functions(tmp_path):
    assert normalize_score(150, 0, 300) == 0.5
    assert normalize_score(1e9, 0, 300) == 1.0
    assert combined_score(0.5, 150) == 0.5 * 0.5 + 0.5 * 0.5

    # stability score: in-band losses → 0; out-of-band penalized
    losses = [
        {"epoch": 1, "G_loss": 1.2, "D_loss": 1.4},
        {"epoch": 2, "G_loss": 2.0, "D_loss": 2.0},
    ]
    with open(tmp_path / "losses.json", "w") as f:
        json.dump(losses, f)
    score = loss_stability_score(str(tmp_path))
    assert abs(score - (0.0 + (1.0 + 0.7)) / 2) < 1e-9
    assert loss_stability_score(str(tmp_path / "missing")) == float("inf")

    # final_loss.txt reader
    assert compute_loss(str(tmp_path)) == float("inf")
    with open(tmp_path / "final_loss.txt", "w") as f:
        f.write("0.25\n")
    assert compute_loss(str(tmp_path)) == 0.25


def test_prepare_and_cleanup(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("configs")
    base = {"dataset": "synthetic", "exp": "x", "seed": 1, "num_epoch": 99}
    with open("configs/config.json", "w") as f:
        json.dump(base, f)
    path, config = prepare_config("configs/config.json", {"lr_g": 1e-4}, 42)
    assert os.path.exists(path)
    assert config["exp"] == "pso_eval_42"
    assert config["num_epoch"] == 1
    assert config["lr_g"] == 1e-4
    exp_path = os.path.join("saved_info/dd_gan", config["dataset"], config["exp"])
    os.makedirs(exp_path)
    cleanup_experiment(config, 42)
    assert not os.path.exists(path)
    assert not os.path.exists(exp_path)


def _quadratic_eval(position, seed):
    """Module-level (picklable) evaluator for the multiprocessing pool."""
    return (position["lr"] - 0.03) ** 2 + (position["layers"] - 3) ** 2


def test_pso_pool_backend_matches_sequential():
    """The optional multiprocessing pool over particles (reference
    pso.py:263-265): evaluation is deterministic in (position, seed), so
    the pool backend must reach the same trajectory as sequential."""
    space = {"lr": (0.001, 0.1), "layers": (1, 5), "step": {"layers": 1}}

    def run(use_mp):
        pso = PSO(space, _quadratic_eval, num_particles=3, num_iterations=2,
                  seed=7, use_multiprocessing=use_mp)
        best = pso.optimize()
        return best, pso.global_best_score

    best_seq, score_seq = run(False)
    best_mp, score_mp = run(True)
    assert score_mp == score_seq
    assert best_mp == best_seq


def test_pso_optim_preset(tmp_path, monkeypatch):
    """--preset pso-optim (and the root pso-optim.py wrapper) reproduces
    the reference's second HPO entry: stability scoring, FID off,
    num_epoch=5 per evaluation (pso-optim.py:366,396-445,564)."""
    import ddgan_tpu.pso.cli as cli

    monkeypatch.chdir(tmp_path)
    os.makedirs("configs")
    with open("configs/config.json", "w") as f:
        json.dump({"dataset": "synthetic", "exp": "x", "seed": 1}, f)
    with open("configs/space.json", "w") as f:
        json.dump({"lr_g": [1e-5, 1e-3], "step": {}}, f)

    captured = {}

    def fake_make_evaluator(base, mode, scoring, with_fid, eval_num_epoch):
        captured.update(
            scoring=scoring, with_fid=with_fid, eval_num_epoch=eval_num_epoch
        )
        return lambda pos, seed: pos["lr_g"]  # analytic: minimize lr_g

    monkeypatch.setattr(cli, "make_evaluator", fake_make_evaluator)
    best = cli.main(
        ["--preset", "pso-optim", "--search_space", "configs/space.json",
         "--num_particles", "3", "--num_iterations", "2"]
    )
    assert captured == {
        "scoring": "stability", "with_fid": False, "eval_num_epoch": 5
    }
    assert os.path.exists("best_hyperparameters.json")
    assert 1e-5 <= best["lr_g"] <= 1e-3


def test_prepare_config_num_epoch_override(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("configs")
    with open("configs/config.json", "w") as f:
        json.dump({"dataset": "synthetic", "exp": "x"}, f)
    _, config = prepare_config("configs/config.json", {}, 7, num_epoch=5)
    assert config["num_epoch"] == 5
