"""Hyperparameter evaluation backends for the PSO outer loop.

Reference protocol (pso.py:314-358): write a temp config with
exp=pso_eval_{id}, num_epoch=1 → train → score → cleanup. Two backends:

  * in-process (default): calls ddgan_tpu.train.train directly — one JAX
    runtime, no subprocess respawn/recompile per particle. TPU-friendly.
  * subprocess: shells out to train_ddgan.py / test_ddgan.py exactly like
    the reference (pso.py:386-402, :446-458) — kept for CLI parity and
    for multi-host isolation.
"""

from __future__ import annotations

import logging
import os
import random
import shutil
import sys
from typing import Callable, Dict

from ..config import Config, load_json_to_dict, save_dict_to_json
from ..utils import run_bash_command
from .scoring import combined_score, compute_loss, loss_stability_score

logger = logging.getLogger("ddgan_tpu.pso")


def prepare_config(
    base_config_path: str, hyperparams: Dict, unique_id: int, num_epoch: int = 1
):
    """Temp config with exp=pso_eval_{id} and a short num_epoch —
    1 for the pso.py surface (pso.py:362-383), 5 for the pso-optim.py
    surface (pso-optim.py:366)."""
    config = load_json_to_dict(base_config_path)
    config.update(hyperparams)
    config["exp"] = f"pso_eval_{unique_id}"
    config["num_epoch"] = int(num_epoch)
    config["seed"] = config.get("seed", 42)
    new_path = f"./configs/config_{unique_id}.json"
    save_dict_to_json(config, new_path)
    return new_path, config


def cleanup_experiment(config: Dict, unique_id: int) -> None:
    """Remove temp experiment dirs/configs. (pso.py:488-515)"""
    exp_path = os.path.join("./saved_info/dd_gan", str(config["dataset"]), str(config["exp"]))
    if os.path.exists(exp_path):
        shutil.rmtree(exp_path)
    gen_dir = os.path.join(
        config.get("save_dir", "."), f"generated_samples_{config['exp']}"
    )
    if os.path.exists(gen_dir):
        shutil.rmtree(gen_dir)
    for p in (f"./configs/config_{unique_id}.json",
              os.path.join("./saved_info/", f"fid_score_{unique_id}.txt")):
        if os.path.exists(p):
            os.remove(p)


def make_evaluator(
    base_config_path: str = "./configs/config.json",
    mode: str = "inprocess",
    scoring: str = "stability",
    with_fid: bool = False,
    eval_num_epoch: int = 1,
) -> Callable[[Dict, int], float]:
    """Build evaluate(position, seed) -> score.

    scoring: 'stability' (pso-optim.py variant) or 'combined'
    (pso.py variant: 0.5 loss + 0.5 FID).
    eval_num_epoch: epochs per particle evaluation (pso.py uses 1,
    pso-optim.py uses 5 — pso-optim.py:366).
    """

    def evaluate(hyperparams: Dict, seed: int) -> float:
        unique_id = random.randint(0, int(1e6))
        config_path, config = prepare_config(
            base_config_path, hyperparams, unique_id, num_epoch=eval_num_epoch
        )
        exp_path = os.path.join(
            "./saved_info/dd_gan", str(config["dataset"]), str(config["exp"])
        )
        os.makedirs(exp_path, exist_ok=True)
        try:
            if mode == "subprocess":
                run_bash_command(
                    f"{sys.executable} train_ddgan.py --use_config_file True "
                    f"--config_file {config_path}"
                )
            else:
                from ..train import train

                cfg = Config.from_dict({**config, "seed": seed})
                train(cfg)

            if scoring == "stability":
                score = loss_stability_score(exp_path)
            else:
                loss_score = compute_loss(exp_path)
                fid_score = _compute_fid(config, unique_id) if with_fid else 0.0
                score = combined_score(
                    loss_score, fid_score,
                    config.get("loss_min", 0), config.get("loss_max", 1),
                    config.get("fid_min", 0), config.get("fid_max", 300),
                )
        except Exception as e:  # noqa: BLE001 - failed eval → inf (pso.py:352-354)
            logger.error(f"Evaluation failed: {e}")
            score = float("inf")
        finally:
            cleanup_experiment(config, unique_id)
        return score

    return evaluate


def _compute_fid(config: Dict, unique_id: int) -> float:
    """FID via the sampling CLI. (pso.py:425-466)"""
    save_dir = config.get("save_dir", ".")
    real_img_dir = os.path.join(save_dir, "real_images")
    gen_dir = os.path.join(save_dir, f"generated_samples_{config['exp']}")
    os.makedirs(gen_dir, exist_ok=True)
    if not os.path.isdir(real_img_dir) or len(os.listdir(real_img_dir)) < 100:
        if config.get("path_to_slices_info"):
            from ..data import load_slice_info
            from ..data.converters import nii_to_png

            nii_to_png(
                load_slice_info(config["path_to_slices_info"]),
                save_dir=real_img_dir,
                lim=1000,
                do_resize_to=(int(config["image_size"]), int(config["image_size"])),
            )
        else:
            raise FileNotFoundError("Path to slices info is not specified in the config.")

    fid_file = os.path.join("./saved_info/", f"fid_score_{unique_id}.txt")
    run_bash_command(
        f"{sys.executable} test_ddgan.py --epoch_id {config['num_epoch']} "
        f"--generated_samples_dir {gen_dir} --dataset {config['dataset']} "
        f"--exp {config['exp']} --real_img_dir {real_img_dir} --compute_fid "
        f"--fid_output_path {fid_file}"
    )
    if os.path.exists(fid_file):
        with open(fid_file) as f:
            return float(f.readline().strip())
    return float("inf")
