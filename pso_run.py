#!/usr/bin/env python
"""Alternate PSO runner (reference pso_run.py): stringified-bounds search
space JSON, batch_size injected into the int-step grid."""
import argparse
import ast
import json

from ddgan_tpu.pso import PSO, make_evaluator


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--search_space", type=str,
                        default="./search_space_params.json")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_particles", type=int, default=10)
    parser.add_argument("--num_iterations", type=int, default=20)
    args = parser.parse_args(argv)

    with open(args.search_space) as f:
        search_space = json.load(f)
    for key, val in search_space.items():
        if key == "step":
            continue
        if isinstance(val, str):
            search_space[key] = ast.literal_eval(val)
    search_space.setdefault("step", {})["batch_size"] = args.batch_size

    pso = PSO(
        search_space,
        evaluate_fn=make_evaluator(scoring="stability"),
        num_particles=args.num_particles,
        num_iterations=args.num_iterations,
    )
    pso.optimize()
    pso.save_best()


if __name__ == "__main__":
    main()
