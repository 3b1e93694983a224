"""Single CLI replicating every reference Makefile workload (SURVEY.md §1 L5).

    python -m solver_in_the_loop_tpu <command> [args...]

Commands map 1:1 onto the reference's per-scenario scripts; see the repo
Makefile for the full data-gen -> train -> test DAG with reference-parity
hyperparameters.
"""

from __future__ import annotations

import sys


COMMANDS = {
    "karman-gen": ("solver_in_the_loop_tpu.apps.karman_gen", "karman data generation"),
    "karman-train": ("solver_in_the_loop_tpu.apps.karman_train", "karman SOL/NON training"),
    "karman-apply": ("solver_in_the_loop_tpu.apps.karman_apply", "karman test rollout"),
    "karman-pre-gen": ("solver_in_the_loop_tpu.apps.karman_pre_gen", "karman PRE data generation"),
    "karman-pre-train": ("solver_in_the_loop_tpu.apps.pre_train", "karman PRE supervised training"),
    "karman-pre-apply": ("solver_in_the_loop_tpu.apps.karman_pre_apply", "karman PRE rollout"),
    "burgers-gen": ("solver_in_the_loop_tpu.apps.burgers_gen", "burgers data generation"),
    "burgers-train": ("solver_in_the_loop_tpu.apps.burgers_train", "burgers SOL/NON training"),
    "burgers-apply": ("solver_in_the_loop_tpu.apps.burgers_apply", "burgers test rollout"),
    "burgers-pre-gen": ("solver_in_the_loop_tpu.apps.burgers_pre_gen", "burgers PRE data generation"),
    "burgers-pre-train": ("solver_in_the_loop_tpu.apps.pre_train", "burgers PRE supervised training"),
    "burgers-pre-apply": ("solver_in_the_loop_tpu.apps.burgers_pre_apply", "burgers PRE rollout"),
    "evaluate": ("solver_in_the_loop_tpu.apps.evaluate", "rollout MAE vs reference trajectory"),
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        for name, (_mod, desc) in COMMANDS.items():
            print(f"  {name:20s} {desc}")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command '{cmd}'; run with --help", file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(COMMANDS[cmd][0])
    if cmd in ("karman-pre-train", "burgers-pre-train"):
        mod.main(rest, scenario=cmd.split("-")[0])
    else:
        mod.main(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
