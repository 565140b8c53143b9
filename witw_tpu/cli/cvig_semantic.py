#!/usr/bin/env python
"""Semantic (5-channel) model CLI — TPU-native counterpart of reference
model/cvig_semantic.py.

Usage (same flags as the reference, cvig_semantic.py:611-632):
    python -m witw_tpu.cli.cvig_semantic --mode {train,test} --dataset {cvusa,witw} --fov {6-360}
"""

from witw_tpu.cli.common import apply_overrides, base_parser, run_test, run_train
from witw_tpu.configs import semantic_experiment


def main(argv=None):
    args = base_parser(with_fov=True).parse_args(argv)
    print(args)
    cfg = apply_overrides(semantic_experiment(dataset=args.dataset, fov=args.fov), args)
    tag = f"semantic_{args.fov}_{args.dataset}"
    if args.mode == "train":
        run_train(cfg, tag, num_epochs=args.epochs, profile_dir=args.profile_dir)
    else:
        run_test(cfg, tag)


if __name__ == "__main__":
    main()
