#!/usr/bin/env python
"""Baseline model CLI — TPU-native counterpart of reference model/cvig_baseline.py.

Usage (same flags as the reference, cvig_baseline.py:478-492):
    python -m witw_tpu.cli.cvig_baseline --mode {train,test} --dataset {cvusa,witw}
"""

from witw_tpu.cli.common import apply_overrides, base_parser, run_test, run_train
from witw_tpu.configs import baseline_experiment


def main(argv=None):
    args = base_parser(with_fov=False).parse_args(argv)
    cfg = apply_overrides(baseline_experiment(dataset=args.dataset), args)
    tag = f"baseline_{args.dataset}"
    if args.mode == "train":
        run_train(cfg, tag, num_epochs=args.epochs, profile_dir=args.profile_dir)
    else:
        run_test(cfg, tag)


if __name__ == "__main__":
    main()
