#!/usr/bin/env python
"""VGG16+SAFA model CLI — the tower family BASELINE.json's benchmark configs
name for the baseline model line (global embeddings, Euclidean retrieval).

Usage:
    python -m witw_tpu.cli.cvig_safa --mode {train,test} --dataset {cvusa,witw} --fov {6-360}
"""

from witw_tpu.cli.common import apply_overrides, base_parser, run_test, run_train
from witw_tpu.configs import safa_experiment


def main(argv=None):
    args = base_parser(with_fov=True).parse_args(argv)
    print(args)
    cfg = apply_overrides(safa_experiment(dataset=args.dataset, fov=args.fov), args)
    tag = f"safa_{args.fov}_{args.dataset}"
    if args.mode == "train":
        run_train(cfg, tag, num_epochs=args.epochs, profile_dir=args.profile_dir)
    else:
        run_test(cfg, tag)


if __name__ == "__main__":
    main()
