#!/usr/bin/env python
"""Training launcher (reference tool/train.py:1-13 + dust3r/training.py CLI).

Example (mirrors train.sh):
  python tool/train.py \
    --train_dataset "1000 @ SceneFlowDatasets(split='train', ROOT='...', resolution=[(512,288)], seed=None)" \
    --test_dataset "100 @ SceneFlowDatasets(split='test', ROOT='...', resolution=[(512,288)], seed=777)" \
    --pretrained dust3r_512.pth --lr 5e-5 --epochs 50 --batch_size 2 --accum_iter 4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from align3r_tpu.training.train import TrainArgs, train


def main():
    p = argparse.ArgumentParser()
    d = TrainArgs()
    p.add_argument("--model", default=d.model)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--train_dataset", required=True)
    p.add_argument("--test_dataset", default="")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--accum_iter", type=int, default=d.accum_iter)
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--min_lr", type=float, default=d.min_lr)
    p.add_argument("--warmup_epochs", type=int, default=d.warmup_epochs)
    p.add_argument("--weight_decay", type=float, default=d.weight_decay)
    p.add_argument("--num_workers", type=int, default=d.num_workers)
    p.add_argument("--output_dir", default=d.output_dir)
    p.add_argument("--eval_freq", type=int, default=d.eval_freq)
    p.add_argument("--save_freq", type=int, default=d.save_freq)
    p.add_argument("--keep_freq", type=int, default=d.keep_freq)
    p.add_argument("--print_freq", type=int, default=d.print_freq)
    p.add_argument("--profile", action="store_true", default=False)
    p.add_argument("--head_bf16", action="store_true", default=False,
                   help="bf16 DPT conv pyramid in the train forward "
                        "(fp32 final conv+postprocess): -20%% step time "
                        "measured on v5e; default keeps the reference "
                        "fp32-head AMP boundary")
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    args = p.parse_args()
    train(TrainArgs(**vars(args)))


if __name__ == "__main__":
    main()
