#!/usr/bin/env python
"""CONN -> UONN transfer-learning driver (reference ``testing_pre_train.py``).

Loads trained CONN weights into a UONN and runs the fa_w ramp recipe.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiude_tpu.train.experiment import run_transfer
from fiude_tpu.utils.config import ExperimentConfig, grid
from fiude_tpu.utils.ledger import Ledger
from fiude_tpu.parallel.sweep import run_work_queue


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--regions", nargs="+", default=["US", "state", "hhs"])
    ap.add_argument("--seasons", nargs="+", type=int,
                    default=[2015, 2016, 2017, 2018])
    ap.add_argument("--nums", nargs="+", type=int, default=[1, 2, 3, 4, 5])
    ap.add_argument("--window", type=int, default=28)
    ap.add_argument("--gamma", type=int, default=28)
    ap.add_argument("--final-epochs", type=int, default=100)
    ap.add_argument("--work-dir", default=".")
    args = ap.parse_args()

    configs = grid(region=args.regions, test_season=args.seasons,
                   num=args.nums, ode_name=["UONN"],
                   window_size=[args.window], gamma=[args.gamma])
    ledger = Ledger(os.path.join(args.work_dir, "started.txt"))

    def worker(cfg):
        load_prefix = os.path.join(
            args.work_dir, "weights",
            f"{cfg.region}/CONN/{cfg.test_season}_{cfg.num}_")
        tr = run_transfer(cfg, load_prefix=load_prefix,
                          data_root=args.data_root, synthetic=args.synthetic,
                          weights_root=args.work_dir,
                          final_epochs=args.final_epochs)
        return {"loss": tr.history.epoch_history[-1]["loss"]}

    run_work_queue(configs, worker, ledger=ledger,
                   key_fn=lambda c: f"weights/{c.region}/pre_trained_UONN/"
                                    f"{c.test_season}_{c.num}_")


if __name__ == "__main__":
    main()
