"""Random hyperparameter search (capability parity with
/root/reference/monoloco/train/hyp_tuning.py:16-126).

Same search space: shuffled grids for sched_gamma/step, batch size, hidden
size, n_stage, and log-uniform lr in [5e-4, 1e-2]; `6 * multiplier` trials;
best kept by validation distance error. Unlike the reference (which samples the
grids but forgets to forward them into Trainer), each trial here actually runs
with its sampled combination.
"""

import copy
import datetime
import json
import logging
import math
import os
import random
import time

import numpy as np

from .trainer import Trainer
from ..models import save_checkpoint


class HypTuning:

    def __init__(self, joints, epochs, monocular=False, dropout=0.2, multiplier=1, r_seed=1):
        self.joints = joints
        self.monocular = monocular
        self.dropout = dropout
        self.num_epochs = epochs
        self.r_seed = r_seed
        dir_out = os.path.join('data', 'models')
        dir_logs = os.path.join('data', 'logs')
        os.makedirs(dir_out, exist_ok=True)
        os.makedirs(dir_logs, exist_ok=True)
        name_out = 'hyp-monoloco-' if monocular else 'hyp-ms-'
        self.path_log = os.path.join(dir_logs, name_out)
        self.path_model = os.path.join(dir_out, name_out)

        logging.basicConfig(level=logging.INFO)
        self.logger = logging.getLogger(__name__)

        random.seed(r_seed)
        np.random.seed(r_seed)
        self.sched_gamma_list = [0.8, 0.9, 1, 0.8, 0.9, 1] * multiplier
        random.shuffle(self.sched_gamma_list)
        self.sched_step = [10, 20, 40, 60, 80, 100] * multiplier
        random.shuffle(self.sched_step)
        self.bs_list = [64, 128, 256, 512, 512, 1024] * multiplier
        random.shuffle(self.bs_list)
        self.hidden_list = [512, 1024, 2048, 512, 1024, 2048] * multiplier
        random.shuffle(self.hidden_list)
        self.n_stage_list = [3, 3, 3, 3, 3, 3] * multiplier
        random.shuffle(self.n_stage_list)
        aa, bb = math.log10(0.0005), math.log10(0.01)
        self.lr_list = [10 ** x for x in np.random.uniform(aa, bb, 6 * multiplier)]

    def train(self, args):
        best_acc_val = 20
        dic_best, dic_err_best, best_model = {}, {}, None
        start = time.time()
        cnt = 0
        for idx, lr in enumerate(self.lr_list):
            trial_args = copy.copy(args)
            trial_args.lr = lr
            trial_args.bs = self.bs_list[idx]
            trial_args.sched_gamma = self.sched_gamma_list[idx]
            trial_args.sched_step = self.sched_step[idx]
            trial_args.hidden_size = self.hidden_list[idx]
            trial_args.n_stage = self.n_stage_list[idx]
            trial_args.no_save = True

            training = Trainer(trial_args)
            best_epoch = training.train()
            dic_err, model = training.evaluate()
            acc_val = dic_err['val']['all']['d']
            cnt += 1
            print(f"Combination number: {cnt}")

            if acc_val < best_acc_val:
                dic_best = {
                    'lr': lr, 'joints': self.joints, 'bs': trial_args.bs,
                    'monocular': self.monocular,
                    'sched_gamma': trial_args.sched_gamma,
                    'sched_step': trial_args.sched_step,
                    'hidden_size': trial_args.hidden_size,
                    'n_stage': trial_args.n_stage,
                    'acc_val': float(acc_val), 'best_epoch': best_epoch,
                    'random_seed': self.r_seed,
                }
                dic_err_best = dic_err
                best_acc_val = acc_val
                best_model = model

        now_time = datetime.datetime.now().strftime("%Y%m%d-%H%M")[2:]
        self.path_model = self.path_model + now_time + '.pkl'
        if best_model is None:
            # Every trial diverged (NaN) or validated above the threshold:
            # keep the last trial so the search still produces an artifact.
            self.logger.warning("No trial beat the %.1f m threshold; "
                                "saving the last trial's model", best_acc_val)
            best_model = model
            dic_best = {'joints': self.joints, 'acc_val': float(acc_val),
                        'random_seed': self.r_seed, 'note': 'no trial under threshold'}
        params, bn_state = best_model
        save_checkpoint(self.path_model, params, bn_state, meta=dic_best)
        with open(self.path_log + now_time, 'w') as f:
            json.dump(dic_best, f)
        end = time.time()
        print('\n\n\n')
        self.logger.info(" Tried %d combinations", cnt)
        self.logger.info(" Total time for hyperparameters search: %.2f minutes", (end - start) / 60)
        self.logger.info(" Best hyperparameters are:")
        for key, value in dic_best.items():
            self.logger.info(" %s: %s", key, value)
        self.logger.info("Final accuracy Val: %.2f", dic_best.get('acc_val', float('nan')))
        self.logger.info("Saved the model: %s", self.path_model)
        return dic_best
