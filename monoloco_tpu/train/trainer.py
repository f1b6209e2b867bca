"""Training loop: whole-epoch jitted scan over an HBM-resident dataset.

Behavioral parity targets (/root/reference/monoloco/train/trainer.py):
 - tasks ('d','x','y','h','w','l','ori','aux'), aux dropped for mono
   (trainer.py:40-42, 89-91)
 - Adam over model + loss params, lr decayed by `sched_gamma` every
   `sched_step` *batches* (the reference steps StepLR per batch,
   trainer.py:150-161)
 - grad-norm clip 3.0 on the model parameters only (trainer.py:159)
 - best weights kept by validation 'd' loss (trainer.py:173-177)
 - evaluate(): per-cluster stats, bi mean and coverage %, model pickle save
   (trainer.py:199-284)

TPU-first design:
 - The dataset lives in device memory; one epoch = one jitted
   `lax.scan` over shuffled batches (shuffle via jax.random.permutation inside
   the jit). There are zero host->device transfers in the steady state, versus
   the reference's per-batch `.to(device)` copy.
 - Partial final batches are handled with row masks (masked BatchNorm
   statistics + masked loss reductions), keeping every step the same static
   shape: exactly one compile per run.
 - Multi-chip data parallelism: batches shard over the 'data' axis of a
   jax.sharding.Mesh (see monoloco_tpu/parallel). On a single chip the sharding
   is a no-op.
"""

import datetime
import functools
import logging
import math
import os
import time
from collections import defaultdict
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import __version__
from .datasets import KeypointsDataset
from .losses import multitask_loss, composite_losses, LOSS_TASKS_MONO, LOSS_TASKS_STEREO
from ..models import init_loco_params, loco_forward, count_params
from ..network.decode import extract_outputs, extract_labels
from ..parallel import constrain_batch, constrain_by_specs, loco_param_specs, MODEL_AXIS
from ..utils import set_logger
from ..utils.precision import with_matmul_precision


def _make_trainable(params, log_sigmas):
    return {'model': params, 'log_sigmas': log_sigmas} if log_sigmas is not None \
        else {'model': params}


@functools.lru_cache(maxsize=None)
def _init_program(input_size, output_size, linear_size, num_stage):
    """Jitted model init: one dispatch instead of an eager op per layer
    (each eager op costs a round trip through a remote backend)."""
    return jax.jit(lambda key: init_loco_params(
        key, input_size, output_size, linear_size=linear_size,
        num_stage=num_stage))


@functools.lru_cache(maxsize=None)
def _train_programs(tasks, lambdas, bs, n, p_drop, mesh, val_idx):
    """Jitted training programs for one (dataset size, batch size, loss
    config, mesh) combination, cached at module scope.

    The learning-rate schedule (init lr, staircase gamma, step period) and the
    training RNG key are TRACED arguments, not baked into the program — so
    hyperparameter-search trials that differ only in lr/gamma/step (reference
    hyp_tuning.py samples exactly those per trial at a given bs/hidden) reuse
    ONE compiled executable, and whole trial groups vmap over the hyperparams
    (see train/hyp_tuning.py). Model width/depth stay implicit in the params
    pytree: jit specializes per shape as usual.

    Returns a namespace with the jitted programs plus the raw (unjitted)
    `train_chunk_fn` for vmapping, and the optimizer whose state layout the
    checkpoints carry.
    """
    nb = math.ceil(n / bs)
    # Adam without a baked-in schedule: the staircase decay is applied to the
    # update inside `step` from the traced hyperparams. Equivalent to the
    # reference's Adam + per-batch StepLR (reference trainer.py:150-161):
    # optax.adam(exponential_decay(lr0, ts, gamma, staircase=True)) evaluates
    # the schedule at the pre-update count, exactly like `count // ts` below.
    optimizer = optax.chain(optax.scale_by_adam(eps=1e-8))
    tp_on = mesh is not None and MODEL_AXIS in mesh.axis_names

    def constrain_tp(params, bn_state):
        """Pin the Megatron column/row-parallel layouts on the model so the
        SPMD partitioner shards the hidden dimension over 'model'."""
        p_spec, bn_spec = loco_param_specs()
        return (constrain_by_specs(params, mesh, p_spec),
                constrain_by_specs(bn_state, mesh, bn_spec))

    def batch_loss(trainable, bn_state, x, y, mask, rng):
        x = constrain_batch(x, mesh)
        y = constrain_batch(y, mesh)
        mask = constrain_batch(mask, mesh)
        if tp_on:
            model, bn_state = constrain_tp(trainable['model'], bn_state)
            trainable = dict(trainable, model=model)
        out, new_bn = loco_forward(trainable['model'], bn_state, x, train=True,
                                   rng=rng, p_dropout=p_drop, row_mask=mask)
        total, _ = multitask_loss(out, y, tasks, lambdas, phase='train', mask=mask,
                                  log_sigmas=trainable.get('log_sigmas'))
        return total, (new_bn, out)

    grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

    def train_epoch(params, log_sigmas, bn_state, opt_state, epoch_rng,
                    x_all, y_all, hyp):
        lr0, gamma, ts = hyp
        perm = jax.random.permutation(epoch_rng, n)
        pad = nb * bs - n
        perm_padded = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        masks = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
        batches = perm_padded.reshape(nb, bs)
        batch_masks = masks.reshape(nb, bs)
        rngs = jax.random.split(jax.random.fold_in(epoch_rng, 1), nb)

        def step(carry, xs):
            trainable, bn_state, opt_state = carry
            idx, mask, rng = xs
            x, y = x_all[idx], y_all[idx]
            (loss, (new_bn, out)), grads = grad_fn(trainable, bn_state, x, y, mask, rng)
            # Clip the *model* gradient global norm to 3 (loss params unclipped).
            g_model = grads['model']
            gnorm = optax.global_norm(g_model)
            scale = jnp.minimum(1.0, 3.0 / (gnorm + 1e-6))
            grads = dict(grads, model=jax.tree_util.tree_map(lambda g: g * scale, g_model))
            # Staircase-decayed lr at the pre-update step count (StepLR parity).
            count = opt_state[0].count
            lr_t = lr0 * jnp.power(gamma, jnp.floor(count / ts))
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
            trainable = optax.apply_updates(trainable, updates)
            # Validation-flavor losses on the just-computed outputs (logging parity
            # with reference trainer.py:165-167).
            val_total, val_vals = multitask_loss(
                out, y, tasks, lambdas, phase='val', mask=mask,
                log_sigmas=trainable.get('log_sigmas'))
            cnt = mask.sum()
            logs = jnp.stack([val_total * cnt] + [v * cnt for v in val_vals[:len(tasks)]])
            return (trainable, new_bn, opt_state), logs

        trainable = _make_trainable(params, log_sigmas)
        (trainable, bn_state, opt_state), logs = jax.lax.scan(
            step, (trainable, bn_state, opt_state), (batches, batch_masks, rngs))
        return (trainable['model'], trainable.get('log_sigmas'), bn_state, opt_state,
                logs.sum(axis=0))

    def val_metrics(params, log_sigmas, bn_state, x, y):
        out, _ = loco_forward(params, bn_state, x, train=False)
        total, vals = multitask_loss(out, y, tasks, lambdas, phase='val',
                                     log_sigmas=log_sigmas)
        return jnp.stack([total] + list(vals[:len(tasks)]))

    def eval_stats(params, bn_state, x_cat, y_cat, group_masks):
        """Whole-evaluation program: eval-mode forward + masked per-group
        statistics (whole val set, then each distance cluster) in ONE
        dispatch. The group loop is static, so every cluster's losses, bi
        coverage, error moments, and aux accuracy compile into a single
        fused executable — the eager per-cluster host loop this replaces
        paid a ~100 s stream of per-op round-trips through the tunneled
        backend. Masked means over the concatenated rows equal the
        reference's per-subset means exactly.

        Returns (losses (G, n_tasks), stats (G, 6)) with stats columns
        [bi_mean, bi_coverage, err_sum, err_sumsq, count, aux_acc].
        """
        out, _ = loco_forward(params, bn_state, x_cat, train=False)
        dec = extract_outputs(out)
        gt = extract_labels(y_cat)
        errs = jnp.abs(dec['d'] - gt['d'])[:, 0]
        bis = dec['bi'][:, 0]
        covered = (errs <= bis).astype(jnp.float32)
        if 'aux' in tasks:
            aux_err = jnp.abs((dec['aux'][:, 0] >= 0.5).astype(jnp.float32)
                              - gt['aux'][:, 0])
        loss_rows, stat_rows = [], []
        for g in range(group_masks.shape[0]):
            m = group_masks[g]
            cnt = m.sum()
            safe = jnp.maximum(cnt, 1.0)
            loss_rows.append(jnp.stack(
                composite_losses(out, y_cat, tasks, phase='val', mask=m)))
            aux_acc = (1.0 - (aux_err * m).sum() / safe if 'aux' in tasks
                       else jnp.float32(0.0))
            stat_rows.append(jnp.stack([
                (bis * m).sum() / safe, (covered * m).sum() / safe,
                (errs * m).sum(), ((errs ** 2) * m).sum(), cnt, aux_acc]))
        return jnp.stack(loss_rows), jnp.stack(stat_rows)

    # Chunked multi-epoch program: scan train_epoch + val_metrics over a
    # whole block of epochs with ON-DEVICE best-validation tracking, so the
    # host pays one dispatch + one log fetch per CHUNK instead of two
    # dispatches + a blocking fetch per epoch (this container's tunnel RTT is
    # ~20 ms — at 500 epochs that's the difference between ~50 s and ~5 s of
    # pure round-trips). Math is identical to the per-epoch loop: same
    # fold_in(train_key, epoch) RNG, same strictly-less best update, same log
    # values.
    def train_chunk(params, log_sigmas, bn_state, opt_state, best,
                    epochs, x_all, y_all, x_va, y_va, train_key, hyp):
        def step(carry, epoch):
            params, log_sigmas, bn_state, opt_state, best = carry
            epoch_rng = jax.random.fold_in(train_key, epoch)
            params, log_sigmas, bn_state, opt_state, tr_logs = train_epoch(
                params, log_sigmas, bn_state, opt_state, epoch_rng,
                x_all, y_all, hyp)
            va_logs = val_metrics(params, log_sigmas, bn_state, x_va, y_va)
            best_acc, best_tr, best_epoch, best_params, best_bn = best
            better = va_logs[val_idx] < best_acc
            sel = lambda a, b: jnp.where(better, a, b)
            best = (sel(va_logs[val_idx], best_acc),
                    sel(tr_logs[0] / n, best_tr),
                    sel(epoch, best_epoch),
                    jax.tree_util.tree_map(sel, params, best_params),
                    jax.tree_util.tree_map(sel, bn_state, best_bn))
            return (params, log_sigmas, bn_state, opt_state, best), \
                (tr_logs, va_logs)

        carry, logs = jax.lax.scan(
            step, (params, log_sigmas, bn_state, opt_state, best), epochs)
        return carry, logs

    # Training honors the same MONOLOCO_TPU_PRECISION knob as the engine
    # (utils/precision.py): float32 pins every training matmul to full f32 for
    # bf16-sensitivity studies; 'default' leaves this a no-op wrapper.
    return SimpleNamespace(
        train_epoch=jax.jit(with_matmul_precision(train_epoch),
                            donate_argnums=(3,)),
        val_metrics=jax.jit(with_matmul_precision(val_metrics)),
        eval_stats=jax.jit(with_matmul_precision(eval_stats)),
        train_chunk=jax.jit(with_matmul_precision(train_chunk),
                            donate_argnums=(3, 4)),
        train_chunk_fn=with_matmul_precision(train_chunk),
        optimizer=optimizer,
        opt_init=jax.jit(optimizer.init),
    )


class Trainer:
    val_task = 'd'
    clusters = ['10', '20', '30', '40']
    input_size = dict(mono=34, stereo=68)
    output_size = dict(mono=9, stereo=10)
    dir_figures = os.path.join('figures', 'losses')

    def __init__(self, args):
        assert os.path.exists(args.joints), "Input file not found"
        self.mode = args.mode
        self.joints = args.joints
        self.num_epochs = args.epochs
        self.no_save = args.no_save
        self.print_loss = getattr(args, 'print_loss', False)
        self.lr = args.lr
        self.bs = args.bs
        self.sched_step = args.sched_step
        self.sched_gamma = args.sched_gamma
        self.hidden_size = args.hidden_size
        self.n_stage = args.n_stage
        self.dropout = args.dropout
        self.r_seed = args.r_seed
        self.auto_tune_mtl = getattr(args, 'auto_tune_mtl', False)
        self.profile = getattr(args, 'profile', None)
        self.resume = getattr(args, 'resume', None)

        if args.out:
            self.path_out = args.out
            dir_out, _ = os.path.split(self.path_out)
        else:
            dir_out = os.path.join('data', 'outputs')
            name = 'monoloco_pp' if self.mode == 'mono' else 'monstereo'
            now_time = datetime.datetime.now().strftime("%Y%m%d-%H%M")[2:]
            self.path_out = os.path.join(dir_out, name + '-' + now_time + '.pkl')
        # With --no_save nothing is ever written, so a missing default output
        # directory must not block training (reference asserts unconditionally
        # because it always saves: /root/reference/monoloco/train/trainer.py:68).
        assert self.no_save or os.path.exists(dir_out) or not dir_out, \
            "Directory to save the model not found"
        print(self.path_out)

        self.tasks = LOSS_TASKS_MONO if self.mode == 'mono' else LOSS_TASKS_STEREO
        self.lambdas = tuple(1.0 for _ in self.tasks)

        # Data: fully device-resident.
        self.datasets = {ph: KeypointsDataset(self.joints, phase=ph) for ph in ('train', 'val')}
        self.dataset_sizes = {ph: len(ds) for ph, ds in self.datasets.items()}
        self.dataset_version = self.datasets['train'].get_version()
        x_tr, y_tr = self.datasets['train'].arrays()
        x_va, y_va = self.datasets['val'].arrays()
        self.x_tr, self.y_tr = jnp.asarray(x_tr), jnp.asarray(y_tr)
        self.x_va, self.y_va = jnp.asarray(x_va), jnp.asarray(y_va)

        self._set_logger(args)
        self.logger.info('Sizes of the dataset: {}'.format(self.dataset_sizes))
        print(">>> creating model")

        key = jax.random.PRNGKey(self.r_seed)
        self.init_key, self.train_key = jax.random.split(key)
        self.params, self.bn_state = _init_program(
            self.input_size[self.mode], self.output_size[self.mode],
            self.hidden_size, self.n_stage)(self.init_key)
        self.log_sigmas = (jnp.zeros((len(self.tasks),), jnp.float32)
                          if self.auto_tune_mtl else None)
        print(">>> model params: {:.3f}M".format(count_params(self.params) / 1e6))

        # Optional multi-chip mesh: batch dim sharded over 'data', params
        # replicated; XLA inserts the gradient all-reduce.
        self.mesh = getattr(args, 'mesh', None)
        self.n_train = self.x_tr.shape[0]

        # Jitted programs + optimizer from the module-level factory: Trainers
        # with equal shapes/config share compiled executables, and the lr
        # schedule rides in as the traced `self._hyp` (StepLR parity:
        # staircase decay every sched_step *batches*).
        self._programs = _train_programs(
            tuple(self.tasks), tuple(self.lambdas), int(self.bs),
            int(self.n_train), float(self.dropout),
            self.mesh, 1 + list(self.tasks).index(self.val_task))
        self.optimizer = self._programs.optimizer
        self.opt_state = self._programs.opt_init(
            self._trainable(self.params, self.log_sigmas))
        self._hyp = (jnp.float32(self.lr), jnp.float32(self.sched_gamma),
                     jnp.float32(max(int(self.sched_step), 1)))
        self.start_epoch = 0
        self._resume_best = None

        # Mid-training resume (an improvement over the reference, which saves
        # model weights only — SURVEY.md section 5 checkpoint/resume).
        if self.resume:
            from ..models.checkpoint import load_train_state
            blob = load_train_state(self.resume, self.params, self.bn_state,
                                    self.opt_state)
            to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
            # Continue from the FINAL training state (matching opt_state);
            # 'params' holds the best-validation weights for serving.
            self.params = to_jnp(blob.get('final_params', blob['params']))
            self.bn_state = to_jnp(blob.get('final_bn_state', blob['bn_state']))
            extra = blob.get('meta', {})
            ckpt_auto = blob.get('log_sigmas') is not None
            if ckpt_auto != self.auto_tune_mtl:
                raise ValueError(
                    "--resume checkpoint was trained with auto_tune_mtl="
                    f"{ckpt_auto}; pass the matching --auto_tune_mtl setting")
            if ckpt_auto:
                self.log_sigmas = jnp.asarray(blob['log_sigmas'])
            if 'opt_state' in blob:
                self.opt_state = jax.tree_util.tree_map(jnp.asarray, blob['opt_state'])
            self.start_epoch = int(extra.get('epoch', 0))
            # Carry the checkpoint's best-validation serving weights into the
            # best tracking, so a resumed segment that never beats the prior
            # best cannot overwrite it with worse weights. Older checkpoints
            # without the metric fall back to fresh (1e6) tracking.
            if extra.get('best_val_acc') is not None:
                self._resume_best = (
                    float(extra['best_val_acc']),
                    float(extra.get('best_train_acc', 1e6)),
                    int(extra.get('best_epoch', self.start_epoch)),
                    to_jnp(blob['params']), to_jnp(blob['bn_state']))
            self.logger.info('Resumed from %s at epoch %d', self.resume, self.start_epoch)

    # ------------------------------------------------------------------

    _trainable = staticmethod(_make_trainable)

    @property
    def _val_metrics(self):
        return self._programs.val_metrics

    # ------------------------------------------------------------------

    # One device dispatch + one log fetch per CHUNK_EPOCHS epochs. The fused
    # multi-epoch program costs more one-time XLA compile than the per-epoch
    # program; MONOLOCO_TPU_EPOCH_CHUNK=1 selects the per-epoch dispatch loop
    # instead (cheaper compile, ~5x slower steady-state through a remote
    # backend — see PARITY.md).
    CHUNK_EPOCHS = int(os.environ.get('MONOLOCO_TPU_EPOCH_CHUNK', '10'))

    def train(self):
        if self.CHUNK_EPOCHS <= 1:
            return self._train_per_epoch()
        return self._train_chunked()

    def _train_chunked(self):
        since = time.time()
        epoch_losses = defaultdict(lambda: defaultdict(list))
        n_tr = float(self.dataset_sizes['train'])
        names = ['all'] + list(self.tasks)

        profile_ctx = None
        if self.profile:
            profile_ctx = jax.profiler.trace(self.profile)
            profile_ctx.__enter__()
            self.logger.info('Profiling to %s', self.profile)

        # On-device best-validation state (host semantics: strictly-less
        # update against an initial 1e6, best weights start at the current
        # params); a resumed run starts from the checkpoint's recorded best.
        if self._resume_best is not None:
            b_acc, b_tr, b_ep, b_p, b_bn = self._resume_best
            best = (jnp.float32(b_acc), jnp.float32(b_tr), jnp.int32(b_ep),
                    jax.tree_util.tree_map(jnp.copy, b_p),
                    jax.tree_util.tree_map(jnp.copy, b_bn))
        else:
            best = (jnp.float32(1e6), jnp.float32(1e6), jnp.int32(self.start_epoch),
                    jax.tree_util.tree_map(jnp.copy, self.params),
                    jax.tree_util.tree_map(jnp.copy, self.bn_state))

        for cs in range(self.start_epoch, self.num_epochs, self.CHUNK_EPOCHS):
            ce = min(cs + self.CHUNK_EPOCHS, self.num_epochs)
            epochs = jnp.arange(cs, ce, dtype=jnp.int32)
            ((self.params, self.log_sigmas, self.bn_state, self.opt_state,
              best), (tr_chunk, va_chunk)) = self._programs.train_chunk(
                self.params, self.log_sigmas, self.bn_state, self.opt_state,
                best, epochs, self.x_tr, self.y_tr, self.x_va, self.y_va,
                self.train_key, self._hyp)

            tr_chunk = np.asarray(tr_chunk) / n_tr       # (K, 1+tasks)
            va_chunk = np.asarray(va_chunk)
            for k, epoch in enumerate(range(cs, ce)):
                for i, name in enumerate(names):
                    epoch_losses['train'][name].append(float(tr_chunk[k, i]))
                    epoch_losses['val'][name].append(float(va_chunk[k, i]))
                if epoch % 10 == 0:
                    self._cout_epoch(epoch, epoch_losses)

        best_acc, best_training_acc, best_epoch, best_params, best_bn = (
            float(best[0]), float(best[1]), int(best[2]),
            jax.tree_util.tree_map(jnp.asarray, best[3]),
            jax.tree_util.tree_map(jnp.asarray, best[4]))

        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)

        return self._finish_train(since, epoch_losses, best_acc,
                                  best_training_acc, best_epoch, best_params,
                                  best_bn)

    def _train_per_epoch(self):
        """Legacy per-epoch dispatch loop (MONOLOCO_TPU_EPOCH_CHUNK=1): two
        dispatches + a blocking log fetch per epoch. Identical math to the
        chunked scan; cheaper one-time compile, slower steady-state."""
        since = time.time()
        if self._resume_best is not None:
            best_acc, best_training_acc, best_epoch, best_params, best_bn = \
                self._resume_best
        else:
            best_acc = 1e6
            best_training_acc = 1e6
            best_epoch = self.start_epoch
            best_params, best_bn = self.params, self.bn_state
        epoch_losses = defaultdict(lambda: defaultdict(list))
        n_tr = float(self.dataset_sizes['train'])
        names = ['all'] + list(self.tasks)

        profile_ctx = None
        if self.profile:
            profile_ctx = jax.profiler.trace(self.profile)
            profile_ctx.__enter__()
            self.logger.info('Profiling to %s', self.profile)

        for epoch in range(self.start_epoch, self.num_epochs):
            epoch_rng = jax.random.fold_in(self.train_key, epoch)
            (self.params, self.log_sigmas, self.bn_state, self.opt_state,
             train_logs) = self._programs.train_epoch(
                self.params, self.log_sigmas, self.bn_state, self.opt_state,
                epoch_rng, self.x_tr, self.y_tr, self._hyp)
            val_logs = self._programs.val_metrics(self.params, self.log_sigmas,
                                                  self.bn_state, self.x_va, self.y_va)
            train_logs = np.asarray(train_logs) / n_tr
            val_logs = np.asarray(val_logs)
            for i, name in enumerate(names):
                epoch_losses['train'][name].append(float(train_logs[i]))
                epoch_losses['val'][name].append(float(val_logs[i]))
            if epoch % 10 == 0:
                self._cout_epoch(epoch, epoch_losses)
            if epoch_losses['val'][self.val_task][-1] < best_acc:
                best_acc = epoch_losses['val'][self.val_task][-1]
                best_training_acc = epoch_losses['train']['all'][-1]
                best_epoch = epoch
                best_params = jax.tree_util.tree_map(jnp.copy, self.params)
                best_bn = jax.tree_util.tree_map(jnp.copy, self.bn_state)

        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)

        return self._finish_train(since, epoch_losses, best_acc,
                                  best_training_acc, best_epoch, best_params,
                                  best_bn)

    def _finish_train(self, since, epoch_losses, best_acc, best_training_acc,
                      best_epoch, best_params, best_bn):
        # Last epoch actually completed: num_epochs-1 when the loop ran, else
        # the previously-completed start_epoch-1 (a zero-epoch run must not
        # inflate the saved meta 'epoch' and skip an epoch on the next resume).
        self.last_epoch = max(self.num_epochs, self.start_epoch) - 1
        time_elapsed = time.time() - since
        print('\n\n' + '-' * 120)
        self.logger.info('Training:\nTraining complete in {:.0f}m {:.0f}s'
                         .format(time_elapsed // 60, time_elapsed % 60))
        self.logger.info('Best training Accuracy: {:.3f}'.format(best_training_acc))
        self.logger.info('Best validation Accuracy for {}: {:.3f}'.format(self.val_task, best_acc))
        self.logger.info('Saved weights of the model at epoch: {}'.format(best_epoch))

        if self.print_loss:
            self._print_losses(epoch_losses)

        # Keep the final training state for resume; serve the best weights.
        self.final_params = self.params
        self.final_bn_state = self.bn_state
        self.params, self.bn_state = best_params, best_bn
        # Recorded in the checkpoint meta so --resume continues best tracking.
        self.best_acc = best_acc
        self.best_training_acc = best_training_acc
        self.best_epoch = best_epoch
        return best_epoch

    def _cout_epoch(self, epoch, epoch_losses):
        parts = [f'{epoch:.0f} ']
        for phase in ('train', 'val'):
            parts.append(phase[0].upper() + ':')
            for el in ['all'] + list(self.tasks):
                loss = epoch_losses[phase][el][-1]
                if el == 'all':
                    parts.append(f':{loss:.1f}  ')
                elif el in ('ori', 'aux'):
                    parts.append(f'{el}:{loss:.1f}  ')
                else:
                    parts.append(f'{el}:{loss * 100:.0f}  ')
        print('\r' + ''.join(parts))

    # ------------------------------------------------------------------

    def evaluate(self, load=False, model=None, debug=False):
        if load:
            from ..models import load_checkpoint
            self.params, self.bn_state, _ = load_checkpoint(model, arch='loco')

        dic_err = defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: 0)))
        dic_err['val']['sigmas'] = [0.] * len(self.tasks)
        dataset = self.datasets['val']
        size_eval = len(dataset)

        if debug:
            # Reference debug_plots (trainer.py:371-382) opens interactive
            # histograms of shoulder-hip input heights and labels; headless
            # equivalent: print the same distributions as summary stats.
            x_dbg, y_dbg = dataset.arrays()
            heights = np.asarray(x_dbg)[:, 11] - np.asarray(x_dbg)[:, 5]
            for name, arr in (('shoulder-hip height', heights),
                              ('labels', np.asarray(y_dbg).ravel())):
                qs = np.percentile(arr, [0, 25, 50, 75, 100])
                print(f"debug {name}: n={arr.size} "
                      f"min/q1/med/q3/max = {np.round(qs, 3).tolist()}")

        # Whole evaluation (val set + every distance cluster) as ONE jitted
        # dispatch over a concatenated matrix with per-group row masks. The
        # reference loops the subsets on the host (trainer.py:212-228); eager
        # per-op dispatch through a remote backend costs minutes.
        x_va, y_va = dataset.arrays()
        parts_x, parts_y = [x_va], [y_va]
        groups, counts = ['all'], [size_eval]
        for clst in self.clusters:
            inputs, outputs_gt, count = dataset.get_cluster_annotations(clst)
            if count == 0:
                continue
            parts_x.append(np.asarray(inputs))
            parts_y.append(np.asarray(outputs_gt))
            groups.append(clst)
            counts.append(count)
        x_cat = np.concatenate(parts_x, axis=0)
        y_cat = np.concatenate(parts_y, axis=0)
        masks = np.zeros((len(groups), x_cat.shape[0]), np.float32)
        offset = 0
        for g, count in enumerate(counts):
            masks[g, offset:offset + count] = 1.0
            offset += count
        loss_rows, stat_rows = self._programs.eval_stats(
            self.params, self.bn_state, jnp.asarray(x_cat), jnp.asarray(y_cat),
            jnp.asarray(masks))
        loss_rows, stat_rows = np.asarray(loss_rows), np.asarray(stat_rows)
        for g, clst in enumerate(groups):
            self._fill_stats(dic_err['val'], clst, loss_rows[g], stat_rows[g])

        if self.auto_tune_mtl and self.log_sigmas is not None:
            dic_err['val']['sigmas'] = [float(s) for s in
                                        np.exp(np.asarray(self.log_sigmas))]
        self._cout_stats(dic_err['val'], size_eval, clst='all')
        if self.auto_tune_mtl and self.log_sigmas is not None:
            self.logger.info("Sigmas: " + ", ".join(
                f"{t}: {s:.2f}" for t, s in zip(self.tasks, dic_err['val']['sigmas'])))
        for g in range(1, len(groups)):
            self._cout_stats(dic_err['val'], counts[g], clst=groups[g])

        if not (self.no_save or load):
            self.path_model = self.path_out
            blob = {
                'format': 'monoloco_tpu-v1',
                # Serving weights: the best-validation epoch (reference contract).
                'params': jax.tree_util.tree_map(np.asarray, self.params),
                'bn_state': jax.tree_util.tree_map(np.asarray, self.bn_state),
                # Resume state: the FINAL training state, matching opt_state.
                'opt_state': jax.tree_util.tree_map(np.asarray, self.opt_state),
                'final_params': jax.tree_util.tree_map(
                    np.asarray, getattr(self, 'final_params', self.params)),
                'final_bn_state': jax.tree_util.tree_map(
                    np.asarray, getattr(self, 'final_bn_state', self.bn_state)),
                'log_sigmas': (np.asarray(self.log_sigmas)
                               if self.log_sigmas is not None else None),
                'meta': {'mode': self.mode, 'tasks': self.tasks,
                         'hidden_size': self.hidden_size, 'n_stage': self.n_stage,
                         'epoch': getattr(self, 'last_epoch', 0) + 1,
                         'best_val_acc': getattr(self, 'best_acc', None),
                         'best_train_acc': getattr(self, 'best_training_acc', None),
                         'best_epoch': getattr(self, 'best_epoch', None),
                         'version': __version__},
            }
            # Both formats carry the full blob: serving weights AND resume
            # state (--resume round-trips from either path).
            from ..models.checkpoint import save_train_state
            save_train_state(self.path_model, blob)
            print('-' * 120)
            self.logger.info("\nmodel saved: {} \n".format(self.path_model))
        else:
            self.logger.info("\nmodel not saved\n")
        return dic_err, (self.params, self.bn_state)

    def _fill_stats(self, dic_err, clst, losses, stats):
        """Host-side unpack of one eval_stats group row into dic_err
        (same derived quantities the reference computes per subset,
        trainer.py:229-266)."""
        for idx, task in enumerate(self.tasks):
            if task == 'aux':
                continue
            dic_err[clst][task] = float(losses[idx])
        bi_mean, bi_cov, err_sum, err_sumsq, n, aux_acc = (float(v) for v in stats)
        dic_err[clst]['bi'] = bi_mean
        dic_err[clst]['bi%'] = bi_cov
        n = int(n)
        if n > 1:
            mean = err_sum / n
            var = max(0.0, (err_sumsq - n * mean * mean) / (n - 1))
            dic_err[clst]['std'] = var ** 0.5
        else:
            dic_err[clst]['std'] = 0.0
        dic_err[clst]['aux'] = 0 if self.mode == 'mono' else aux_acc

    def _cout_stats(self, dic_err, size_eval, clst):
        if clst == 'all':
            print('-' * 120)
            self.logger.info(
                "Evaluation, val set: \nAv. dist D: {:.2f} m with bi {:.2f} ({:.1f}%), \n"
                "X: {:.1f} cm,  Y: {:.1f} cm \nOri: {:.1f}  "
                "\n H: {:.1f} cm, W: {:.1f} cm, L: {:.1f} cm"
                "\nAuxiliary Task: {:.1f} %, ".format(
                    dic_err[clst]['d'], dic_err[clst]['bi'], dic_err[clst]['bi%'] * 100,
                    dic_err[clst]['x'] * 100, dic_err[clst]['y'] * 100,
                    dic_err[clst]['ori'], dic_err[clst]['h'] * 100,
                    dic_err[clst]['w'] * 100, dic_err[clst]['l'] * 100,
                    dic_err[clst]['aux'] * 100))
        else:
            self.logger.info(
                "Val err clust {} --> D:{:.2f}m,  bi:{:.2f} ({:.1f}%), STD:{:.1f}m   "
                "X:{:.1f} Y:{:.1f}  Ori:{:.1f}d,   H: {:.0f} W: {:.0f} L:{:.0f}  for {} pp. ".format(
                    clst, dic_err[clst]['d'], dic_err[clst]['bi'], dic_err[clst]['bi%'] * 100,
                    dic_err[clst]['std'], dic_err[clst]['x'] * 100, dic_err[clst]['y'] * 100,
                    dic_err[clst]['ori'], dic_err[clst]['h'] * 100,
                    dic_err[clst]['w'] * 100, dic_err[clst]['l'] * 100, size_eval))

    def _print_losses(self, epoch_losses):
        try:
            import matplotlib.pyplot as plt
        except ImportError:
            raise Exception('please install matplotlib')
        os.makedirs(self.dir_figures, exist_ok=True)
        for idx, phase in enumerate(epoch_losses):
            for idx_2, el in enumerate(epoch_losses['train']):
                plt.figure(idx + idx_2)
                plt.title(phase + '_' + el)
                plt.xlabel('epochs')
                plt.plot(epoch_losses[phase][el][10:], label=f'{phase} Loss: {el}')
                plt.savefig(os.path.join(self.dir_figures, f'{phase}_loss_{el}.png'))
                plt.close()

    def _set_logger(self, args):
        if self.no_save:
            logging.basicConfig(level=logging.INFO)
            self.logger = logging.getLogger(__name__)
        else:
            self.path_model = self.path_out
            print(self.path_model)
            self.logger = set_logger(os.path.splitext(self.path_out)[0])
            self.logger.info(
                f'\nVERSION: {__version__}\n'
                f'\nINPUT_FILE: {args.joints}'
                f'\nInput file version: {self.dataset_version}\n'
                f'\nTraining arguments:'
                f'\nmode: {self.mode} \nlearning rate: {args.lr} \nbatch_size: {args.bs}'
                f'\nepochs: {args.epochs} \ndropout: {args.dropout} '
                f'\nscheduler step: {args.sched_step} \nscheduler gamma: {args.sched_gamma} '
                f'\ninput_size: {self.input_size[self.mode]} '
                f'\noutput_size: {self.output_size[self.mode]} '
                f'\nhidden_size: {args.hidden_size}'
                f' \nn_stages: {args.n_stage} \n r_seed: {args.r_seed} '
                f'\nlambdas: {self.lambdas}'
            )
