"""Multi-task losses as pure masked-reduction JAX functions.

Parity targets in /root/reference/monoloco/train/losses.py:
 - Laplace NLL on relative distance error: |1 - mu/x| * exp(-s) + 0.01 + s + 2
   (losses.py:112-131)
 - L1 for x/y/h/w/l/ori, BCE-with-logits for the stereo aux flag
   (losses.py:82-84)
 - Validation-only variants: plain |mu - x| for 'd', angle error in degrees for
   'ori' (losses.py:241-254)
 - MultiTaskLoss: sum of lambda-weighted task losses (losses.py:46-73)
 - AutoTuneMultiTaskLoss: Kendall-style learned log-sigmas,
   sum lam*l/(2 sigma^2) + sum log sigma (losses.py:17-43)

Every reduction takes an optional row mask so statically-padded partial batches
produce exactly the same values as ragged ones.
"""

import jax.numpy as jnp

from ..network.decode import extract_outputs, extract_labels, extract_labels_aux

LOSS_TASKS_STEREO = ('d', 'x', 'y', 'h', 'w', 'l', 'ori', 'aux')
LOSS_TASKS_MONO = ('d', 'x', 'y', 'h', 'w', 'l', 'ori')

_EPS = 0.01
_CONST = 2.0


def _masked_mean(values, mask):
    """Mean over rows; `values` (m, k) is first meaned over k (matching torch's
    elementwise-loss mean over all entries), then masked over rows."""
    row_vals = values.mean(axis=-1)
    if mask is None:
        return row_vals.mean()
    return (row_vals * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def laplace_loss_terms(mu_si, x, mask=None):
    """Relative Laplace NLL (losses.py:112-131)."""
    mu, si = mu_si[:, 0:1], mu_si[:, 1:2]
    norm = 1.0 - mu / x
    values = jnp.abs(norm) * jnp.exp(-si) + _EPS + si + _CONST
    return _masked_mean(values, mask)


def _l1(out, gt, mask=None):
    return _masked_mean(jnp.abs(out - gt), mask)


def _bce_logits(out, gt, mask=None):
    values = jnp.maximum(out, 0) - out * gt + jnp.log1p(jnp.exp(-jnp.abs(out)))
    return _masked_mean(values, mask)


def _l1_from_laplace(out, gt, mask=None):
    return _masked_mean(jnp.abs(out[:, 0:1] - gt), mask)


def _angle_loss(orient, gt_orient, mask=None):
    angles = jnp.arctan2(orient[:, 0], orient[:, 1])
    gt_angles = jnp.arctan2(gt_orient[:, 0], gt_orient[:, 1])
    vals = jnp.abs(angles - gt_angles)[:, None]
    # Reference multiplies by 180/3.14 (not pi) — keep it for numeric parity.
    return _masked_mean(vals, mask) * 180.0 / 3.14


def gaussian_loss_terms(mu_si, x, mask=None):
    """Gaussian NLL alternate (unused by default, parity with losses.py:145-186):
    ((x - mu)/si)^2/2 + log(si*sqrt(2*pi)), si floored at 0.1."""
    mu, si = mu_si[:, 0:1], mu_si[:, 1:2]
    si = jnp.maximum(si, 0.1)
    norm = x - mu
    values = (norm / si) ** 2 / 2 + jnp.log(si * jnp.sqrt(2 * jnp.pi))
    return _masked_mean(values, mask)


def custom_l1_loss(out, gt, mask=None, beta=1):
    """Distance-weighted L1 alternate (losses.py:189-238): weight
    max(0.1, 1 - d/78)^beta emphasizes near-range errors. The reference
    derives the weight from the (detached) network output; mirror that."""
    import jax
    ww = jnp.maximum(0.1, 1.0 - jax.lax.stop_gradient(out) / 78.0) ** beta
    return _masked_mean(jnp.abs(out - gt) * ww, mask)


def _task_loss(task, phase):
    if task == 'd':
        return laplace_loss_terms if phase == 'train' else _l1_from_laplace
    if task == 'aux':
        return _bce_logits
    if task == 'ori' and phase == 'val':
        return _angle_loss
    return _l1


def composite_losses(outputs, labels, tasks, phase, mask=None):
    """Per-task losses in task order. `phase` picks train vs validation
    flavors (CompositeLoss, losses.py:76-101)."""
    outs = extract_outputs(outputs, tasks=tasks)
    if len(tasks) == 1 and tasks[0] == 'aux':
        gts = extract_labels_aux(labels, tasks=tasks)
    else:
        gts = extract_labels(labels, tasks=tasks)
    return [_task_loss(t, phase)(o, g, mask) for t, o, g in zip(tasks, outs, gts)]


def multitask_loss(outputs, labels, tasks, lambdas, phase='train', mask=None,
                   log_sigmas=None):
    """Total multi-task loss.

    Without log_sigmas: sum(lam_i * l_i) (MultiTaskLoss.forward).
    With log_sigmas (auto-tune): sum(lam_i * l_i / (2 exp(log_sigma_i)^2)) +
    sum(log_sigma_i); the returned per-task values match the reference's
    (train: weighted terms, val: raw task losses [+ sigmas appended by caller]).
    Returns (total, task_values_list).
    """
    values = composite_losses(outputs, labels, tasks, phase='train', mask=mask)
    if log_sigmas is None:
        weighted = [lam * v for lam, v in zip(lambdas, values)]
        total = sum(weighted)
        if phase == 'val':
            val_values = composite_losses(outputs, labels, tasks, phase='val', mask=mask)
            return total, val_values
        return total, weighted

    sig2 = 2.0 * jnp.exp(log_sigmas) ** 2
    weighted = [lam * v / sig2[i] for i, (lam, v) in enumerate(zip(lambdas, values))]
    total = sum(weighted) + log_sigmas.sum()
    if phase == 'val':
        val_values = composite_losses(outputs, labels, tasks, phase='val', mask=mask)
        val_values = val_values + [jnp.exp(s) for s in log_sigmas]
        return total, val_values
    return total, weighted
