"""Inference engine: the TPU-native counterpart of the reference `Loco` class
(/root/reference/monoloco/network/net.py:23-271).

Serving architecture (one device program per image):
 - Detection counts are padded to power-of-two buckets; for each (net, bucket)
   the WHOLE pipeline — K^-1 keypoint normalization, BN-folded residual MLP,
   stereo all-vs-all pairing + aux-argmax filtering, physical decode — is one
   jitted XLA program, compiled once and cached. A single device round trip
   returns the fully-decoded outputs.
 - Everything after (ground-truth matching, output dict assembly, activity
   rules) is host-side numpy on a handful of detections: no eager device ops
   in the per-image loop.
 - MC-dropout epistemic uncertainty (reference net.py:135-161: n_dropout
   re-forwards with dropout re-enabled at eval, 100 Laplace samples per pass,
   std over all samples) is a single `vmap` over dropout RNG keys.
"""

import math
import warnings
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

# Serving matmul precision: TPU default (fast, bfloat16-ish) unless the user
# pins full f32 for maximum numerical parity with the f32 reference, e.g. when
# evaluating converted reference checkpoints:
#   MONOLOCO_TPU_PRECISION=float32 python -m monoloco_tpu.run eval ...
# Shared with the trainer via utils.precision (one knob governs the process).
from ..utils.precision import (
    MATMUL_PRECISION as _MATMUL_PRECISION,
    PIN_F32 as _PIN_F32,
    serve_storage_bf16 as _serve_storage_bf16,
)

from ..geometry import get_iou_matches, reorder_matches
from ..geometry.host import (
    np_get_keypoints, np_pixel_to_camera, np_xyz_from_distance,
)
from ..models import (
    loco_forward, monoloco_forward, fold_eval_params, folded_forward,
    load_checkpoint,
)
from .preprocess import preprocess_monoloco, preprocess_monstereo
from .decode import (
    extract_outputs, extract_outputs_mono, unnormalize_bi, laplace_sampling,
)
from ..activity import social_interactions, is_raising_hand

N_SAMPLES = 100
LINEAR_SIZE_MONO = 256

# Serving kernel selection (settled by end-to-end measurement on v5e-1):
#  - default / float32: the XLA-fused folded MLP. The bf16 Pallas kernel wins
#    the isolated-MLP microbenchmark (2.24x at 1024x4096) but LOSES inside
#    the full serving program (7.29M vs 9.36M fair-control same-session;
#    splitting at the pallas_call boundary costs more than it saves) — it
#    lives on as an ablation only (ops/fused_mlp.py +
#    tools/bench_pallas_crossover.py).
#  - MONOLOCO_TPU_PRECISION=int8: the fused DYNAMIC-int8 Pallas kernel —
#    weights stored int8 (half the HBM bytes; VMEM-RESIDENT at the flagship
#    hidden 1024 where the 8 MB stack fits, double-buffer streamed above the
#    budget — round-5 measurement, +6.9% resident over streaming), activations
#    quantized in-kernel with per-ROW scales (a VPU row-max overlapped with
#    the MXU), int8 MXU matmuls, NO calibration. Streaming flavor measured
#    11.61M vs 9.30M bf16-XLA same-session (1.25x) and parity-grade on the
#    end metric (tools/int8_eval_parity.py full-volume study, PARITY.md
#    round-4). Round-4 history: the first-cut STATIC-calibrated kernel
#    (12.2M, 1.32x) was withdrawn from serving after the same study measured
#    ALE +69% under calibration distribution-shift; weight-only w8a16 was
#    parity-grade but lost to XLA bf16 (8.2M — the win is the int8 MXU, not
#    the DMA halving). Both survive as measured ablations
#    (tools/bench_pallas_int8.py). An OPT-IN fast path; bf16 XLA stays the
#    default. Only serving batches >= _INT8_MIN_ROWS route to the kernel;
#    smaller dispatches keep the bf16 XLA path.
from ..utils.precision import INT8 as _INT8
import os as _os
# Routing floor, MEASURED (round-5, tools/bench_int8_crossover.py on v5e-1,
# full serving program both paths same-session): dyn8/bf16 throughput ratio
# by dispatch rows — 128: 0.95, 256: 1.00, 512: 1.05, 1024: 1.06, 2048: 1.00,
# 8192: 1.10, 32768: 1.20, 131072: 1.27. 512 is the smallest dispatch where
# the kernel reproducibly wins (the ~±3% band around 1.0 covers 256 and the
# 2048 dip); below it bf16 XLA is equal-or-faster, so routing there buys
# nothing. Numerics do NOT gate this: per-row dynamic quantization is
# batch-size-independent (row i's result never depends on the other rows —
# tests/test_fused_mlp.py::test_dyn8_batch_size_independent), and end-metric
# parity is certified at full volume (tools/int8_eval_parity.py).
# MONOLOCO_TPU_INT8_MIN_ROWS overrides for ablations.
_INT8_MIN_ROWS = int(_os.environ.get('MONOLOCO_TPU_INT8_MIN_ROWS', '512'))


def _int8_routes(weights, n_rows):
    """THE routing predicate: whether an n_rows dispatch runs the fused dyn8
    kernel. Shared by the traced program (_mlp_forward — shapes are static
    under jit, so this evaluates at trace time) and the host-side dispatch
    counters (Loco._count_dispatch), so the two can never disagree."""
    return (isinstance(weights, dict)
            and weights.get('packed_int8') is not None
            and n_rows >= _INT8_MIN_ROWS)


def _mlp_forward(weights, inputs, arch):
    """Eval MLP. `weights` is Loco's container {'folded': params dict,
    'packed_int8': dyn8 kernel weights when MONOLOCO_TPU_PRECISION=int8} —
    packed once at init so quantization is not repaid per dispatch — or a
    bare folded dict from direct callers."""
    if isinstance(weights, dict) and 'folded' in weights:
        if _int8_routes(weights, inputs.shape[0]):
            # Auto picks the VMEM-resident flavor when the int8 stack fits
            # (measured +6.9% over streaming at the flagship hidden 1024,
            # round-5 tools/bench_int8_roofline.py) and double-buffer
            # streaming otherwise; numerics identical either way.
            from ..ops import fused_loco_forward_dyn8_auto
            return fused_loco_forward_dyn8_auto(
                weights['packed_int8'], inputs,
                interpret=jax.default_backend() != 'tpu')
        return folded_forward(weights['folded'], inputs, arch=arch)
    return folded_forward(weights, inputs, arch=arch)


def _bucket(n, minimum=4):
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_rows(arr, size):
    m = arr.shape[0]
    if m == size:
        return np.asarray(arr, np.float32)
    out = np.zeros((size,) + arr.shape[1:], np.float32)
    out[:m] = arr
    return out


class Loco:
    """Load a localization net and run preprocess -> forward -> postprocess."""

    NET_SIZES = {
        'monstereo': dict(input=68, output=10),
        'monoloco_pp': dict(input=34, output=9),
        'monoloco_p': dict(input=34, output=9),
        'monoloco': dict(input=34, output=2),
    }

    def __init__(self, model, mode='mono', net=None, device=None, n_dropout=0,
                 p_dropout=0.2, linear_size=1024, n_stage=3, mesh=None):
        assert mode in ('mono', 'stereo'), "mode not recognized"
        self.mode = mode
        # Optional jax.sharding.Mesh: forward_batch shards the image axis over
        # its 'data' axis (offline generation is trivially data-parallel).
        self.mesh = mesh
        if net is None:
            self.net = 'monoloco_pp' if mode == 'mono' else 'monstereo'
        else:
            assert net in ('monstereo', 'monoloco', 'monoloco_p', 'monoloco_pp')
            self.net = net
        self.arch = 'monoloco' if self.net in ('monoloco', 'monoloco_p') else 'loco'
        if self.net == 'monoloco_p':
            linear_size = LINEAR_SIZE_MONO
        self.linear_size = linear_size
        self.n_dropout = n_dropout
        self.p_dropout = p_dropout
        self.epistemic = n_dropout > 0

        if isinstance(model, str):
            self.params, self.bn_state, _ = load_checkpoint(model, arch=self.arch)
        elif isinstance(model, tuple):
            self.params, self.bn_state = model
        else:
            raise TypeError("model must be a checkpoint path or a (params, bn_state) tuple")
        # The checkpoint is the source of truth for the architecture size
        # (constructor hints only matter before weights exist).
        self.linear_size = linear_size = int(self.params['w1']['w'].shape[1])
        self.n_stage = int(self.params['stages']['w1']['w'].shape[0])
        self.folded = fold_eval_params(self.params, self.bn_state, arch=self.arch)
        # Int8 route (opt-in, see kernel-selection note above): pack the
        # dynamic-int8 kernel weight stack ONCE here rather than on every
        # dispatch; _mlp_forward picks per compiled shape. No calibration:
        # weights quantize per-column at pack time, activations per-row
        # in-kernel.
        # Serving weight storage (round 5): under TPU default matmul
        # precision the MXU rounds operands to bf16 anyway, so bf16-STORED
        # weights compute the same multiplies while streaming half the HBM
        # bytes per dispatch (measured +7.3-7.6% at 512-2048 rows,
        # tools/serve_storage_r5.jsonl). Policy in utils/precision.py:
        # 'auto' (default) serves the bf16-stored fold on TPU under
        # default/bfloat16 matmul precision — certified by the full-volume
        # end-metric A/B (mono −0.01% / stereo −0.05% ALE,
        # tools/serve_storage_parity_r5.jsonl); f32-pinned or tensorfloat32
        # precisions and non-TPU backends always keep f32. self.folded stays
        # f32 — the int8 pack and direct consumers quantize/fold from it.
        self.serve_storage = 'f32'
        folded_serve = self.folded
        if _serve_storage_bf16(jax.default_backend()):
            folded_serve = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), self.folded)
            self.serve_storage = 'bf16'
        self.mlp_weights = {'folded': folded_serve}
        if _INT8 and self.arch == 'loco' and linear_size % 128 == 0:
            if mesh is not None and not self._dp_only_mesh():
                # A pallas_call has no GSPMD partitioning rule, so the kernel
                # cannot sit inside a tensor-parallel ('model'-axis) program:
                # XLA would either reject the Mosaic custom call or all-gather
                # and replicate it, negating both the tp split and the kernel
                # win. Serve bf16 XLA (fully partitionable) and say so.
                # Data-parallel-only meshes ARE served: the batch programs
                # wrap in shard_map over 'data', so each device runs the
                # measured single-chip kernel on its local batch shard.
                warnings.warn(
                    "MONOLOCO_TPU_PRECISION=int8 is ignored under a device "
                    "mesh with non-data axes: the fused kernel cannot be "
                    "GSPMD-partitioned across the model axis. Serving the "
                    "bf16 XLA path instead.",
                    RuntimeWarning)
            else:
                from ..ops import pack_folded_weights_w8
                self.mlp_weights['packed_int8'] = pack_folded_weights_w8(
                    self.folded)
        self._infer_cache = {}
        # Observability: which MLP path each dispatch actually ran (the int8
        # kernel only engages at >= _INT8_MIN_ROWS rows — serve.py exports
        # these so operators can see a packed-but-dormant kernel instead of
        # trusting the flag; VERDICT r4 weak item 1).
        self.n_dispatches = 0
        self.n_dispatches_int8 = 0

    def _count_dispatch(self, n_rows):
        """Record one device dispatch whose traced MLP sees n_rows rows (same
        predicate as the traced routing in _mlp_forward, via _int8_routes).
        Callers must pass the rows the TRACED program sees: under a
        shard_map-wrapped batch program that is the per-device shard, not the
        global batch (see _dispatch_shard_factor)."""
        self.n_dispatches += 1
        if _int8_routes(self.mlp_weights, n_rows):
            self.n_dispatches_int8 += 1

    def _dispatch_shard_factor(self):
        """How many ways _maybe_shard_map splits the batch programs' leading
        (image) axis. _int8_routes evaluates at trace time on the LOCAL
        per-device shape inside shard_map, so the host-side dispatch counters
        must divide the global image bucket by this factor — otherwise a
        global-rows>=floor / local-rows<floor dispatch would count as int8
        while actually running bf16 (the exact packed-but-dormant condition
        the counters exist to expose)."""
        if self.mesh is None or 'packed_int8' not in self.mlp_weights:
            return 1
        from ..parallel.mesh import DATA_AXIS
        return int(self.mesh.shape[DATA_AXIS])

    def _dp_only_mesh(self):
        """True when self.mesh shards over the 'data' axis alone (every other
        axis trivial) — the only layout the fused int8 kernel serves under."""
        from ..parallel.mesh import DATA_AXIS
        return (self.mesh is not None
                and DATA_AXIS in self.mesh.axis_names
                and all(self.mesh.shape[a] == 1 for a in self.mesh.axis_names
                        if a != DATA_AXIS))

    def _maybe_shard_map(self, program, n_batch_args):
        """Wrap a whole-batch program in shard_map over the data axis when the
        int8 kernel is packed under a dp mesh (a pallas_call has no GSPMD rule,
        but it is trivially data-parallel: shard_map runs the SAME measured
        single-chip kernel per device on its local shard — reference has no
        counterpart; the bf16 path keeps plain GSPMD via input shardings)."""
        if self.mesh is None or 'packed_int8' not in self.mlp_weights:
            return program
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        batch_spec = P(DATA_AXIS)
        # check_vma=False: pallas_call does not declare varying-mesh-axes
        # metadata, and the program needs no cross-shard collectives anyway
        # (per-image independence makes replication checking vacuous here).
        return jax.shard_map(
            program, mesh=self.mesh,
            in_specs=(P(),) + (batch_spec,) * n_batch_args,
            out_specs=batch_spec, check_vma=False)

    # ------------------------------------------------------------------
    # Jitted end-to-end device programs (cached per bucket)
    # ------------------------------------------------------------------

    def _mono_program(self):
        net = self.net
        arch = self.arch

        def program(folded, kps, kk):
            with jax.default_matmul_precision(_MATMUL_PRECISION):
                if net == 'monoloco':
                    inputs = preprocess_monoloco(kps, kk, zero_center=True)
                    raw = _mlp_forward(folded, inputs, arch)
                    return {'d': raw[:, 0:1], 'bi': unnormalize_bi(raw)}
                inputs = preprocess_monoloco(kps, kk)
                raw = _mlp_forward(folded, inputs, arch)
                if net == 'monoloco_p':
                    return extract_outputs_mono(raw)
                return extract_outputs(raw)

        return jax.jit(program)

    def _stereo_program(self):
        def program(folded, kps_l, kps_r, r_mask, kk):
            with jax.default_matmul_precision(_MATMUL_PRECISION):
                inputs, _ = preprocess_monstereo(kps_l, kps_r, kk)
                raw = _mlp_forward(folded, inputs, 'loco')
                m, r = kps_l.shape[0], kps_r.shape[0]
                out3 = raw.reshape(m, r, raw.shape[1])
                # Padded right columns cannot win the aux argmax.
                aux = jnp.where(r_mask[None, :], out3[:, :, -1], -jnp.inf)
                best = jnp.argmax(aux, axis=1)
                selected = jnp.take_along_axis(out3, best[:, None, None],
                                               axis=1)[:, 0, :]
                out = extract_outputs(selected)
                # Which right candidate won per left keypoint — the selection
                # mask consumers like median_disparity need (the reference
                # gets it from filter_outputs, net.py:120-121).
                out['aux_idx'] = best
                return out

        return jax.jit(program)

    def _get_program(self, kind):
        if kind not in self._infer_cache:
            builders = {
                'stereo': self._stereo_program,
                'mono': self._mono_program,
                'mc': self._mc_program,
                'batch': self._batch_program,
                'batch_stereo': self._batch_stereo_program,
                'batch_mc': self._batch_mc_program,
            }
            self._infer_cache[kind] = builders[kind]()
        return self._infer_cache[kind]

    def _mc_program(self):
        fwd = loco_forward if self.arch == 'loco' else monoloco_forward
        p_dropout = self.p_dropout
        net = self.net

        @jax.jit
        def mc(params, bn_state, kps, kk, rngs):
            if net == 'monoloco':
                x = preprocess_monoloco(kps, kk, zero_center=True)
            else:
                x = preprocess_monoloco(kps, kk)

            def one_pass(rng):
                out, _ = fwd(params, bn_state, x, train=False, rng=rng,
                             p_dropout=p_dropout, mc_dropout=True)
                # Only the legacy 2-output monoloco head stores [d, spread] at
                # 0:2; monoloco_p/monoloco_pp keep them at 2:4 (ref net.py:148-151).
                db = out[:, 0:2] if net == 'monoloco' else out[:, 2:4]
                bi = unnormalize_bi(db)
                mu_b = jnp.concatenate([db[:, 0:1], bi], axis=1)
                return laplace_sampling(mu_b, N_SAMPLES)

            samples = jax.vmap(one_pass)(rngs)              # (n_dropout, S, b)
            flat = samples.reshape(-1, x.shape[0])
            return jnp.std(flat, axis=0, ddof=1)

        return mc

    # ------------------------------------------------------------------
    # Public forward (mirrors reference net.py:83-133)
    # ------------------------------------------------------------------

    def forward(self, keypoints, kk, keypoints_r=None):
        if keypoints is None or len(keypoints) == 0:
            return None
        kps = np.asarray(keypoints, np.float32)
        kk_arr = jnp.asarray(np.asarray(kk, np.float32))
        m = kps.shape[0]

        if self.net == 'monstereo':
            if keypoints_r is None or len(keypoints_r) == 0:
                kps_r = kps[0:1].copy()
            else:
                kps_r = np.asarray(keypoints_r, np.float32)
            r = kps_r.shape[0]
            bm, br = _bucket(m), _bucket(r)
            r_mask = np.zeros((br,), bool)
            r_mask[:r] = True
            self._count_dispatch(bm * br)
            dic = self._get_program('stereo')(
                self.mlp_weights, jnp.asarray(_pad_rows(kps, bm)),
                jnp.asarray(_pad_rows(kps_r, br)), jnp.asarray(r_mask), kk_arr)
            kps_dev = None
        else:
            bm = _bucket(m)
            kps_dev = jnp.asarray(_pad_rows(kps, bm))
            self._count_dispatch(bm)
            dic = self._get_program('mono')(self.mlp_weights, kps_dev, kk_arr)

        dic = jax.device_get(dic)
        dic_out = {}
        for k, v in dic.items():
            if k == 'yaw':
                dic_out['yaw'] = (np.asarray(v[0])[:m], np.asarray(v[1])[:m])
            else:
                dic_out[k] = np.asarray(v)[:m]

        if self.n_dropout > 0 and self.net != 'monstereo':
            rngs = jax.random.split(jax.random.PRNGKey(0), self.n_dropout)
            epi = self._get_program('mc')(
                self.params, self.bn_state, kps_dev, kk_arr, rngs)
            dic_out['epi'] = np.asarray(jax.device_get(epi))[:m]
        else:
            dic_out['epi'] = [0.] * m
        return dic_out

    # ------------------------------------------------------------------
    # Batched multi-image serving (no reference counterpart: the reference
    # loops images on the host; here a whole image batch with per-image
    # calibration is ONE device program via vmap)
    # ------------------------------------------------------------------

    def _batch_program(self):
        net = self.net
        arch = self.arch

        def program(folded, kps_batch, kk_batch):
            with jax.default_matmul_precision(_MATMUL_PRECISION):
                inputs = jax.vmap(preprocess_monoloco)(kps_batch, kk_batch)  # (B, M, 34)
                b, m_max, feat = inputs.shape
                raw = _mlp_forward(folded, inputs.reshape(b * m_max, feat), arch)
                if net == 'monoloco_p':
                    return extract_outputs_mono(raw)
                return extract_outputs(raw)

        return jax.jit(self._maybe_shard_map(program, n_batch_args=2))

    def _batch_stereo_program(self):
        """Whole-batch MonStereo: the m x r all-vs-all expansion, MLP, and
        per-left aux-argmax selection are vmapped over images, so a mixed
        batch of crowds is ONE device program (the quadratic hot spot the
        reference runs per-image in Python, reference process.py:25-44)."""

        def program(folded, kps_l, kps_r, r_mask, kk):
            with jax.default_matmul_precision(_MATMUL_PRECISION):
                b, m, _, _ = kps_l.shape
                r = kps_r.shape[1]

                def pair_inputs(kl, kr, k):
                    inputs, _ = preprocess_monstereo(kl, kr, k)   # (m*r, 68)
                    return inputs

                inputs = jax.vmap(pair_inputs)(kps_l, kps_r, kk)  # (B, m*r, 68)
                raw = _mlp_forward(folded, inputs.reshape(b * m * r, -1), 'loco')
                out4 = raw.reshape(b, m, r, raw.shape[-1])
                aux = jnp.where(r_mask[:, None, :], out4[:, :, :, -1], -jnp.inf)
                best = jnp.argmax(aux, axis=2)                    # (B, m)
                selected = jnp.take_along_axis(
                    out4, best[:, :, None, None], axis=2)[:, :, 0, :]
                return extract_outputs(selected.reshape(b * m, -1))

        return jax.jit(self._maybe_shard_map(program, n_batch_args=4))

    def _batch_mc_program(self):
        """Epistemic MC-dropout over a whole image batch: the per-image MC
        program (n_dropout stochastic passes + Laplace-sampling std, same
        fixed PRNGKey(0) stream as `forward`) vmapped over the image axis —
        one dispatch for the entire chunk instead of one per image."""
        fwd = loco_forward if self.arch == 'loco' else monoloco_forward
        p_dropout = self.p_dropout
        net = self.net

        @jax.jit
        def batch_mc(params, bn_state, kps_batch, kk_batch, rngs):
            def per_image(kps, kk):
                if net == 'monoloco':
                    x = preprocess_monoloco(kps, kk, zero_center=True)
                else:
                    x = preprocess_monoloco(kps, kk)

                def one_pass(rng):
                    out, _ = fwd(params, bn_state, x, train=False, rng=rng,
                                 p_dropout=p_dropout, mc_dropout=True)
                    db = out[:, 0:2] if net == 'monoloco' else out[:, 2:4]
                    bi = unnormalize_bi(db)
                    mu_b = jnp.concatenate([db[:, 0:1], bi], axis=1)
                    return laplace_sampling(mu_b, N_SAMPLES)

                samples = jax.vmap(one_pass)(rngs)          # (n_dropout, S, m)
                flat = samples.reshape(-1, x.shape[0])
                return jnp.std(flat, axis=0, ddof=1)

            return jax.vmap(per_image)(kps_batch, kk_batch)  # (B, m_bucket)

        return batch_mc

    def _shard_batch_args(self, *arrays):
        """Place batched host arrays on device; with a mesh, split the leading
        image axis over 'data' so GSPMD partitions the whole program."""
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from ..parallel import shard_batch
        return tuple(shard_batch(np.asarray(a), self.mesh) for a in arrays)

    def forward_batch(self, keypoints_list, kk_list, keypoints_r_list=None):
        """Run many images in one device program (see forward_batch_async)."""
        return self.forward_batch_async(keypoints_list, kk_list,
                                        keypoints_r_list)()

    def forward_batch_async(self, keypoints_list, kk_list,
                            keypoints_r_list=None):
        """Launch one device program over many images; returns a zero-arg
        finalize() producing the per-image output dicts.

        JAX dispatch is asynchronous, so callers can launch the next chunk
        (or do host-side IO) before finalizing this one — the device computes
        and the tunnel transfers while the host writes files.

        keypoints_list: per-image (m_i, 3, 17) arrays; kk_list: per-image 3x3
        intrinsics; keypoints_r_list (monstereo): per-image right-camera
        keypoints (r_i, 3, 17), entries may be None/empty (the left keypoints
        are duplicated, matching `forward`). finalize() returns a list of
        per-image output dicts identical to `forward`'s. Images pad to shared
        detection buckets, so any mix of crowd sizes reuses one compiled
        program per (batch-bucket, m-bucket[, r-bucket]).
        """
        assert self.net in ('monoloco_pp', 'monoloco_p', 'monstereo'), \
            "forward_batch supports the monocular nets and monstereo"
        stereo = self.net == 'monstereo'
        counts = [0 if k is None else len(k) for k in keypoints_list]
        n_img = len(keypoints_list)
        if n_img == 0:
            return lambda: []
        m_bucket = _bucket(max(max(counts), 1))
        b_bucket = _bucket(n_img, minimum=1)
        if self.mesh is not None:
            # The image axis splits over the mesh's data axis: pad the batch
            # bucket up to a multiple of the device count.
            n_dev = int(np.prod(self.mesh.devices.shape))
            b_bucket = max(b_bucket, n_dev)
            b_bucket += (-b_bucket) % n_dev
        kps = np.zeros((b_bucket, m_bucket, 3, 17), np.float32)
        kks = np.zeros((b_bucket, 3, 3), np.float32)
        kks[:] = np.eye(3)
        for i, (k, kk) in enumerate(zip(keypoints_list, kk_list)):
            if counts[i]:
                kps[i, :counts[i]] = np.asarray(k, np.float32)
            kks[i] = np.asarray(kk, np.float32)

        if stereo:
            if keypoints_r_list is None:
                keypoints_r_list = [None] * n_img
            counts_r = [0 if k is None else len(k) for k in keypoints_r_list]
            r_bucket = _bucket(max(max(counts_r), 1))
            kps_r = np.zeros((b_bucket, r_bucket, 3, 17), np.float32)
            r_mask = np.zeros((b_bucket, r_bucket), bool)
            for i in range(n_img):
                if counts_r[i]:
                    kps_r[i, :counts_r[i]] = np.asarray(keypoints_r_list[i],
                                                        np.float32)
                    r_mask[i, :counts_r[i]] = True
                elif counts[i]:
                    # No right detections: duplicate the first left keypoints,
                    # as the per-image forward does (reference net.py:113-116).
                    kps_r[i, 0] = kps[i, 0]
                    r_mask[i, 0] = True
            kps_j, kps_r_j, r_mask_j, kks_j = self._shard_batch_args(
                kps, kps_r, r_mask, kks)
            self._count_dispatch(
                b_bucket // self._dispatch_shard_factor()
                * m_bucket * r_bucket)
            dic_dev = self._get_program('batch_stereo')(
                self.mlp_weights, kps_j, kps_r_j, r_mask_j, kks_j)
        else:
            kps_j, kks_j = self._shard_batch_args(kps, kks)
            self._count_dispatch(
                b_bucket // self._dispatch_shard_factor() * m_bucket)
            dic_dev = self._get_program('batch')(self.mlp_weights, kps_j, kks_j)

        epi_dev = None
        if self.n_dropout > 0 and not stereo:
            rngs = jax.random.split(jax.random.PRNGKey(0), self.n_dropout)
            epi_dev = self._get_program('batch_mc')(
                self.params, self.bn_state, kps_j, kks_j, rngs)

        def finalize():
            dic = jax.device_get(dic_dev)
            epi = None if epi_dev is None else np.asarray(jax.device_get(epi_dev))
            outs = []
            for i in range(n_img):
                m = counts[i]
                if m == 0:
                    outs.append(None)
                    continue
                sl = slice(i * m_bucket, i * m_bucket + m)
                dic_i = {}
                for key, v in dic.items():
                    if key == 'yaw':
                        dic_i['yaw'] = (np.asarray(v[0])[sl], np.asarray(v[1])[sl])
                    else:
                        dic_i[key] = np.asarray(v)[sl]
                dic_i['epi'] = ([0.] * m if epi is None else epi[i, :m])
                outs.append(dic_i)
            return outs

        return finalize

    # ------------------------------------------------------------------
    # Host-side post-processing (numpy; mirrors reference net.py:163-248)
    # ------------------------------------------------------------------

    @staticmethod
    def post_process(dic_in, boxes, keypoints, kk, dic_gt=None, iou_min=0.3,
                     reorder=True, verbose=False):
        """Assemble the final per-image output dict (matching the reference's
        key set and confidence formula conf = 0.035*box_conf/(bi/distance),
        net.py:215)."""
        dic_out = defaultdict(list)
        if dic_in is None:
            return dic_out

        if dic_gt:
            boxes_gt = dic_gt['boxes']
            dds_gt = [el[3] for el in dic_gt['ys']]
            matches = get_iou_matches(boxes, boxes_gt, iou_min=iou_min)
            if verbose:
                print(f"found {len(matches)} matches with ground-truth")
            idxs_matches = [el[0] for el in matches]
            not_matches = [idx for idx, _ in enumerate(boxes) if idx not in idxs_matches]
        else:
            matches = []
            not_matches = list(range(len(boxes)))
            if verbose:
                print("NO ground-truth associated")

        if reorder and matches:
            matches = reorder_matches(matches, boxes, mode='left_right')

        all_idxs = [idx for idx, _ in matches] + not_matches
        dic_out['gt'] = [True] * len(matches) + [False] * len(not_matches)
        # Original annotation index of each output row, so downstream consumers
        # (e.g. skeleton coloring) can map back to pifpaf annotation order.
        dic_out['indices'] = [int(i) for i in all_idxs]

        kps_np = np.asarray(keypoints, np.float32)
        uv_shoulders = np_get_keypoints(kps_np, 'shoulder')
        uv_heads = np_get_keypoints(kps_np, 'head')
        uv_centers = np_get_keypoints(kps_np, 'center')
        xy_centers = np_pixel_to_camera(uv_centers, kk, 1)

        has_yaw = 'yaw' in dic_in
        if has_yaw:
            yaw_pred = np.asarray(dic_in['yaw'][0]).reshape(-1)
            yaw_orig = np.asarray(dic_in['yaw'][1]).reshape(-1)
        has_aux = 'aux' in dic_in

        for idx in all_idxs:
            kps = keypoints[idx]
            box = boxes[idx]
            dd_pred = float(np.asarray(dic_in['d'][idx]).reshape(-1)[0])
            bi = float(np.asarray(dic_in['bi'][idx]).reshape(-1)[0])
            var_y = float(np.asarray(dic_in['epi'][idx]).reshape(-1)[0])
            uu_s, vv_s = uv_shoulders[idx][0:2]
            uu_c, vv_c = uv_centers[idx][0:2]
            uu_h, vv_h = uv_heads[idx][0:2]
            xyz_pred = np_xyz_from_distance(dd_pred, xy_centers[idx])[0]
            distance = math.sqrt(float(xyz_pred[0]) ** 2 + float(xyz_pred[1]) ** 2
                                 + float(xyz_pred[2]) ** 2)
            conf = 0.035 * (box[-1]) / (bi / distance)

            dic_out['boxes'].append(box)
            dic_out['confs'].append(conf)
            dic_out['dds_pred'].append(dd_pred)
            dic_out['stds_ale'].append(bi)
            dic_out['stds_epi'].append(var_y)
            dic_out['xyz_pred'].append([float(x) for x in xyz_pred])
            dic_out['uv_kps'].append(kps)
            dic_out['uv_centers'].append([round(float(uu_c)), round(float(vv_c))])
            dic_out['uv_shoulders'].append([round(float(uu_s)), round(float(vv_s))])
            dic_out['uv_heads'].append([round(float(uu_h)), round(float(vv_h))])

            if has_yaw:
                dic_out['angles'].append(float(yaw_pred[idx]))
                dic_out['angles_egocentric'].append(float(yaw_orig[idx]))
                if has_aux:
                    dic_out['aux'].append(float(np.asarray(dic_in['aux'][idx]).reshape(-1)[0]))
                else:
                    # Schema quirk replicated from the reference: its
                    # defaultdict touches dic_out['aux'] before the KeyError
                    # on dic_in['aux'] (net.py:236-240), so mono outputs
                    # carry an empty "aux": [] — byte-compat goldens pin it.
                    dic_out['aux']  # noqa: B018 — deliberate defaultdict touch
            else:
                # Same quirk for the legacy 2-output net: 'angles' is touched
                # before the KeyError on dic_in['yaw'] (net.py:230-233).
                dic_out['angles']  # noqa: B018 — deliberate defaultdict touch

        for idx, idx_gt in matches:
            dd_real = dds_gt[idx_gt]
            xyz_real = np_xyz_from_distance(dd_real, xy_centers[idx])
            dic_out['dds_real'].append(dd_real)
            dic_out['boxes_gt'].append(boxes_gt[idx_gt])
            dic_out['xyz_real'].append([float(x) for x in xyz_real.squeeze()])
        return dic_out

    @staticmethod
    def social_distance(dic_out, args):
        """Flag social-distancing violations per person (net.py:250-265)."""
        angles = dic_out['angles']
        dds = dic_out['dds_pred']
        stds = dic_out['stds_ale']
        xz_centers = [[xx[0], xx[2]] for xx in dic_out['xyz_pred']]
        dic_out['social_distance'] = [
            bool(social_interactions(idx, xz_centers, angles, dds, stds=stds,
                                     threshold_prob=args.threshold_prob,
                                     threshold_dist=args.threshold_dist,
                                     radii=args.radii))
            for idx, _ in enumerate(dic_out['xyz_pred'])
        ]
        return dic_out

    @staticmethod
    def raising_hand(dic_out, keypoints):
        dic_out['raising_hand'] = [is_raising_hand(kp) for kp in keypoints]
        return dic_out


def median_disparity(dic_out, keypoints, keypoints_r, mask=None):
    """Ablation: replace the stereo net's depth with the median joint
    disparity whenever a confident stereo match exists (reference
    net.py:274-293). dic_out['xyzd'] is updated in place (numpy).

    The winning right candidate per left keypoint comes from `mask` (an
    (m, r) selection matrix, reference filter_outputs form) or — when mask is
    None — from dic_out['aux_idx'] as returned by the engine's stereo
    forward."""
    from ..geometry import mask_joint_disparity
    keypoints = np.asarray(keypoints)
    keypoints_r = np.asarray(keypoints_r)
    if mask is None:
        idx_right = np.asarray(dic_out['aux_idx']).reshape(-1)
    else:
        idx_right = np.argmax(np.asarray(mask), axis=1)
    avg_disparities, _, _ = mask_joint_disparity(keypoints, keypoints_r)
    BF = 0.54 * 721
    xyzd = np.asarray(dic_out['xyzd']).copy()
    for idx, aux in enumerate(np.asarray(dic_out['aux']).reshape(-1)):
        if aux > 0.5:
            idx_r = int(idx_right[idx])
            z = BF / avg_disparities[idx][idx_r]
            if 1 < z < 80:
                xyzd[idx][2] = z
                xyzd[idx][3] = np.linalg.norm(xyzd[idx][0:3])
    dic_out['xyzd'] = xyzd
    return dic_out
