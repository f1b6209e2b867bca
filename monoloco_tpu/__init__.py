"""monoloco_tpu — TPU-native monocular/stereo 3D human localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of vita-epfl/monoloco
(MonoLoco ICCV'19, MonoLoco++ T-ITS'21, MonStereo ICRA'21): given 2D COCO-17 human
poses, regress per person the 3D location (x, y, z, d), aleatoric uncertainty
(Laplace spread), epistemic uncertainty (MC dropout), yaw orientation, bounding-box
dimensions and (stereo) an auxiliary association score; plus activity heads for
social distancing and raised hands.

Design stance (TPU-first, not a port):
 - All per-detection Python loops of the reference become masked, padded, batched
   XLA ops (vmap/einsum over a max-detections axis).
 - The model forward is a fused residual-MLP that maps onto the MXU; inference-mode
   BatchNorm folds into the preceding linear layers.
 - Training keeps the whole dataset resident in HBM and runs whole epochs under a
   single jitted scan; multi-chip scaling is expressed with jax.sharding.Mesh +
   shard_map over the batch axis (data parallelism).
"""

__version__ = "0.1.0"
