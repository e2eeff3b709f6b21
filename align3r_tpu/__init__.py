"""align3r_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of Align3R.

Align3R (CVPR 2025, arXiv:2412.03079) estimates temporally consistent video
depth, dynamic point clouds and camera poses from monocular video.  This
package re-implements the full pipeline TPU-first:

- ``align3r_tpu.models``      — CroCo ViT encoder/decoder, DPT heads, the
  Align3R asymmetric two-view network with monocular-prior injection
  (reference: dust3r/model.py, croco/models/croco.py).
- ``align3r_tpu.ops``         — Pallas TPU kernels (fused RoPE attention,
  correlation lookup) with pure-XLA fallbacks.
- ``align3r_tpu.geometry``    — pure-jnp camera geometry, pose
  parameterisations and depth-based warping.
- ``align3r_tpu.inference``   — frame-graph construction and the batched,
  jitted pairwise inference engine (reference: dust3r/inference.py,
  dust3r/image_pairs.py).
- ``align3r_tpu.alignment``   — test-time global alignment as a jitted
  ``lax.scan`` Adam loop (reference: dust3r/cloud_opt, cloud_opt_flow).
- ``align3r_tpu.training``    — losses, data pipeline and the sharded
  pjit train step (reference: dust3r/training.py, dust3r/losses.py).
- ``align3r_tpu.parallel``    — device-mesh / sharding helpers.
- ``align3r_tpu.eval``        — depth & trajectory metrics
  (reference: tool/metric.py, dust3r/utils/vo_eval.py).
"""

__version__ = "0.1.0"
