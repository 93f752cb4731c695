"""tpuseg — a TPU-native (JAX / Flax / Pallas / pjit) semantic-segmentation framework.

A from-scratch rebuild of the capabilities of SEAME-pt/Team02-ObjectDetection
(10-class road-scene segmentation: models, multi-source data pipeline, training,
batched video inference, export/quantization), designed TPU-first:

- Models are Flax modules in NHWC layout with bfloat16-capable compute.
- The train step is one jitted pjit function over a ``jax.sharding.Mesh``
  (data parallelism; optional ``spatial`` axis for sharded-H inference).
- Hot ops (fused conv+BN+ReLU, fused decoder upsample+concat+conv, fused
  argmax/colorize) have Pallas TPU kernels with pure-JAX fallbacks.
- Host-side work (decode, polygon rasterization) is minimal; augmentation runs
  on device, vmapped over per-sample PRNG keys.

Reference behavioral spec: /root/reference (see SURVEY.md at the repo root).
"""

from tpuseg.version import __version__

__all__ = ["__version__"]
