"""tpuseg — a TPU-native (JAX / Flax / Pallas / pjit) semantic-segmentation framework.

A from-scratch rebuild of the capabilities of SEAME-pt/Team02-ObjectDetection
(10-class road-scene segmentation: models, multi-source data pipeline, training,
batched video inference, export/quantization), designed TPU-first:

- Models are Flax modules in NHWC layout with bfloat16-capable compute.
- The train step is one jitted pjit function over a ``jax.sharding.Mesh``
  (data parallelism; optional ``spatial`` axis for sharded-H work).
- Hot inference ops (fused argmax+colorize) are Pallas TPU kernels with
  pure-JAX fallbacks; the host postprocess tier is native C++ (native/).
- Host-side work (decode, polygon rasterization) is minimal; augmentation
  runs on device, vmapped over per-sample PRNG keys.

Reference behavioral spec: /root/reference (see SURVEY.md at the repo root).

Top-level convenience re-exports (heavier subsystems import lazily)::

    from tpuseg import Config, load_config, build_model
    from tpuseg.train.trainer import Trainer
    from tpuseg.infer import Predictor, VideoPipeline
"""

from tpuseg.configs import (
    Config,
    DataConfig,
    DatasetSourceConfig,
    ExportConfig,
    InferConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    load_config,
)
from tpuseg.models.registry import MODEL_REGISTRY, build_model
from tpuseg.version import __version__

__all__ = [
    "__version__",
    "Config",
    "DataConfig",
    "DatasetSourceConfig",
    "ExportConfig",
    "InferConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "load_config",
    "build_model",
    "MODEL_REGISTRY",
]
