from tpuseg.data.class_maps import (
    BDD100K_CLASS_MAP,
    CARLA_CLASS_MAP,
    SEAME_CLASS_MAP,
    CLASS_NAMES,
    COLOR_MAP_BGR,
    COLOR_MAP_RGB,
    build_lut,
)
from tpuseg.data.sources import (
    BDD100KSource,
    CarlaSource,
    SEAMESource,
    SyntheticSource,
    build_source,
)
from tpuseg.data.combined import CombinedDataset, WeightedMixSampler
from tpuseg.data.pipeline import InputPipeline
from tpuseg.data.augment import augment_batch, make_augment_fn

__all__ = [
    "BDD100K_CLASS_MAP",
    "CARLA_CLASS_MAP",
    "SEAME_CLASS_MAP",
    "CLASS_NAMES",
    "COLOR_MAP_BGR",
    "COLOR_MAP_RGB",
    "build_lut",
    "BDD100KSource",
    "CarlaSource",
    "SEAMESource",
    "SyntheticSource",
    "build_source",
    "CombinedDataset",
    "WeightedMixSampler",
    "InputPipeline",
    "augment_batch",
    "make_augment_fn",
]
