from tpuseg.core.mesh import (
    MESH_AXES,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    local_device_kind,
)
from tpuseg.core.dtypes import DTypePolicy
from tpuseg.core.prng import PRNGSequence

__all__ = [
    "MESH_AXES",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "local_device_kind",
    "DTypePolicy",
    "PRNGSequence",
]
