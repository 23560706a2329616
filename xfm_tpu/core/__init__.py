from .config import load_config, load_json, load_yaml, resolve_vision_config, dump_config
from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    TENSOR_AXIS,
    BATCH_AXES,
    make_mesh,
    mesh_from_config,
    batch_sharding,
    replicated,
    shard_batch,
    maybe_init_distributed,
)
from .precision import Policy, DEFAULT as DEFAULT_POLICY, FULL_F32, policy_from_config, DynamicScaler
from .partitioning import param_specs, validated_specs, param_shardings, shard_params, DEFAULT_RULES
