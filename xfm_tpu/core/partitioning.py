"""Parameter partitioning rules: path-regex → PartitionSpec.

The reference replicates all parameters (pure DDP). Here every parameter
gets a PartitionSpec over the (data, fsdp, tensor) mesh:

- tensor axis: Megatron-style — qkv/fc1 kernels sharded on the output dim,
  attention-out/fc2 kernels sharded on the input dim, so each layer needs a
  single psum on its residual write (inserted automatically by GSPMD).
- fsdp axis: remaining large dims sharded ZeRO-3 style; XLA all-gathers
  parameters just-in-time per layer.

Rules are matched on '/'-joined flax param paths, first match wins.
"""
from __future__ import annotations

import re
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TENSOR_AXIS

# (regex, spec). Specs are written for the param's actual rank; `None` entries
# mean replicated dims. Embeddings: (vocab, hidden) → shard vocab over fsdp.
DEFAULT_RULES: Sequence[tuple[str, P]] = (
    # --- tensor-parallel pairs -------------------------------------------
    # fused / separate qkv and MLP-in: shard output features.
    (r".*(query|key|value|qkv|fc1|intermediate/dense|vision_proj|text_proj)/kernel$",
     P(FSDP_AXIS, TENSOR_AXIS)),
    (r".*(query|key|value|qkv|fc1|intermediate/dense)/bias$", P(TENSOR_AXIS)),
    # attention out / MLP-out: shard input features.
    (r".*(attn_out|attention/output/dense|fc2|ffn_output/dense)/kernel$",
     P(TENSOR_AXIS, FSDP_AXIS)),
    # --- embeddings -------------------------------------------------------
    (r".*(word_embeddings|token_embedding)/embedding$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r".*(position_embeddings|token_type_embeddings)/embedding$", P(None, FSDP_AXIS)),
    # --- generic 2D kernels: fsdp on the bigger (input) dim ---------------
    (r".*/kernel$", P(FSDP_AXIS, None)),
    # BEiT patch embed is a bare param named patch_embed_kernel ([P²·3, C]),
    # not a Dense '/kernel' — without its own rule it silently replicated
    # 2.3 MB/layer0 (caught by scripts/flagship_compile.py's no-large-
    # replicated assertion).
    (r".*patch_embed_kernel$", P(FSDP_AXIS, None)),
    # --- everything else (biases, LayerNorm scales, cls tokens, rel-pos
    #     tables, LayerScale gammas, temp) is small: replicate -------------
    (r".*", P()),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def spec_for(path_str: str, rules=DEFAULT_RULES) -> P:
    for pat, spec in rules:
        if re.match(pat, path_str):
            return spec
    return P()


def _fit_spec(spec: P, ndim: int) -> P:
    """Trim/pad a spec to the param's rank; drop axes that don't divide."""
    parts = list(spec) + [None] * max(0, ndim - len(spec))
    return P(*parts[:ndim])


def param_specs(params, rules=DEFAULT_RULES):
    """PartitionSpec pytree matching `params` (works on shapes or arrays)."""

    def one(path, x):
        ndim = len(getattr(x, "shape", ()))
        spec = _fit_spec(spec_for(_path_str(path), rules), ndim)
        # Drop sharded axes that don't divide the dim evenly — XLA requires
        # even sharding; uneven dims (e.g. vocab 50265) fall back to
        # replicated on that dim.
        return spec

    return jax.tree_util.tree_map_with_path(one, params)


def validated_specs(params, mesh: Mesh, rules=DEFAULT_RULES):
    """Like param_specs, but drops mesh axes that don't evenly divide dims."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def one(path, x):
        shape = getattr(x, "shape", ())
        spec = _fit_spec(spec_for(_path_str(path), rules), len(shape))
        fixed = []
        for dim, ax in zip(shape, spec):
            if ax is None:
                fixed.append(None)
                continue
            axes = ax if isinstance(ax, tuple) else (ax,)
            size = 1
            for a in axes:
                size *= axis_sizes.get(a, 1)
            fixed.append(ax if size > 0 and dim % size == 0 else None)
        return P(*fixed)

    return jax.tree_util.tree_map_with_path(one, params)


def param_shardings(params, mesh: Mesh, rules=DEFAULT_RULES):
    specs = validated_specs(params, mesh, rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda s: isinstance(s, P))


def shard_params(params, mesh: Mesh, rules=DEFAULT_RULES):
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)
