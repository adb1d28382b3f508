"""papr-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of PAPR.

Proximity Attention Point Rendering (NeurIPS 2023, arXiv 2307.11086),
re-designed for TPU: functional pytree model, static-shape masked point
cloud, MXU-formulated top-k, bf16 compute, pjit/shard_map data parallelism.
"""

__version__ = "0.1.0"

import jax as _jax

# Full fp32 precision whenever operands are fp32 (top-k distance ordering and
# parity paths depend on it). Fast paths opt into speed by casting to bf16
# explicitly (nn.mlp.Policy), which native MXU execution honors regardless of
# this setting.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from .config import Config, load_config, merge_config  # noqa: F401
