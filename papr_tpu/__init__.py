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

# Persistent compilation cache: remote TPU compiles in this environment take
# 1-5 minutes; the on-disk cache makes reruns (bench, CLIs, resume) near
# instant. Disable with PAPR_JAX_CACHE=0 or point elsewhere with a path.
import os as _os

_cache = _os.environ.get("PAPR_JAX_CACHE", "")
if _cache != "0":
    _dir = _cache or _os.path.join(
        _os.path.expanduser("~"), ".cache", "papr_tpu_jax")
    try:
        _jax.config.update("jax_compilation_cache_dir", _dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from .config import Config, load_config, merge_config  # noqa: F401
