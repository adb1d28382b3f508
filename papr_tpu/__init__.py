"""papr-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of PAPR.

Proximity Attention Point Rendering (NeurIPS 2023, arXiv 2307.11086),
re-designed for TPU: functional pytree model, static-shape masked point
cloud, MXU-formulated top-k, bf16 compute, pjit/shard_map data parallelism.
"""

__version__ = "0.1.0"

import jax as _jax

# Matmul precision is set per-op, not globally: fp32 compute paths (parity
# mode, distance/top-k ordering) request Precision.HIGHEST explicitly, while
# bf16 fast paths ride the backend default (a global "highest" was measured
# to slow bf16 embedder matmuls by ~22% on v5e).

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
