"""PBNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) 3D point-cloud instance
segmentation framework with the capabilities of weiguangzhao/PBNet (ICCV 2023).

Layering (bottom-up):
  core/      sparse-voxel engine (coordinate keys, quantization, kernel maps)
  nn/        sparse neural-net modules (conv, norm, blocks, MinkUNet family)
  models/    PBNet model (backbone + clustering + mask + score stages), losses
  ops/       TPU-native equivalents of the reference's PB_lib CUDA ops
  parallel/  device-mesh data parallelism (shard_map, psum grads, sync BN)
  data/      ScanNet v2 decode + host data pipeline
  tools/     logging, checkpointing, metrics, ScanNet AP evaluation protocol
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles of sort-heavy topology graphs
# are expensive (~20s per lax.sort shape on v5e); caching them on disk makes
# every process after the first start instantly.  Disable with
# PBNET_TPU_NO_CACHE=1.
if not _os.environ.get("PBNET_TPU_NO_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "PBNET_TPU_CACHE_DIR",
        _os.path.expanduser("~/.cache/pbnet_tpu/xla_cache"),
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
