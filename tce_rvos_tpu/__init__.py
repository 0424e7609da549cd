"""TCE-RVOS-TPU: a TPU-native referring video object segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
haliphinx/TCE-RVOS (WACV 2024) — temporal-context-enhanced referring VOS:
given a video clip and a natural-language expression, predict per-frame
binary masks of the referred object.

Design stance (TPU-first, not a port):
  * compute path is pure-functional JAX; hot custom op (multi-scale
    deformable attention) has a Pallas TPU kernel plus an XLA fallback;
  * all shapes static under jit (padded H/W buckets, fixed clip length);
  * channel-last (NHWC) feature layout throughout;
  * scaling via jax.sharding.Mesh + jit shardings (data axis over ICI),
    not NCCL-style process groups.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

from tce_rvos_tpu.config import ModelConfig, TrainConfig  # noqa: F401
