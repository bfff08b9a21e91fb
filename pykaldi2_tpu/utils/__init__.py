"""Utilities: logging/metrics, checkpointing, LR schedules.

Reference behavior: pykaldi2/utils/ + the per-epoch ``torch.save`` checkpoints
and rank-0 logging in bin/train_*.py (SURVEY.md §6.4–6.5).
"""

from pykaldi2_tpu.utils.logging import MetricsLogger, setup_logging
from pykaldi2_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from pykaldi2_tpu.utils.lr import make_optimizer, PlateauAnnealer


def apply_platform_env():
    """PK2_PLATFORM=cpu|tpu pins the jax backend (the axon TPU plugin ignores
    the standard JAX_PLATFORMS env var). Call first thing in CLI mains."""
    import os

    plat = os.environ.get("PK2_PLATFORM")
    if plat:
        import jax

        if plat == "tpu" and "axon" in os.environ.get("JAX_PLATFORMS", ""):
            # Remote-TPU tunnel: the chip registers as platform "axon" and
            # initializing "tpu" fails outright (no local device; explicit
            # jax_platforms lists have no fallback semantics). Honor the
            # PK2_PLATFORM=tpu contract by pinning the tunnel platform.
            plat = "axon"
        jax.config.update("jax_platforms", plat)
