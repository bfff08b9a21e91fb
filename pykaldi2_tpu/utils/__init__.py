"""Utilities: logging/metrics, checkpointing, LR schedules.

Reference behavior: pykaldi2/utils/ + the per-epoch ``torch.save`` checkpoints
and rank-0 logging in bin/train_*.py (SURVEY.md §6.4–6.5).
"""

from pykaldi2_tpu.utils.logging import MetricsLogger, setup_logging
from pykaldi2_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from pykaldi2_tpu.utils.lr import make_optimizer, PlateauAnnealer
