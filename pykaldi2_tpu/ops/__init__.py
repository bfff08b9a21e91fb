"""Loss ops: frame CE and lattice-based sequence-discriminative losses.

Reference behavior: nn.CrossEntropyLoss in train_ce plus the SE loss code
wrapping Kaldi's LatticeForwardBackward* (SURVEY.md §3.1 "SE loss ops").
"""

from pykaldi2_tpu.ops.losses import ce_loss, frame_accuracy
