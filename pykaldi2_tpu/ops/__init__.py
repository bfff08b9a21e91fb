"""Loss ops: frame CE and lattice-based sequence-discriminative losses.

Reference behavior: nn.CrossEntropyLoss in train_ce plus the SE loss code
wrapping Kaldi's LatticeForwardBackward* (SURVEY.md §3.1 "SE loss ops").
"""

from pykaldi2_tpu.ops.losses import ce_loss, frame_accuracy
from pykaldi2_tpu.ops.fsa import DenseFsa, linear_chain_fsa, load_fsa, save_fsa
from pykaldi2_tpu.ops.fb import (
    fsa_expected_accuracy,
    fsa_logz,
    fsa_occupancies,
    fsa_viterbi,
    pack_graph,
)
from pykaldi2_tpu.ops.fb_batched import (
    BatchedGraphs,
    fsa_logz_b,
    fsa_occupancies_b,
    mmi_objective_lattice,
    pack_graph_batch,
)
from pykaldi2_tpu.ops.fb_bigram import (
    BigramDenGraph,
    bigram_expected_accuracy,
    bigram_logz,
    bigram_occupancies,
    make_bigram_den,
)
from pykaldi2_tpu.ops.se_losses import mmi_loss, mmi_objective, smbr_loss
