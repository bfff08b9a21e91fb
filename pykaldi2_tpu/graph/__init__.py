"""HMM/FST graph layer: topology, transition model, graph compilers.

Replaces the Kaldi components pykaldi2 reaches through PyKaldi
(SURVEY.md §3.2: "Kaldi HMM/transition model", "OpenFst", "Kaldi graph
build"): a TransitionModel over configurable HMM topologies, a minimal
host-side FST with composition, phone-bigram LM estimation, and compilers
that emit dense tensor-encoded graphs (ops/fsa.DenseFsa) for the on-device
forward-backward kernels — numerator graphs from alignments or transcripts,
LF-MMI-style denominator graphs from a phone LM, and HCLG-style decoding
graphs for the native decoder.
"""

from pykaldi2_tpu.graph.topology import HmmTopology
from pykaldi2_tpu.graph.transition_model import TransitionModel
from pykaldi2_tpu.graph.fst import Fst
from pykaldi2_tpu.graph.vfst import VectorFst
from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram
from pykaldi2_tpu.graph.arpa import ArpaModel, arpa_to_fst, read_arpa, train_arpa, write_arpa
from pykaldi2_tpu.graph.compile import (
    make_den_graph,
    make_num_graph,
    make_linear_num_graph,
    make_decode_graph,
    make_word_decode_graph,
)
