"""Decoding and scoring: native beam decoder bindings, WER, eval pipeline.

Reference behavior: pykaldi2's decode/eval path via
kaldi.asr.MappedLatticeFasterRecognizer + compute-wer (SURVEY.md §4.4); here
the decoder is our own C++ component (native/latdec.cc) bound with ctypes,
and lattices come back as dense arc tables the on-device FB kernels consume
(the "on-the-fly denominator lattices" mode of BASELINE.json config #3).
"""

from pykaldi2_tpu.decode.decoder import LatticeDecoder, build_native
from pykaldi2_tpu.decode.wer import edit_distance, score_corpus
