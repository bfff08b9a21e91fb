"""Acoustic models: LSTM/BLSTM stacks, TDNN, output head.

Reference behavior: pykaldi2/models/lstm.py — ``LSTMStack`` (nn.LSTM) and
``NnetAM`` (backbone + output Linear over senones) (SURVEY.md §3.1 "Models").

TPU-first design: pure-JAX pytree modules. Gate-input projections for the
whole sequence are one large bf16 GEMM (MXU), the recurrence is a
``lax.scan`` with fp32 cell state, padding handled with masks instead of
PackedSequence; bidirectionality via a mask-aware reversed scan.
"""

from pykaldi2_tpu.models.lstm import LSTMStack
from pykaldi2_tpu.models.tdnn import TDNNStack
from pykaldi2_tpu.models.transformer import TransformerStack
from pykaldi2_tpu.models.nnet_am import NnetAM, build_model
