"""Kaldi-parity feature front end, TPU-native.

Reference behavior: kaldi/src/feat/{feature-window,mel-computations,
feature-fbank,feature-mfcc,feature-functions}.{h,cc} as invoked by pykaldi2's
data layer through PyKaldi ``kaldi.feat`` (SURVEY.md §3.1 "Front end").

Design: all framing/windowing/FFT/mel work is expressed as batched, statically
shaped fp32 JAX ops so XLA maps the DFT+mel GEMMs onto the MXU; the mel matrix
and window vectors are host-built numpy constants. ``compute_fbank`` /
``compute_mfcc`` operate on whole (possibly padded) waveform batches under
``jit``.
"""

from pykaldi2_tpu.frontend.window import (
    num_frames,
    extract_frames,
    process_frames,
    feature_window,
)
from pykaldi2_tpu.frontend.mel import mel_banks, mel_scale, inverse_mel_scale
from pykaldi2_tpu.frontend.fbank import compute_fbank, fbank_dim
from pykaldi2_tpu.frontend.mfcc import compute_mfcc
from pykaldi2_tpu.frontend.cmvn import (
    acc_cmvn_stats,
    apply_cmvn,
    apply_cmvn_sliding,
    utterance_cmvn,
)
from pykaldi2_tpu.frontend.delta import add_deltas, delta_matrix
from pykaldi2_tpu.frontend.splice import splice_frames
