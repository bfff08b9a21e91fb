"""pykaldi2_tpu — a TPU-native hybrid HMM/DNN speech recognition training framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyKaldi2 toolkit (github.com/jzlianglu/pykaldi2): Kaldi-parity feature front
end, on-the-fly data simulation, LSTM/TDNN acoustic models, frame-CE and
lattice-based sequence-discriminative training (MMI/sMBR/MPE), decoding and
WER scoring — redesigned TPU-first:

  * front end and simulation as batched JAX ops (fused Pallas kernels for the
    hot path) producing HBM-resident batches,
  * LSTM/TDNN under ``jit`` + ``lax.scan`` with sorted-bucket batching
    (replacing torch PackedSequence),
  * dense FSA forward-backward kernels with custom VJP replacing Kaldi's
    C++ lattice forward-backward (reference: kaldi/src/lat/lattice-functions.cc),
  * ``shard_map`` + ``psum`` over ICI replacing Horovod allreduce,
  * a native C++ beam decoder for host-side lattice generation / eval.

Layer map and parity contract: see SURVEY.md and BASELINE.json at repo root.
"""

__version__ = "0.1.0"
