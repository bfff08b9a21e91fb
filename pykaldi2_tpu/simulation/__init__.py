"""On-the-fly data simulation: reverb (RIR), additive noise, gain/speed.

Reference behavior: pykaldi2/simulation/ (SURVEY.md §3.1 "Simulation") — the
largest Python module of the reference: sample an RIR (from a library or
generated), FFT-convolve, sample a noise clip + SNR and mix, gain/volume
perturbation, single- and multi-channel variants; speed perturbation per
BASELINE.json.

Split here: host-side numpy Simulator (parity semantics, feeds the dataset's
``simulate_fn`` hook like the reference's per-worker simulation) and batched
device-side ops (simulation/device.py) that run inside the jitted train step
for the TPU-first HBM-resident path. RIR generation follows the image-source
method (PAPERS.md: "Efficient Implementation of the Room Simulator...").
"""

from pykaldi2_tpu.simulation.rir import image_source_rir, sample_room_rir
from pykaldi2_tpu.simulation.simulator import Simulator
from pykaldi2_tpu.simulation.device import (
    batch_fft_convolve,
    batch_mix_noise_at_snr,
    batch_gain_db,
    simulate_batch,
)
