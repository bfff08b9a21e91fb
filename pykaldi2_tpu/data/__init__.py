"""Data layer: readers, datasets, batchers, device prefetch.

Reference behavior: pykaldi2/data/ + pykaldi2/reader/ (SURVEY.md §3.1 rows
"Chunk dataloader", "Sequence dataloader", "Dataset", "Readers / IO") — a
torch Dataset/DataLoader stack over wav/hdf5/ark archives with
DistributedSampler sharding.

TPU-first redesign: the host side produces fixed-shape numpy batches
(chunked for CE, sorted-bucket padded for SE — replacing PackedSequence) and
double-buffers them onto the device; featurization and simulation run inside
the jitted step on device.
"""

from pykaldi2_tpu.data.wav import read_wav, write_wav
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.dataset import SpeechDataset, Utterance
from pykaldi2_tpu.data.dataloader import ChunkDataloader, SeqDataloader, BucketSpec
from pykaldi2_tpu.data.prefetch import device_prefetch
