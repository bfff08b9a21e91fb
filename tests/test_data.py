"""Data layer tests: WAV codec, Kaldi ark/scp IO, dataset, chunk/seq loaders."""

import numpy as np
import pytest

from pykaldi2_tpu.config import FrameOpts
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.dataloader import BucketSpec, ChunkDataloader, SeqDataloader, chunk_samples
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.data.prefetch import device_prefetch
from pykaldi2_tpu.data.wav import read_wav, write_wav

from toydata import make_toy_corpus


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    wave = (rng.randn(12345) * 5000).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, wave, 16000)
    got, rate = read_wav(str(p))
    assert rate == 16000
    np.testing.assert_allclose(got, np.rint(np.clip(wave, -32768, 32767)), atol=0.501)


def test_wav_stereo_and_normalize(tmp_path):
    rng = np.random.RandomState(1)
    wave = (rng.randn(1000, 2) * 1000).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, wave, 8000)
    got, rate = read_wav(str(p), normalize=True)
    assert got.shape == (1000, 2) and rate == 8000
    assert np.abs(got).max() <= 1.0


def test_ark_scp_matrix_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    mats = {f"u{i}": rng.randn(10 + i, 7).astype(np.float32) for i in range(5)}
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with kaldi_io.ArkWriter(ark, scp, kind="mat") as w:
        for k, m in mats.items():
            w.write(k, m)
    seq = dict(kaldi_io.read_ark(ark, kind="mat"))
    assert set(seq) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(seq[k], mats[k])
    ra = kaldi_io.RandomAccessReader(scp, kind="mat")
    np.testing.assert_array_equal(ra["u3"], mats["u3"])


def test_ark_int_vector_and_double(tmp_path):
    ark = str(tmp_path / "ali.ark")
    with kaldi_io.ArkWriter(ark, kind="ivec") as w:
        w.write("a", np.array([1, 2, 3, 100000], np.int32))
        w.write("b", np.array([], np.int32))
    got = dict(kaldi_io.read_ark(ark, kind="ivec"))
    np.testing.assert_array_equal(got["a"], [1, 2, 3, 100000])
    assert got["b"].size == 0
    ark2 = str(tmp_path / "d.ark")
    with kaldi_io.ArkWriter(ark2, kind="vec") as w:
        w.write("v", np.arange(5, dtype=np.float64))
    (k, v), = list(kaldi_io.read_ark(ark2, kind="vec"))
    assert v.dtype == np.float64
    np.testing.assert_array_equal(v, np.arange(5))


def test_text_ark_roundtrip(tmp_path):
    p = str(tmp_path / "ali.txt")
    kaldi_io.write_text_ark(p, [("u1", [0, 1, 2]), ("u2", [5])])
    got = dict(kaldi_io.read_text_ark(p))
    np.testing.assert_array_equal(got["u1"], [0, 1, 2])


def test_dataset_and_chunk_loader(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=6, seed=3)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    assert len(ds) == 6
    utt = ds[0]
    assert utt.wave is not None and utt.labels is not None
    assert utt.num_frames == len(utt.labels)

    loader = ChunkDataloader(ds, batch_size=4, chunk_len=50, shuffle=True, seed=0)
    total_sup = 0
    S = chunk_samples(50, ds.frame_opts)
    for batch in loader:
        assert batch["wave"].shape == (4, S)
        assert batch["labels"].shape == (4, 50)
        assert ((batch["labels"] >= 0) == (batch["mask"] > 0)).all()
        total_sup += int(batch["mask"].sum())
    expect = sum(ds.utt_num_frames(u) for u in ds.utt_ids)
    assert total_sup == expect  # every supervised frame appears exactly once


def test_chunk_loader_overlap(tmp_path):
    """chunk_overlap: context frames are model-visible but loss-masked;
    every frame is supervised exactly once; num_batches stays truthful."""
    paths = make_toy_corpus(str(tmp_path), num_utts=5, seed=3)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                       frame_opts=FrameOpts(dither=0.0))
    T, K = 50, 10
    loader = ChunkDataloader(ds, batch_size=4, chunk_len=T, shuffle=False,
                             chunk_overlap=K, drop_last=False)
    n_batches = 0
    sup = 0
    ctx = 0
    for batch in loader:
        n_batches += 1
        assert batch["labels"].shape == (4, T)
        sup += int((batch["labels"] >= 0).sum())
        # context frames: valid for the model, no supervision
        ctx += int(((batch["labels"] < 0) & (batch["mask"] > 0)).sum())
    expect = sum(ds.utt_num_frames(u) for u in ds.utt_ids)
    assert sup == expect          # exactly-once supervision despite overlap
    assert ctx > 0                # overlap actually produced context frames
    assert n_batches == loader.num_batches()

    # the context frames' waveform slices are bit-identical re-reads of the
    # same utterance audio: total valid frames = supervised + K per extra
    # chunk of each utterance
    stride = T - K
    extra_chunks = sum(
        max(0, -(-(ds.utt_num_frames(u) - T) // stride))
        for u in ds.utt_ids)
    assert ctx == K * extra_chunks

    # overlap=0 is the old stride exactly
    base = ChunkDataloader(ds, batch_size=4, chunk_len=T, shuffle=False)
    assert base.num_batches() <= loader.num_batches()


def test_chunk_loader_rank_sharding(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=8, seed=4)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    sup = 0
    for rank in range(2):
        loader = ChunkDataloader(ds, batch_size=2, chunk_len=40, rank=rank, world_size=2, shuffle=False)
        for b in loader:
            sup += int(b["mask"].sum())
    assert sup == sum(ds.utt_num_frames(u) for u in ds.utt_ids)


def test_seq_loader_buckets(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=10, min_sec=0.5, max_sec=3.0, seed=5)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    spec = BucketSpec(boundaries=(100, 200, 400), batch_sizes=(4, 4, 2))
    loader = SeqDataloader(ds, spec, shuffle=False)
    seen = set()
    shapes = set()
    for b in loader:
        T = b["labels"].shape[1]
        assert T in spec.boundaries
        shapes.add((b["wave"].shape, b["labels"].shape))
        for i, uid in enumerate(b["utt_ids"]):
            seen.add(uid)
            nf = b["num_frames"][i]
            assert nf == ds.utt_num_frames(uid)
            assert (b["labels"][i, :nf] >= 0).all()
            assert (b["mask"][i, nf:] == 0).all()
    # every utt short enough for a bucket is seen exactly once
    expect = {u for u in ds.utt_ids if ds.utt_num_frames(u) <= 400}
    assert seen == expect
    assert len(shapes) <= 2 * len(spec.boundaries)  # static shape inventory


def test_feats_mode_dataset(tmp_path):
    rng = np.random.RandomState(6)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with kaldi_io.ArkWriter(ark, scp, kind="mat") as w:
        for i in range(3):
            w.write(f"u{i}", rng.randn(30 + i, 12).astype(np.float32))
    ds = SpeechDataset(feats_scp=scp)
    u = ds[1]
    assert u.feats.shape == (31, 12) and u.num_frames == 31
    loader = ChunkDataloader(ds, batch_size=2, chunk_len=10, shuffle=False)
    b = next(iter(loader))
    assert b["feats"].shape == (2, 10, 12)


def test_device_prefetch(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=4, seed=7)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    loader = ChunkDataloader(ds, batch_size=2, chunk_len=30, shuffle=False)
    n = 0
    for batch in device_prefetch(iter(loader), size=2):
        import jax
        assert isinstance(batch["wave"], jax.Array)
        n += 1
    assert n > 0


def test_prefetch_propagates_errors():
    def bad():
        yield {"x": np.zeros(3)}
        raise RuntimeError("loader boom")

    with pytest.raises(RuntimeError, match="loader boom"):
        for _ in device_prefetch(bad()):
            pass


def test_hdf5_corpus_roundtrip(tmp_path):
    from pykaldi2_tpu.data.hdf5_io import write_corpus
    rng = np.random.RandomState(11)
    utts = [(f"u{i}", (rng.randn(4000 + 100 * i) * 2000).astype(np.float32),
             rng.randint(0, 5, 23 + i).astype(np.int32)) for i in range(3)]
    path = str(tmp_path / "corpus.h5")
    write_corpus(path, utts)
    ds = SpeechDataset.from_hdf5(path, frame_opts=FrameOpts(dither=0.0))
    assert len(ds) == 3
    u = ds.get("u1")
    np.testing.assert_array_equal(u.wave, utts[1][1])
    assert u.labels is not None and u.num_frames == len(u.labels)
    loader = ChunkDataloader(ds, batch_size=2, chunk_len=10, shuffle=False)
    b = next(iter(loader))
    assert b["wave"].shape[0] == 2


def test_tid_to_pdf_mapping(tmp_path):
    """Alignments in transition-ids are mapped to pdf-ids at load time."""
    paths = make_toy_corpus(str(tmp_path), num_utts=2, num_pdfs=3, seed=14)
    # rewrite alignments as fake tids: tid = pdf + 1 (tid 0 invalid)
    alis = dict(kaldi_io.read_ark(paths["ali"], kind="ivec"))
    tid_ark = str(tmp_path / "tid_ali.ark")
    with kaldi_io.ArkWriter(tid_ark, kind="ivec") as w:
        for uid, lab in alis.items():
            w.write(uid, (lab + 1).astype(np.int32))
    tid_to_pdf = np.array([-1, 0, 1, 2], np.int32)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=tid_ark,
                       frame_opts=FrameOpts(dither=0.0), tid_to_pdf=tid_to_pdf)
    for uid in ds.utt_ids:
        np.testing.assert_array_equal(ds.labels[uid], alis[uid])


def test_compressed_matrix_roundtrip(tmp_path):
    from pykaldi2_tpu.data.kaldi_io import read_matrix, write_compressed_matrix
    import io
    rng = np.random.RandomState(20)
    mat = (rng.randn(30, 13) * 5 + 2).astype(np.float32)
    for fmt, tol in [("CM2", 1e-3), ("CM3", 0.15)]:
        buf = io.BytesIO()
        write_compressed_matrix(buf, mat, fmt)
        buf.seek(0)
        got = read_matrix(buf)
        assert got.shape == mat.shape
        np.testing.assert_allclose(got, mat, atol=tol * (mat.max() - mat.min()))


def test_compressed_matrix_cm1_decode():
    """Hand-built percentile-coded CM record decodes with the Kaldi formulas."""
    import io
    import struct
    from pykaldi2_tpu.data.kaldi_io import read_matrix
    rows, cols = 4, 2
    min_v, rng_v = -1.0, 2.0
    buf = io.BytesIO()
    buf.write(b"CM ")
    buf.write(struct.pack("<ffii", min_v, rng_v, rows, cols))
    # per-column percentiles at codes 0, 16384, 49152, 65535
    for _ in range(cols):
        buf.write(struct.pack("<4H", 0, 16384, 49152, 65535))
    # bytes: 0 → p0; 64 → p25; 192 → p75; 255 → p100
    buf.write(bytes([0, 64, 192, 255] * cols))
    buf.seek(0)
    got = read_matrix(buf)
    p = min_v + np.array([0, 16384, 49152, 65535]) * (rng_v / 65535.0)
    np.testing.assert_allclose(got[:, 0], p, atol=1e-4)


def test_piped_wav_rxfilename(tmp_path):
    rng = np.random.RandomState(21)
    wave = (rng.randn(2000) * 3000).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, wave, 16000)
    got, rate = read_wav(f"cat {p} |")
    assert rate == 16000
    np.testing.assert_allclose(got, np.rint(np.clip(wave, -32768, 32767)), atol=0.501)


def test_chunk_shuffle_buffer_spreads_and_preserves_frames(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=6, seed=25)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    expect = sum(ds.utt_num_frames(u) for u in ds.utt_ids)
    loader = ChunkDataloader(ds, batch_size=4, chunk_len=30, shuffle=True, seed=6,
                             chunk_shuffle_buffer=16)
    total = 0
    for b in loader:
        assert b["labels"].shape == (4, 30)
        total += int(b["mask"].sum())
    assert total == expect  # reservoir loses nothing
    # reproducible across runs
    a = [b["labels"].copy() for b in ChunkDataloader(ds, batch_size=4, chunk_len=30,
                                                     shuffle=True, seed=6, chunk_shuffle_buffer=16)]
    c = [b["labels"].copy() for b in ChunkDataloader(ds, batch_size=4, chunk_len=30,
                                                     shuffle=True, seed=6, chunk_shuffle_buffer=16)]
    for x, y in zip(a, c):
        np.testing.assert_array_equal(x, y)


def test_unlabeled_data_gets_valid_frame_mask(tmp_path):
    """Decode-time regression: mask must mark valid FRAMES even with no labels,
    or the model sees an all-zero mask and outputs constant garbage."""
    from pykaldi2_tpu.data.dataloader import BucketSpec, SeqDataloader

    paths = make_toy_corpus(str(tmp_path), num_utts=3, seed=31)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], frame_opts=FrameOpts(dither=0.0))  # no ali
    assert ds.labels is None
    for b in SeqDataloader(ds, BucketSpec(boundaries=(400,), batch_sizes=3), shuffle=False):
        for i, uid in enumerate(b["utt_ids"]):
            nf = b["num_frames"][i]
            assert b["mask"][i, :nf].all() and not b["mask"][i, nf:].any()
            assert (b["labels"][i] == -1).all()
    loader = ChunkDataloader(ds, batch_size=2, chunk_len=30, shuffle=False)
    got_any = False
    for b in loader:
        got_any = True
        assert b["mask"].sum() > 0
    assert got_any


def test_gzipped_alignment_ark(tmp_path):
    """Real Kaldi alignment archives ship gzipped (ali.*.gz): transparent read."""
    import gzip
    import io

    from pykaldi2_tpu.data import kaldi_io

    alis = {"u1": np.array([1, 2, 3, 2], np.int32),
            "u2": np.array([4, 4], np.int32)}
    plain = tmp_path / "ali.ark"
    with kaldi_io.ArkWriter(str(plain), kind="ivec") as w:
        for k, v in alis.items():
            w.write(k, v)
    gz = tmp_path / "ali.1.gz"
    with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    got = dict(kaldi_io.read_ark(str(gz), kind="ivec"))
    assert set(got) == set(alis)
    for k in alis:
        np.testing.assert_array_equal(got[k], alis[k])


def test_from_config_hdf5_and_feats_modes(tmp_path):
    """DataConfig reaches all three corpus modes (wav/feats/hdf5) —
    VERDICT r1 loader-hygiene item."""
    import h5py
    from pykaldi2_tpu.config import DataConfig
    from pykaldi2_tpu.data import kaldi_io
    from pykaldi2_tpu.data.hdf5_io import write_corpus

    rng = np.random.RandomState(0)
    # hdf5 wave corpus
    h5 = tmp_path / "corpus.h5"
    utts = {f"u{i}": ((rng.randn(4000) * 500).astype(np.float32),
                      rng.randint(0, 4, 24).astype(np.int32)) for i in range(3)}
    write_corpus(str(h5), [(u, w, l) for u, (w, l) in utts.items()], kind="wave")
    cfg = DataConfig(hdf5=str(h5))
    ds = SpeechDataset.from_config(cfg)
    assert ds.mode == "wave" and len(ds) == 3
    utt = ds.get("u1")
    assert utt.wave is not None and utt.labels is not None

    # feats corpus via scp
    ark = str(tmp_path / "feats.ark")
    with kaldi_io.ArkWriter(ark, ark + ".scp", kind="mat") as w:
        for i in range(2):
            w.write(f"f{i}", rng.randn(10, 8).astype(np.float32))
    ali = str(tmp_path / "ali.ark")
    with kaldi_io.ArkWriter(ali, kind="ivec") as w:
        for i in range(2):
            w.write(f"f{i}", rng.randint(0, 4, 10).astype(np.int32))
    cfg2 = DataConfig(feats_scp=ark + ".scp", label_ark=ali)
    ds2 = SpeechDataset.from_config(cfg2)
    assert ds2.mode == "feats" and len(ds2) == 2
    assert ds2.get("f0").feats.shape == (10, 8)


def test_hdf5_unlabeled_utt_num_frames(tmp_path):
    """Regression (round-2 review): hdf5 corpora without labels crashed
    utt_num_frames by treating the utt id as a file path."""
    from pykaldi2_tpu.config import DataConfig
    from pykaldi2_tpu.data.hdf5_io import write_corpus

    rng = np.random.RandomState(1)
    h5 = tmp_path / "c.h5"
    write_corpus(str(h5), [(f"u{i}", (rng.randn(3200) * 500).astype(np.float32))
                           for i in range(2)], kind="wave")
    ds = SpeechDataset.from_config(DataConfig(hdf5=str(h5)))
    assert ds.labels is None
    nf = ds.utt_num_frames("u0")
    assert nf > 0
    # label_ark merges with (empty) archive labels rather than replacing
    from pykaldi2_tpu.data import kaldi_io
    ali = str(tmp_path / "a.ark")
    with kaldi_io.ArkWriter(ali, kind="ivec") as w:
        w.write("u0", np.arange(nf, dtype=np.int32) % 3)
    ds2 = SpeechDataset.from_config(DataConfig(hdf5=str(h5), label_ark=ali))
    assert ds2.utt_ids == ["u0"]
    assert ds2.utt_num_frames("u0") == nf
