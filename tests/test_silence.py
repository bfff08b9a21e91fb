"""Kaldi silence-phone semantics for the sMBR/MPE expected-accuracy kernels.

Reference behavior: LatticeForwardBackwardMpeVariants
(kaldi/src/lat/lattice-functions.cc; SURVEY.md:234, VERDICT r2 item 2):
  * one_silence_class=False (Kaldi default): a frame is correct iff its
    label matches the reference AND the hypothesis phone is not silence.
  * one_silence_class=True: correct iff the label matches OR both the
    hypothesis and the reference are silence (one collapsed silence class).

Ground truth is brute-force path enumeration; the five kernel families
(arc-table, dense state-matmul, structured bigram, per-utterance batched,
banded time-sync) are then cross-checked against the brute-forced one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.graph import (HmmTopology, TransitionModel,
                                estimate_phone_bigram, make_den_graph)
from pykaldi2_tpu.ops.fsa import DenseFsa, brute_force_paths
from pykaldi2_tpu.ops.fb import (SilenceOpts, frame_accuracy,
                                 fsa_expected_accuracy, make_silence_opts,
                                 pack_graph)

PHONES = [1, 2, 3, 4]
SIL = 2  # designated silence phone


def _sil_opts(tm, osc):
    return make_silence_opts(tm, [SIL], one_silence_class=osc)


def _brute_acc(fsa, obs, ref, level, tbl, osc):
    """Brute-force E[#correct] with the Kaldi silence rules applied."""
    paths = brute_force_paths(fsa, obs.shape[0])
    lab = fsa.pdf if level == "pdf" else fsa.phone
    scores, accs = [], []
    for arcs, w in paths:
        s = w + sum(obs[t, fsa.pdf[e]] for t, e in enumerate(arcs))
        a = 0.0
        for t, e in enumerate(arcs):
            match = lab[e] == ref[t]
            if tbl is None:
                a += 1.0 if match else 0.0
            elif osc:
                a += 1.0 if (match or (tbl[lab[e]] and tbl[ref[t]])) else 0.0
            else:
                a += 1.0 if (match and not tbl[lab[e]]) else 0.0
        scores.append(s)
        accs.append(a)
    scores = np.array(scores)
    m = scores.max()
    post = np.exp(scores - m) / np.exp(scores - m).sum()
    return float((post * np.array(accs)).sum())


def test_frame_accuracy_rules():
    # labels: 0=speech, 1=silence, 2=speech
    tbl = jnp.asarray([0.0, 1.0, 0.0])
    lab = jnp.asarray([0, 1, 2, 1])
    ref = jnp.asarray([0, 1, 0, 0])
    plain = frame_accuracy(lab, ref, "pdf", None)
    np.testing.assert_array_equal(np.asarray(plain), [1, 1, 0, 0])
    # default: silence never scores correct, even silence-vs-silence
    s = SilenceOpts(sil_pdf=tbl, sil_phone=None)
    np.testing.assert_array_equal(
        np.asarray(frame_accuracy(lab, ref, "pdf", s)), [1, 0, 0, 0])
    # one_silence_class: silence-vs-silence is correct
    s1 = SilenceOpts(sil_pdf=tbl, sil_phone=None, one_silence_class=True)
    np.testing.assert_array_equal(
        np.asarray(frame_accuracy(lab, ref, "pdf", s1)), [1, 1, 0, 0])
    # phone level must use the phone table
    with pytest.raises(ValueError):
        frame_accuracy(lab, ref, "phone", s)


def test_make_silence_opts_masks():
    tm = TransitionModel(HmmTopology.three_state(PHONES))
    s = make_silence_opts(tm, [SIL])
    # CI numbering: phone p's pdfs are contiguous; silence pdfs only for SIL
    pdf_mask = np.asarray(s.sil_pdf)
    want = np.zeros(tm.num_pdfs)
    for (p, _j, pdf) in tm.tuples:
        if p == SIL:
            want[pdf] = 1.0
    np.testing.assert_array_equal(pdf_mask, want)
    ph = np.asarray(s.sil_phone)
    assert ph[SIL] == 1.0 and ph.sum() == 1.0
    assert make_silence_opts(tm, []) is None
    assert make_silence_opts(tm, None) is None


def _toy_graph(seed=0, num_states=4, num_pdfs=3, num_arcs=10):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, num_states, num_arcs).astype(np.int32)
    dst = rng.randint(0, num_states, num_arcs).astype(np.int32)
    src[0] = 0
    pdf = rng.randint(0, num_pdfs, num_arcs).astype(np.int32)
    weight = rng.randn(num_arcs).astype(np.float32) * 0.5
    final = np.full(num_states, -np.inf, np.float32)
    final[rng.randint(1, num_states)] = 0.0
    final[0] = -0.5
    phone = rng.randint(0, 2, num_arcs).astype(np.int32)
    return DenseFsa(num_states, src, dst, pdf, weight, final, 0, phone).validate()


@pytest.mark.parametrize("level", ["pdf", "phone"])
@pytest.mark.parametrize("osc", [False, True])
def test_arc_table_silence_matches_brute_force(level, osc):
    fsa = _toy_graph(6)
    g = pack_graph(fsa)
    # pdf 1 / phone 1 designated silence
    tbl_np = np.array([0.0, 1.0, 0.0]) if level == "pdf" else np.array([0.0, 1.0])
    sil = SilenceOpts(
        sil_pdf=jnp.asarray(tbl_np) if level == "pdf" else None,
        sil_phone=jnp.asarray(tbl_np) if level == "phone" else None,
        one_silence_class=osc)
    rng = np.random.RandomState(17)
    t_len = 4
    obs = rng.randn(1, t_len, 3).astype(np.float32)
    nlab = 3 if level == "pdf" else 2
    ref = rng.randint(0, nlab, (1, t_len)).astype(np.int32)
    ref[0, 0] = 1  # guarantee silence appears in the reference
    f = float(fsa_expected_accuracy(
        jnp.asarray(obs), g, jnp.asarray(ref), jnp.asarray([t_len]),
        level, sil)[0])
    want = _brute_acc(fsa, obs[0].astype(np.float64), ref[0], level, tbl_np, osc)
    np.testing.assert_allclose(f, want, rtol=1e-4, atol=1e-5)
    f0 = float(fsa_expected_accuracy(
        jnp.asarray(obs), g, jnp.asarray(ref), jnp.asarray([t_len]), level)[0])
    if osc:
        # with a SINGLE silence label at this level, one_silence_class
        # reduces to plain equality (match OR both_sil == match)
        np.testing.assert_allclose(f, f0, rtol=1e-6)
    else:
        # default rule zeroes silence-frame credit — objective must move
        assert abs(f - f0) > 1e-6


def test_arc_table_silence_gradient_finite_diff():
    fsa = _toy_graph(7)
    g = pack_graph(fsa)
    sil = SilenceOpts(sil_pdf=jnp.asarray([0.0, 1.0, 0.0]), sil_phone=None)
    rng = np.random.RandomState(18)
    t_len = 3
    obs = rng.randn(1, t_len, 3).astype(np.float32)
    ref = np.array([[1, 0, 2]], np.int32)
    lens = jnp.asarray([t_len])

    def f(o):
        return fsa_expected_accuracy(o, g, jnp.asarray(ref), lens, "pdf", sil)

    grad = jax.grad(lambda o: jnp.sum(f(o)))(jnp.asarray(obs))
    eps = 1e-3
    fd = np.zeros_like(obs[0])
    for t in range(t_len):
        for p in range(3):
            op = obs.copy(); op[0, t, p] += eps
            om = obs.copy(); om[0, t, p] -= eps
            fd[t, p] = (float(f(jnp.asarray(op))[0])
                        - float(f(jnp.asarray(om))[0])) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grad)[0], fd, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("level", ["pdf", "phone"])
@pytest.mark.parametrize("osc", [False, True])
def test_dense_and_bigram_silence_match_generic(level, osc):
    """Cross-kernel parity: the brute-forced arc-table kernel is the anchor."""
    from pykaldi2_tpu.ops.fb_bigram import bigram_expected_accuracy, make_bigram_den
    from pykaldi2_tpu.ops.fb_dense import fsa_expected_accuracy_dense, pack_graph_dense

    topo = HmmTopology.three_state(PHONES)
    tm = TransitionModel(topo)
    lm = estimate_phone_bigram([[1, 2, 3, 4], [2, 1], [3, 3, 2, 4]], PHONES,
                               smoothing=0.7)
    den = make_den_graph(tm, lm)
    generic = pack_graph(den)
    dense = pack_graph_dense(den)
    structured = make_bigram_den(tm, lm)
    sil = _sil_opts(tm, osc)
    rng = np.random.RandomState(3)
    B, T = 2, 11
    obs = rng.randn(B, T, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([T, T - 2])
    if level == "pdf":
        ref = rng.randint(0, tm.num_pdfs, (B, T)).astype(np.int32)
    else:
        ref = rng.choice(PHONES, (B, T)).astype(np.int32)
    o = jnp.asarray(obs)
    r = jnp.asarray(ref)
    f_g = np.asarray(fsa_expected_accuracy(o, generic, r, lens, level, sil))
    f_d = np.asarray(fsa_expected_accuracy_dense(o, dense, r, lens, level, sil))
    f_s = np.asarray(bigram_expected_accuracy(o, structured, r, lens, level, sil))
    np.testing.assert_allclose(f_d, f_g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(f_s, f_g, rtol=1e-4, atol=1e-4)
    # and the gradients
    g_g = jax.grad(lambda x: jnp.sum(fsa_expected_accuracy(x, generic, r, lens, level, sil)))(o)
    g_d = jax.grad(lambda x: jnp.sum(fsa_expected_accuracy_dense(x, dense, r, lens, level, sil)))(o)
    g_s = jax.grad(lambda x: jnp.sum(bigram_expected_accuracy(x, structured, r, lens, level, sil)))(o)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_g), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g), rtol=1e-3, atol=1e-5)
    f_plain = np.asarray(fsa_expected_accuracy(o, generic, r, lens, level))
    if osc and level == "phone":
        # single silence phone: one_silence_class == plain equality
        np.testing.assert_allclose(f_g, f_plain, rtol=1e-6)
    else:
        # pdf level has 3 silence pdfs (three_state), so both rules move
        # the objective; osc=False always does
        assert np.any(np.abs(f_g - f_plain) > 1e-6)


def _time_sync_fsa(seed, t_len, k, num_pdfs):
    """Hand-built time-synchronous lattice: k states per frame, dense bands."""
    rng = np.random.RandomState(seed)
    # state 0 at frame 0; frames 1..T have k states each
    n_states = 1 + t_len * k
    frames = np.zeros(n_states, np.int32)
    for t in range(1, t_len + 1):
        frames[1 + (t - 1) * k: 1 + t * k] = t
    src, dst, pdf, w = [], [], [], []
    for t in range(t_len):
        cur = [0] if t == 0 else list(range(1 + (t - 1) * k, 1 + t * k))
        nxt = list(range(1 + t * k, 1 + (t + 1) * k))
        for s in cur:
            for d in nxt:
                src.append(s); dst.append(d)
                pdf.append(rng.randint(0, num_pdfs))
                w.append(rng.randn() * 0.3)
    final = np.full(n_states, -np.inf, np.float32)
    final[1 + (t_len - 1) * k:] = rng.randn(k).astype(np.float32) * 0.1
    fsa = DenseFsa(n_states, np.asarray(src, np.int32), np.asarray(dst, np.int32),
                   np.asarray(pdf, np.int32), np.asarray(w, np.float32),
                   final, 0).validate()
    return fsa, frames


@pytest.mark.parametrize("osc", [False, True])
def test_batched_and_banded_silence_match_shared(osc):
    """Per-utterance (fb_batched) and banded (fb_lattice) kernels vs the
    shared arc-table kernel, silence on."""
    from pykaldi2_tpu.ops.fb_batched import batched_expected_accuracy, pack_graph_batch
    from pykaldi2_tpu.ops.fb_lattice import lattice_expected_accuracy_ts, pack_time_sync

    num_pdfs = 4
    sil = SilenceOpts(sil_pdf=jnp.asarray([0.0, 1.0, 0.0, 1.0]), sil_phone=None,
                      one_silence_class=osc)
    t_len, k = 6, 3
    pairs = [_time_sync_fsa(s, t_len, k, num_pdfs) for s in (0, 1)]
    fsas = [f for (f, _fr) in pairs]
    bg = pack_graph_batch(fsas)
    lat = pack_time_sync(pairs, t_pad=t_len)
    rng = np.random.RandomState(9)
    obs = rng.randn(2, t_len, num_pdfs).astype(np.float32)
    ref = rng.randint(0, num_pdfs, (2, t_len)).astype(np.int32)
    ref[:, 0] = 1
    lens = jnp.asarray([t_len, t_len])
    o, r = jnp.asarray(obs), jnp.asarray(ref)

    f_b = np.asarray(batched_expected_accuracy(o, bg, r, lens, "pdf", None, sil))
    f_t = np.asarray(lattice_expected_accuracy_ts(o, lat, r, lens, "pdf", None, sil))
    # anchor: shared kernel per utterance
    for i, fsa in enumerate(fsas):
        g = pack_graph(fsa)
        f_s = float(fsa_expected_accuracy(o[i:i + 1], g, r[i:i + 1],
                                          lens[i:i + 1], "pdf", sil)[0])
        np.testing.assert_allclose(f_b[i], f_s, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(f_t[i], f_s, rtol=1e-4, atol=1e-5)
    # gradients agree between the two per-utterance forms
    g_b = jax.grad(lambda x: jnp.sum(batched_expected_accuracy(
        x, bg, r, lens, "pdf", None, sil)))(o)
    g_t = jax.grad(lambda x: jnp.sum(lattice_expected_accuracy_ts(
        x, lat, r, lens, "pdf", None, sil)))(o)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_b), rtol=1e-3,
                               atol=1e-5)
    # and silence changed the result
    f_plain = np.asarray(batched_expected_accuracy(o, bg, r, lens, "pdf", None))
    assert np.any(np.abs(f_b - f_plain) > 1e-6)


def test_se_train_step_silence_changes_objective():
    """make_se_train_step(smbr) with silence_phones set trains and reports a
    different objective than without — the knob is live end to end."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import chunk_samples
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.ops.fb_bigram import make_bigram_den
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.utils import make_optimizer

    tm = TransitionModel(HmmTopology.three_state(PHONES))
    lm = estimate_phone_bigram([[1, 2, 3, 4], [2, 1], [3, 3, 2, 4]], PHONES,
                               smoothing=0.7)
    den = make_bigram_den(tm, lm)
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=16)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=16, num_layers=1,
                                    output_size=tm.num_pdfs,
                                    compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="sgd", lr=0.01))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    T = 12
    rng = np.random.RandomState(0)
    S = chunk_samples(T, feat_cfg.fbank.frame_opts)
    batch = {
        "wave": jnp.asarray(rng.randn(2, S).astype(np.float32) * 1000),
        "labels": jnp.asarray(rng.randint(0, tm.num_pdfs, (2, T)).astype(np.int32)),
        "mask": jnp.ones((2, T), jnp.float32),
        "num_frames": jnp.asarray([T, T], np.int32),
    }
    key = jax.random.PRNGKey(1)
    objs = {}
    for name, sil in (("plain", None), ("sil", _sil_opts(tm, False))):
        step = make_se_train_step(model, feat_fn, opt, den, "smbr", None,
                                  acoustic_scale=0.5, ce_ratio=0.0,
                                  silence=sil, donate=False)
        _p, _o, m = step(params, opt_state, batch, key)
        objs[name] = float(m["objective"])
        assert np.isfinite(objs[name])
    assert abs(objs["plain"] - objs["sil"]) > 1e-7
