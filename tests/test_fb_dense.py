"""Dense state-matmul FB kernels vs the arc-table reference (ops/fb.py).

VERDICT round-1 item 5: the generic arc-table kernel's per-frame gathers and
segment scatters bound the loaded -den_graph path on TPU; fb_dense turns the
recursion into [B,S]x[S,S] GEMMs by exploiting the state-emission invariant
(all arcs into a state carry that state's pdf — true for every graph
graph/compile.py emits). Same math — tight parity expected.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.ops.fb import GraphArrays, fsa_logz, fsa_occupancies, pack_graph
from pykaldi2_tpu.ops.fb_dense import (
    DenseStateGraph,
    fsa_logz_dense,
    fsa_occupancies_dense,
    pack_graph_auto,
    pack_graph_dense,
    state_emission_pdfs,
)
from pykaldi2_tpu.ops.fsa import DenseFsa


def _state_graph(seed=0, num_states=6, num_pdfs=3, num_arcs=18):
    """Random graph honoring the state-emission invariant."""
    rng = np.random.RandomState(seed)
    state_pdf = rng.randint(0, num_pdfs, num_states)
    src = rng.randint(0, num_states, num_arcs).astype(np.int32)
    src[0] = 0
    dst = rng.randint(0, num_states, num_arcs).astype(np.int32)
    pdf = state_pdf[dst].astype(np.int32)
    weight = (rng.randn(num_arcs) * 0.5).astype(np.float32)
    final = np.full(num_states, -np.inf, np.float32)
    final[rng.randint(1, num_states)] = 0.0
    final[0] = -0.5
    return DenseFsa(num_states, src, dst, pdf, weight, final, 0).validate()


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_dense_logz_matches_arc_table(seed):
    fsa = _state_graph(seed)
    rng = np.random.RandomState(seed + 100)
    B, T, P = 3, 7, 3
    obs = rng.randn(B, T, P).astype(np.float32)
    lens = np.array([7, 5, 1], np.int32)
    za = np.asarray(fsa_logz(jnp.asarray(obs), pack_graph(fsa), jnp.asarray(lens)))
    zd = np.asarray(fsa_logz_dense(jnp.asarray(obs), pack_graph_dense(fsa),
                                   jnp.asarray(lens)))
    np.testing.assert_allclose(zd, za, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [2, 3])
def test_dense_occupancies_match(seed):
    fsa = _state_graph(seed, num_states=5, num_arcs=15)
    rng = np.random.RandomState(seed + 200)
    B, T, P = 2, 6, 3
    obs = rng.randn(B, T, P).astype(np.float32)
    lens = np.array([6, 4], np.int32)
    za, ga = fsa_occupancies(jnp.asarray(obs), pack_graph(fsa), jnp.asarray(lens))
    zd, gd = fsa_occupancies_dense(jnp.asarray(obs), pack_graph_dense(fsa),
                                   jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(zd), np.asarray(za), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(ga), rtol=1e-4, atol=1e-5)


def test_dense_grad_matches_arc_table():
    fsa = _state_graph(4, num_states=5, num_arcs=14)
    rng = np.random.RandomState(7)
    B, T, P = 2, 5, 3
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray([5, 3])
    ga = jax.grad(lambda o: jnp.sum(fsa_logz(o, pack_graph(fsa), lens)))(obs)
    gd = jax.grad(lambda o: jnp.sum(fsa_logz_dense(o, pack_graph_dense(fsa), lens)))(obs)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(ga), rtol=1e-4, atol=1e-5)


def test_dense_duplicate_arcs_logsumexp():
    """Parallel arcs between one state pair must add in prob space."""
    src = np.array([0, 0, 1], np.int32)
    dst = np.array([1, 1, 1], np.int32)
    pdf = np.array([1, 1, 1], np.int32)
    w = np.array([-0.3, -1.1, -0.5], np.float32)
    final = np.array([-np.inf, 0.0], np.float32)
    fsa = DenseFsa(2, src, dst, pdf, w, final, 0).validate()
    rng = np.random.RandomState(0)
    obs = rng.randn(1, 3, 2).astype(np.float32)
    lens = jnp.asarray([3])
    za = float(fsa_logz(jnp.asarray(obs), pack_graph(fsa), lens)[0])
    zd = float(fsa_logz_dense(jnp.asarray(obs), pack_graph_dense(fsa), lens)[0])
    np.testing.assert_allclose(zd, za, rtol=1e-5, atol=1e-5)


def test_den_graph_satisfies_state_emission():
    """Graphs from the compiler carry per-state emissions by construction."""
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_den_graph
    from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram

    tm = TransitionModel(HmmTopology.three_state(range(1, 6)))
    rng = np.random.RandomState(1)
    seqs = [rng.randint(1, 6, 12).astype(np.int32) for _ in range(5)]
    lm = estimate_phone_bigram(seqs, tm.topo.phones)
    den = make_den_graph(tm, lm)
    assert state_emission_pdfs(den) is not None
    g = pack_graph_auto(den)
    assert isinstance(g, DenseStateGraph)
    # parity on the real den graph
    B, T = 2, 8
    obs = rng.randn(B, T, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([8, 5])
    za = np.asarray(fsa_logz(jnp.asarray(obs), pack_graph(den), lens))
    zd = np.asarray(fsa_logz_dense(jnp.asarray(obs), g, lens))
    np.testing.assert_allclose(zd, za, rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda o: jnp.sum(fsa_logz(o, pack_graph(den), lens)))(jnp.asarray(obs))
    gd = jax.grad(lambda o: jnp.sum(fsa_logz_dense(o, g, lens)))(jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(ga), rtol=1e-4, atol=1e-5)


def test_pack_graph_auto_fallbacks():
    # mixed-pdf in-arcs violate the invariant → arc tables
    src = np.array([0, 1], np.int32)
    dst = np.array([1, 1], np.int32)
    pdf = np.array([0, 1], np.int32)
    w = np.zeros(2, np.float32)
    final = np.array([-np.inf, 0.0], np.float32)
    mixed = DenseFsa(2, src, dst, pdf, w, final, 0).validate()
    assert state_emission_pdfs(mixed) is None
    assert isinstance(pack_graph_auto(mixed), GraphArrays)
    # size gate → block-sparse middle path (arc tables only for invariant
    # violations / degenerate block structure — test_fb_block.py)
    from pykaldi2_tpu.ops.fb_block import BlockSparseGraph

    big = _state_graph(0, num_states=64, num_arcs=256)
    assert isinstance(pack_graph_auto(big, max_states=32), BlockSparseGraph)
    assert isinstance(pack_graph_auto(big), DenseStateGraph)


def test_dense_mmi_dispatch_matches():
    """se_losses.mmi_objective: DenseStateGraph == GraphArrays (value+grad)."""
    from pykaldi2_tpu.ops.se_losses import mmi_objective

    fsa = _state_graph(6, num_states=6, num_arcs=20)
    rng = np.random.RandomState(9)
    B, T, P = 2, 6, 3
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    ali = jnp.asarray(rng.randint(0, P, (B, T)).astype(np.int32))
    lens = jnp.asarray([6, 4])
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)

    def obj(o, g):
        return jnp.sum(mmi_objective(o, ali, g, lens, mask, True, 1.0))

    oa = float(obj(obs, pack_graph(fsa)))
    od = float(obj(obs, pack_graph_dense(fsa)))
    np.testing.assert_allclose(od, oa, rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda o: obj(o, pack_graph(fsa)))(obs)
    gd = jax.grad(lambda o: obj(o, pack_graph_dense(fsa)))(obs)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(ga), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("level", ["pdf", "phone"])
def test_dense_expected_accuracy_matches_arc_table(level):
    from pykaldi2_tpu.ops.fb import fsa_expected_accuracy
    from pykaldi2_tpu.ops.fb_dense import fsa_expected_accuracy_dense

    # graph with per-state phones: expand a real den graph
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_den_graph
    from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram

    tm = TransitionModel(HmmTopology.three_state(range(1, 5)))
    rng = np.random.RandomState(31)
    seqs = [rng.randint(1, 5, 10).astype(np.int32) for _ in range(5)]
    den = make_den_graph(tm, estimate_phone_bigram(seqs, tm.topo.phones))
    gd = pack_graph_dense(den)
    assert gd.state_phone is not None
    ga = pack_graph(den)

    B, T = 2, 6
    obs = jnp.asarray(rng.randn(B, T, tm.num_pdfs).astype(np.float32))
    hi = tm.num_pdfs if level == "pdf" else 5
    lo = 0 if level == "pdf" else 1
    ref = jnp.asarray(rng.randint(lo, hi, (B, T)).astype(np.int32))
    lens = jnp.asarray([6, 4])
    fa = np.asarray(fsa_expected_accuracy(obs, ga, ref, lens, level))
    fd = np.asarray(fsa_expected_accuracy_dense(obs, gd, ref, lens, level))
    np.testing.assert_allclose(fd, fa, rtol=1e-5, atol=1e-5)
    grad_a = jax.grad(lambda o: jnp.sum(fsa_expected_accuracy(o, ga, ref, lens, level)))(obs)
    grad_d = jax.grad(lambda o: jnp.sum(fsa_expected_accuracy_dense(o, gd, ref, lens, level)))(obs)
    np.testing.assert_allclose(np.asarray(grad_d), np.asarray(grad_a),
                               rtol=1e-4, atol=1e-5)


def test_dense_smbr_training_step_via_trainer():
    """make_se_train_step smbr with a DenseStateGraph den improves."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.frontend.window import num_frames as _nf
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_den_graph
    from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.utils import make_optimizer

    num_pdfs = 4
    tm = TransitionModel(HmmTopology.one_state(range(1, num_pdfs + 1)))
    rng = np.random.RandomState(12)
    seqs = [rng.randint(1, num_pdfs + 1, rng.randint(5, 15)) for _ in range(6)]
    den = make_den_graph(tm, estimate_phone_bigram(
        [s.astype(np.int32) for s in seqs], tm.topo.phones))
    den_packed = pack_graph_dense(den)
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=16)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=16, num_layers=1,
                                    output_size=num_pdfs, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=3e-3))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_se_train_step(model, feat_fn, opt, den_packed, "smbr",
                              acoustic_scale=1.0, ce_ratio=0.1)
    B, S = 2, 4000
    T = _nf(S, FrameOpts(dither=0.0))
    batch = {
        "wave": jnp.asarray(rng.randn(B, S).astype(np.float32) * 1000),
        "labels": jnp.asarray(rng.randint(0, num_pdfs, (B, T)).astype(np.int32)),
        "mask": jnp.ones((B, T), jnp.float32),
        "num_frames": jnp.full((B,), T, jnp.int32),
    }
    objs = []
    key = jax.random.PRNGKey(1)
    for _ in range(6):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
        objs.append(float(m["objective"]))
    assert np.isfinite(objs).all()
    assert objs[-1] > objs[0], objs


def test_dense_den_graph_training_step():
    """make_se_train_step with a DenseStateGraph denominator trains (the
    loaded -den_graph MMI hot path)."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.frontend.window import num_frames as _nf
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_den_graph
    from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.utils import make_optimizer

    num_pdfs = 4
    tm = TransitionModel(HmmTopology.one_state(range(1, num_pdfs + 1)))
    rng = np.random.RandomState(11)
    seqs = [rng.randint(1, num_pdfs + 1, rng.randint(5, 15)) for _ in range(6)]
    lm = estimate_phone_bigram([s.astype(np.int32) for s in seqs], tm.topo.phones)
    den = make_den_graph(tm, lm)
    den_packed = pack_graph_dense(den)

    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=16)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=16, num_layers=1,
                                    output_size=num_pdfs, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=3e-3))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_se_train_step(model, feat_fn, opt, den_packed, "mmi",
                              acoustic_scale=1.0, ce_ratio=0.1)

    B, S = 2, 4000
    fo = FrameOpts(dither=0.0)
    T = _nf(S, fo)
    batch = {
        "wave": jnp.asarray(rng.randn(B, S).astype(np.float32) * 1000),
        "labels": jnp.asarray(rng.randint(0, num_pdfs, (B, T)).astype(np.int32)),
        "mask": jnp.ones((B, T), jnp.float32),
        "num_frames": jnp.full((B,), T, jnp.int32),
    }
    objs = []
    key = jax.random.PRNGKey(1)
    for _ in range(6):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
        objs.append(float(m["objective"]))
    assert np.isfinite(objs).all()
    assert objs[-1] > objs[0], objs
