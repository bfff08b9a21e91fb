"""Block-sparse FB kernels (ops/fb_block.py) vs the arc-table reference.

VERDICT r2 item 3: graphs past the 16k-state dense cap fell back to the
O(E) arc-table kernels (~7x slower on chip). fb_block tiles the exp-space
transition matrix into nonzero (k x k) blocks after a BFS reordering, runs
the same renormalized recursion as fb_dense per tile, and remats alphas in
sqrt(T) segments. Same math — tight parity expected; the tests use small
block sizes so tiling/padding edges are exercised on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.ops.fb import fsa_expected_accuracy, fsa_logz, fsa_occupancies, pack_graph
from pykaldi2_tpu.ops.fb_block import (
    BlockSparseGraph,
    fsa_expected_accuracy_block,
    fsa_logz_block,
    fsa_occupancies_block,
    pack_graph_blocks,
)
from pykaldi2_tpu.ops.fsa import DenseFsa


@pytest.fixture(params=["full", "remat"])
def save_mode(request, monkeypatch):
    """Run under both backward modes: full-save (history fits the budget,
    no recompute) and sqrt(T) segmented remat (budget forced to 0)."""
    if request.param == "remat":
        monkeypatch.setenv("PK2_BLOCKFB_SAVE_BYTES", "0")
    return request.param


def _state_graph(seed=0, num_states=23, num_pdfs=5, num_arcs=70):
    """Random graph honoring the state-emission invariant; num_states chosen
    NOT to divide the block size so padding paths run. Every state is final
    (random finite weights) so a final state is always reachable at frame T —
    unreachable-final graphs have meaningless expected accuracy (out of
    contract, see test_fb_batched) and each kernel's garbage differs."""
    rng = np.random.RandomState(seed)
    state_pdf = rng.randint(0, num_pdfs, num_states)
    src = rng.randint(0, num_states, num_arcs).astype(np.int32)
    src[0] = 0
    dst = rng.randint(0, num_states, num_arcs).astype(np.int32)
    pdf = state_pdf[dst].astype(np.int32)
    weight = (rng.randn(num_arcs) * 0.5).astype(np.float32)
    final = (rng.randn(num_states) * 0.5).astype(np.float32)
    phone = (state_pdf[dst] + 1).astype(np.int32)   # invariant holds for phones
    return DenseFsa(num_states, src, dst, pdf, weight, final, 0, phone).validate()


@pytest.mark.parametrize("seed,block,seg_len", [(0, 8, 3), (1, 16, 4), (5, 8, 7)])
def test_block_logz_matches_arc_table(seed, block, seg_len, save_mode):
    fsa = _state_graph(seed)
    rng = np.random.RandomState(seed + 100)
    B, T, P = 3, 7, 5
    obs = rng.randn(B, T, P).astype(np.float32)
    lens = np.array([7, 5, 1], np.int32)
    za = np.asarray(fsa_logz(jnp.asarray(obs), pack_graph(fsa), jnp.asarray(lens)))
    g = pack_graph_blocks(fsa, block=block, seg_len=seg_len)
    zb = np.asarray(fsa_logz_block(jnp.asarray(obs), g, jnp.asarray(lens)))
    np.testing.assert_allclose(zb, za, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed,seg_len", [(2, 2), (3, 6)])
def test_block_occupancies_match(seed, seg_len, save_mode):
    """seg_len both dividing T (6/2) and not (6 pads to 12 at seg_len 6...
    actually 6 divides; the (3, 6) case pads T=6 to one 6-frame segment and
    the (2, 2) case runs 3 segments)."""
    fsa = _state_graph(seed, num_states=19, num_arcs=60)
    rng = np.random.RandomState(seed + 200)
    B, T, P = 2, 6, 5
    obs = rng.randn(B, T, P).astype(np.float32)
    lens = np.array([6, 4], np.int32)
    za, ga = fsa_occupancies(jnp.asarray(obs), pack_graph(fsa), jnp.asarray(lens))
    g = pack_graph_blocks(fsa, block=8, seg_len=seg_len)
    zb, gb = fsa_occupancies_block(jnp.asarray(obs), g, jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-4, atol=1e-5)


def test_block_grad_matches_arc_table_and_finite_diff(save_mode):
    fsa = _state_graph(4, num_states=17, num_arcs=50)
    rng = np.random.RandomState(7)
    B, T, P = 2, 5, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray([5, 3])
    g = pack_graph_blocks(fsa, block=8, seg_len=2)
    ga = jax.grad(lambda o: jnp.sum(fsa_logz(o, pack_graph(fsa), lens)))(obs)
    gb = jax.grad(lambda o: jnp.sum(fsa_logz_block(o, g, lens)))(obs)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-4, atol=1e-5)
    eps = 1e-3
    o_np = np.asarray(obs)
    for (b, t, p) in [(0, 1, 2), (1, 2, 0), (0, 4, 4)]:
        op, om = o_np.copy(), o_np.copy()
        op[b, t, p] += eps
        om[b, t, p] -= eps
        fp = float(fsa_logz_block(jnp.asarray(op), g, lens)[b])
        fm = float(fsa_logz_block(jnp.asarray(om), g, lens)[b])
        np.testing.assert_allclose(float(np.asarray(gb)[b, t, p]),
                                   (fp - fm) / (2 * eps), atol=5e-3)


def test_block_t_not_multiple_of_seg_len(save_mode):
    """T=7 with seg_len=3 pads to 9 frames; padded frames must not change
    logZ or leak into gamma."""
    fsa = _state_graph(9, num_states=15, num_arcs=44)
    rng = np.random.RandomState(17)
    B, T, P = 2, 7, 5
    obs = rng.randn(B, T, P).astype(np.float32)
    lens = np.array([7, 2], np.int32)
    za, ga = fsa_occupancies(jnp.asarray(obs), pack_graph(fsa), jnp.asarray(lens))
    g = pack_graph_blocks(fsa, block=8, seg_len=3)
    zb, gb = fsa_occupancies_block(jnp.asarray(obs), g, jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-4, atol=1e-5)
    # frames past num_frames contribute exactly zero occupancy
    assert np.all(np.asarray(gb)[1, 2:] == 0.0)


@pytest.mark.parametrize("level", ["pdf", "phone"])
def test_block_expected_accuracy_matches_arc_table(level, save_mode):
    fsa = _state_graph(6, num_states=21, num_arcs=64)
    rng = np.random.RandomState(31)
    B, T, P = 2, 6, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    hi = 5 if level == "pdf" else 6
    ref = jnp.asarray(rng.randint(0, hi, (B, T)).astype(np.int32))
    lens = jnp.asarray([6, 4])
    g = pack_graph_blocks(fsa, block=8, seg_len=4)
    fa = fsa_expected_accuracy(obs, pack_graph(fsa), ref, lens, level)
    fb = fsa_expected_accuracy_block(obs, g, ref, lens, level)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-5)
    grad_a = jax.grad(lambda o: jnp.sum(
        fsa_expected_accuracy(o, pack_graph(fsa), ref, lens, level)))(obs)
    grad_b = jax.grad(lambda o: jnp.sum(
        fsa_expected_accuracy_block(o, g, ref, lens, level)))(obs)
    np.testing.assert_allclose(np.asarray(grad_b), np.asarray(grad_a),
                               rtol=1e-4, atol=1e-5)


def test_block_expected_accuracy_with_silence():
    from pykaldi2_tpu.ops.fb import SilenceOpts

    fsa = _state_graph(8, num_states=21, num_arcs=64)
    rng = np.random.RandomState(33)
    B, T = 2, 5
    obs = jnp.asarray(rng.randn(B, T, 5).astype(np.float32))
    ref = jnp.asarray(rng.randint(0, 6, (B, T)).astype(np.int32))
    lens = jnp.asarray([5, 5])
    sil_mask = jnp.asarray(np.isin(np.arange(7), [1]).astype(np.float32))
    sil = SilenceOpts(sil_pdf=sil_mask, sil_phone=sil_mask,
                      one_silence_class=False)
    g = pack_graph_blocks(fsa, block=8, seg_len=2)
    fa = fsa_expected_accuracy(obs, pack_graph(fsa), ref, lens, "phone", sil)
    fb = fsa_expected_accuracy_block(obs, g, ref, lens, "phone", sil)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-5)


def test_pack_graph_auto_routes_big_graphs_to_blocks():
    from pykaldi2_tpu.ops.fb import GraphArrays
    from pykaldi2_tpu.ops.fb_dense import DenseStateGraph, pack_graph_auto

    small = _state_graph(0)
    assert isinstance(pack_graph_auto(small), DenseStateGraph)
    big = _state_graph(1, num_states=300, num_arcs=900)
    packed = pack_graph_auto(big, max_states=100)
    assert isinstance(packed, BlockSparseGraph)
    # invariant violation still falls through to arc tables
    bad = DenseFsa(3, np.array([0, 0], np.int32), np.array([1, 1], np.int32),
                   np.array([0, 1], np.int32), np.zeros(2, np.float32),
                   np.array([-np.inf, 0.0, -np.inf], np.float32), 0).validate()
    assert isinstance(pack_graph_auto(bad, max_states=1), GraphArrays)


def test_block_mmi_training_step_via_trainer():
    """make_se_train_step with a BlockSparseGraph den end-to-end (the loaded
    -den_graph path past 16k states routes here via pack_graph_auto)."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.graph import (HmmTopology, TransitionModel,
                                    estimate_phone_bigram, make_den_graph)
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.utils import make_optimizer

    num_pdfs = 5 * 3
    tm = TransitionModel(HmmTopology.three_state(range(1, 6)))
    rng = np.random.RandomState(0)
    seqs = [rng.randint(1, 6, 12).astype(np.int32) for _ in range(10)]
    lm = estimate_phone_bigram(seqs, tm.topo.phones)
    den = make_den_graph(tm, lm)
    g = pack_graph_blocks(den, block=8, seg_len=4)

    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=16, num_layers=1,
                                    output_size=num_pdfs,
                                    compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=3e-3))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_se_train_step(model, feat_fn, opt, g, "mmi", None,
                              acoustic_scale=1.0, ce_ratio=0.1)
    T = 40
    from pykaldi2_tpu.data.dataloader import chunk_samples

    S = chunk_samples(T, feat_cfg.fbank.frame_opts)
    batch = {
        "wave": jnp.asarray((rng.randn(2, S) * 1000).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, num_pdfs, (2, T)).astype(np.int32)),
        "mask": jnp.ones((2, T), jnp.float32),
        "num_frames": jnp.asarray([T, T], jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    objs = []
    for _ in range(6):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
        objs.append(float(m["objective"]))
    assert np.isfinite(objs).all()
    assert objs[-1] > objs[0]


def test_block_mesh_parity():
    """Block-sparse MMI under an 8-device shard_map == single-device math
    (the vma carry rules for the nested scans)."""
    from pykaldi2_tpu.ops.se_losses import mmi_objective
    from pykaldi2_tpu.parallel.mesh import make_mesh
    from jax.sharding import PartitionSpec as P

    fsa = _state_graph(12, num_states=19, num_arcs=60)
    g = pack_graph_blocks(fsa, block=8, seg_len=3)
    rng = np.random.RandomState(3)
    n = jax.device_count()
    B, T, Pd = n, 6, 5
    obs = jnp.asarray(rng.randn(B, T, Pd).astype(np.float32))
    ali = jnp.asarray(rng.randint(0, Pd, (B, T)).astype(np.int32))
    mask = jnp.ones((B, T), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)

    def f(o, a, m, nf):
        return mmi_objective(o, a, g, nf, m)

    ref = jax.grad(lambda o: jnp.sum(f(o, ali, mask, lens)))(obs)
    mesh = make_mesh()
    sharded = jax.shard_map(
        lambda o, a, m, nf: jax.grad(lambda oo: jnp.sum(f(oo, a, m, nf)))(o),
        mesh=mesh, in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"))(obs, ali, mask, lens)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Pallas tile-streaming matvec (interpret mode on CPU; the real-TPU
# parity/timing check is bench.py --check fb_block)
# ---------------------------------------------------------------------------


@pytest.fixture
def _pallas_block(monkeypatch):
    """Force the Pallas matvec through the interpreter on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setenv("PK2_PALLAS_BLOCKFB", "1")


def test_pallas_matvec_matches_xla(_pallas_block, monkeypatch):
    """The tile-streaming kernel == the gather/einsum/segment-sum form, both
    orientations, including a batch that needs sublane padding (B=3)."""
    from pykaldi2_tpu.ops import fb_block as FB

    fsa = _state_graph(7, num_states=21, num_arcs=60)
    g = pack_graph_blocks(fsa, block=8, seg_len=3, band_frac=0)
    rng = np.random.RandomState(0)
    lin = jnp.asarray(np.abs(rng.randn(3, g.num_padded)).astype(np.float32))
    for transpose in (False, True):
        got = np.asarray(FB._block_matvec(lin, g, transpose))
        monkeypatch.setenv("PK2_PALLAS_BLOCKFB", "0")
        ref = np.asarray(FB._block_matvec(lin, g, transpose))
        monkeypatch.setenv("PK2_PALLAS_BLOCKFB", "1")
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_pallas_block_logz_and_grad(_pallas_block):
    """grad(logZ) through the interpreted Pallas kernels == arc tables."""
    fsa = _state_graph(4, num_states=17, num_arcs=50)
    rng = np.random.RandomState(41)
    B, T, P = 2, 5, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(np.array([5, 3], np.int32))
    ref = jax.grad(lambda o: jnp.sum(fsa_logz(o, pack_graph(fsa), lens)))(obs)
    g = pack_graph_blocks(fsa, block=8, seg_len=2, band_frac=0)
    got = jax.grad(lambda o: jnp.sum(fsa_logz_block(o, g, lens)))(obs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_block_expected_accuracy(_pallas_block):
    """sMBR fused-pair matvec through the interpreted kernel == arc tables."""
    fsa = _state_graph(6, num_states=19, num_arcs=55)
    rng = np.random.RandomState(42)
    B, T, P = 2, 4, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    ref_lab = jnp.asarray(rng.randint(0, P, (B, T)).astype(np.int32))
    lens = jnp.asarray(np.array([4, 2], np.int32))
    ga = pack_graph(fsa)
    ref = jax.grad(lambda o: jnp.sum(
        fsa_expected_accuracy(o, ga, ref_lab, lens)))(obs)
    g = pack_graph_blocks(fsa, block=8, seg_len=2, band_frac=0)
    got = jax.grad(lambda o: jnp.sum(
        fsa_expected_accuracy_block(o, g, ref_lab, lens)))(obs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Dense-band split (static-shift einsums for popular block offsets)
# ---------------------------------------------------------------------------


def _chain_fsa(num_chains=6, chain_len=20, num_pdfs=5):
    """Chain-structured graph (the shape real compiler graphs take after
    BFS): start fans out to chains, each state self-loops and advances."""
    rng = np.random.RandomState(3)
    S = 1 + num_chains * chain_len
    state_pdf = rng.randint(0, num_pdfs, S)
    src, dst, wt = [], [], []
    for c in range(num_chains):
        base = 1 + c * chain_len
        src.append(0); dst.append(base); wt.append(rng.randn() * 0.3)
        for i_ in range(chain_len):
            s = base + i_
            src.append(s); dst.append(s); wt.append(-0.7)
            if i_ + 1 < chain_len:
                src.append(s); dst.append(s + 1); wt.append(-0.7)
    src = np.asarray(src, np.int32); dst = np.asarray(dst, np.int32)
    final = np.full(S, -np.inf, np.float32)
    final[np.arange(num_chains) * chain_len + chain_len] = 0.0
    return DenseFsa(S, src, dst, state_pdf[dst].astype(np.int32),
                    np.asarray(wt, np.float32), final, 0).validate()


def test_band_split_covers_chain_and_matches_all_coo():
    """On a chain graph the band must absorb (nearly) all tiles, and the
    banded matvec must equal the all-COO matvec bit-for-bit in structure."""
    from pykaldi2_tpu.ops import fb_block as FB

    fsa = _chain_fsa()
    gb = pack_graph_blocks(fsa, block=8, seg_len=4)          # banded
    gc = pack_graph_blocks(fsa, block=8, seg_len=4, band_frac=0)
    assert len(gb.band_off) > 0, "chain graph produced no band offsets"
    assert gb.wb.shape[0] < gc.wb.shape[0]
    rng = np.random.RandomState(11)
    lin = jnp.asarray(np.abs(rng.randn(2, gb.num_padded)).astype(np.float32))
    for transpose in (False, True):
        got = np.asarray(FB._block_matvec(lin, gb, transpose))
        ref = np.asarray(FB._block_matvec(lin, gc, transpose))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_band_split_logz_grad_and_accuracy_match(save_mode):
    """Banded vs all-COO packings agree through logZ grad and sMBR."""
    fsa = _chain_fsa(num_chains=4, chain_len=9)
    rng = np.random.RandomState(12)
    B, T, P = 2, 6, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(np.array([6, 4], np.int32))
    ref_lab = jnp.asarray(rng.randint(0, P, (B, T)).astype(np.int32))
    gb = pack_graph_blocks(fsa, block=8, seg_len=3)
    gc = pack_graph_blocks(fsa, block=8, seg_len=3, band_frac=0)
    for fn in (lambda o, g: jnp.sum(fsa_logz_block(o, g, lens)),
               lambda o, g: jnp.sum(
                   fsa_expected_accuracy_block(o, g, ref_lab, lens))):
        vb, gvb = jax.value_and_grad(lambda o: fn(o, gb))(obs)
        vc, gvc = jax.value_and_grad(lambda o: fn(o, gc))(obs)
        np.testing.assert_allclose(float(vb), float(vc), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gvb), np.asarray(gvc),
                                   rtol=1e-4, atol=1e-5)


def test_fused_band_matches_per_offset(monkeypatch):
    """The fused band (all offsets as one concatenated einsum — the r4
    default) must agree with the per-offset einsum chain
    (PK2_BLOCKFB_FUSEBAND=0) through logZ grad."""
    fsa = _chain_fsa(num_chains=4, chain_len=9)
    rng = np.random.RandomState(13)
    B, T, P = 2, 6, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(np.array([6, 4], np.int32))
    g = pack_graph_blocks(fsa, block=8, seg_len=3)
    assert len(g.band_off) > 1, "fixture must produce a multi-offset band"

    def f(o):
        return jnp.sum(fsa_logz_block(o, g, lens))

    monkeypatch.setenv("PK2_BLOCKFB_FUSEBAND", "0")
    v0, gv0 = jax.value_and_grad(f)(obs)
    monkeypatch.setenv("PK2_BLOCKFB_FUSEBAND", "1")
    jax.clear_caches()
    v1, gv1 = jax.value_and_grad(f)(obs)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               rtol=1e-5, atol=1e-6)


def test_bf16_tiles_close_to_f32(save_mode):
    """tile_dtype="bfloat16" (halved band HBM traffic) must track the f32
    packing within bf16 rounding: ~4e-3 relative on logZ shifts/occupancies
    (accumulation stays f32; only the stored transition probs are rounded).
    """
    fsa = _chain_fsa(num_chains=4, chain_len=9)
    rng = np.random.RandomState(14)
    B, T, P = 2, 6, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(np.array([6, 4], np.int32))
    g32 = pack_graph_blocks(fsa, block=8, seg_len=3)
    gbf = pack_graph_blocks(fsa, block=8, seg_len=3, tile_dtype="bfloat16")
    assert gbf.wband.dtype == jnp.bfloat16 and gbf.wbt.dtype == jnp.bfloat16
    assert g32.wband.dtype == jnp.float32

    def f(o, g):
        return jnp.sum(fsa_logz_block(o, g, lens))

    v0, gv0 = jax.value_and_grad(lambda o: f(o, g32))(obs)
    v1, gv1 = jax.value_and_grad(lambda o: f(o, gbf))(obs)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               rtol=2e-2, atol=2e-2)


def test_linear_carry_matches_log_carry(save_mode, monkeypatch):
    """The linear renormalized alpha/beta carries (exp of obs hoisted
    outside the scans — the r4 default) must reproduce the log-carry form
    (PK2_BLOCKFB_LINCARRY=0): logZ, occupancies, and grad in BOTH save
    modes."""
    fsa = _chain_fsa(num_chains=4, chain_len=9)
    rng = np.random.RandomState(15)
    B, T, P = 2, 7, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(np.array([7, 4], np.int32))
    g = pack_graph_blocks(fsa, block=8, seg_len=3)

    def f(o):
        return jnp.sum(fsa_logz_block(o, g, lens))

    monkeypatch.setenv("PK2_BLOCKFB_LINCARRY", "0")
    jax.clear_caches()
    v0, gv0 = jax.value_and_grad(f)(obs)
    z0, gam0 = fsa_occupancies_block(obs, g, lens)
    ref_lab = jnp.asarray(
        np.random.RandomState(16).randint(0, P, (B, T)).astype(np.int32))

    def fs(o):
        return jnp.sum(fsa_expected_accuracy_block(o, g, ref_lab, lens))

    vs0, gs0 = jax.value_and_grad(fs)(obs)
    monkeypatch.setenv("PK2_BLOCKFB_LINCARRY", "1")
    jax.clear_caches()
    v1, gv1 = jax.value_and_grad(f)(obs)
    z1, gam1 = fsa_occupancies_block(obs, g, lens)
    vs1, gs1 = jax.value_and_grad(fs)(obs)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gam1), np.asarray(gam0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(vs1), float(vs0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs0),
                               rtol=1e-4, atol=1e-6)


def test_defernorm_matches_default(save_mode, monkeypatch):
    """PK2_BLOCKFB_DEFERNORM=1 (VERDICT r4 weak #6 attempt: the per-frame
    [B,Sp] normalize-divide deferred into the next frame's [B,P] obs row)
    must reproduce the default lincarry MMI path: logZ, occupancies, grad,
    in BOTH save modes."""
    fsa = _chain_fsa(num_chains=4, chain_len=9)
    rng = np.random.RandomState(25)
    B, T, P = 2, 7, 5
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(np.array([7, 4], np.int32))
    g = pack_graph_blocks(fsa, block=8, seg_len=3)

    def f(o):
        return jnp.sum(fsa_logz_block(o, g, lens))

    jax.clear_caches()
    v0, gv0 = jax.value_and_grad(f)(obs)
    z0, gam0 = fsa_occupancies_block(obs, g, lens)
    monkeypatch.setenv("PK2_BLOCKFB_DEFERNORM", "1")
    jax.clear_caches()
    v1, gv1 = jax.value_and_grad(f)(obs)
    z1, gam1 = fsa_occupancies_block(obs, g, lens)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gam1), np.asarray(gam0),
                               rtol=1e-4, atol=1e-6)
