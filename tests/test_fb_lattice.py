"""Banded time-synchronous lattice FB vs the generic per-utterance kernels.

The banded kernels (ops/fb_lattice.py) must match fb_batched exactly on real
decoder output — same lattices, two representations — while keeping
activations [T, B, max_active] instead of [T, B, num_states].
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.decode.decoder import LatticeDecoder
from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_decode_graph
from pykaldi2_tpu.ops.fb_batched import (
    batched_expected_accuracy, fsa_occupancies_b, mmi_objective_lattice,
    pack_graph_batch)
from pykaldi2_tpu.ops.fb_lattice import (
    TimeSyncLattice, lattice_expected_accuracy_ts, lattice_occupancies_ts,
    mmi_objective_lattice_ts, pack_time_sync, time_sync_from_fsa)


@pytest.fixture(scope="module")
def decoded():
    """Real decoder lattices over a toy graph, varying lengths."""
    num_pdfs = 5
    tm = TransitionModel(HmmTopology.one_state(range(1, num_pdfs + 1)))
    lexicon = {f"w{p}": [[p]] for p in range(1, num_pdfs + 1)}
    word_ids = {f"w{p}": p for p in range(1, num_pdfs + 1)}
    graph = make_decode_graph(tm, lexicon, word_ids)
    dec = LatticeDecoder(graph, beam=24.0, lattice_beam=12.0)
    rng = np.random.RandomState(0)
    T = 12
    lens = [12, 9, 5]
    obs = rng.randn(len(lens), T, num_pdfs).astype(np.float32) * 1.5
    fsas, framed = [], []
    for i, nf in enumerate(lens):
        fsa, frames, _ = dec.decode_lattice(obs[i, :nf], with_frames=True)
        fsas.append(fsa)
        framed.append((fsa, frames))
    return obs, np.asarray(lens, np.int32), fsas, framed, num_pdfs


def test_state_frames_are_time_synchronous(decoded):
    _obs, lens, fsas, framed, _p = decoded
    for (fsa, frames), nf in zip(framed, lens):
        assert frames.shape == (fsa.num_states,)
        assert frames[0] == 0
        assert frames.max() == nf
        # every arc advances exactly one frame
        np.testing.assert_array_equal(frames[fsa.dst], frames[fsa.src] + 1)


def test_banded_logz_and_gamma_match_generic(decoded):
    obs, lens, fsas, framed, _p = decoded
    bg = pack_graph_batch(fsas)
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    zg, gg = fsa_occupancies_b(jnp.asarray(obs), bg, jnp.asarray(lens))
    zt, gt = lattice_occupancies_ts(jnp.asarray(obs), lat, jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(zt), np.asarray(zg), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gg), rtol=1e-4, atol=1e-5)


def test_banded_mmi_matches_generic(decoded):
    obs, lens, fsas, framed, p = decoded
    bg = pack_graph_batch(fsas)
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    rng = np.random.RandomState(1)
    ali = jnp.asarray(rng.randint(0, p, obs.shape[:2]).astype(np.int32))
    mask = (jnp.arange(obs.shape[1])[None] < jnp.asarray(lens)[:, None]).astype(jnp.float32)

    def f_gen(o):
        return jnp.sum(mmi_objective_lattice(o, ali, bg, jnp.asarray(lens),
                                             mask, True, 1.0))

    def f_ts(o):
        return jnp.sum(mmi_objective_lattice_ts(o, ali, lat, jnp.asarray(lens),
                                                mask, True, 1.0))

    o = jnp.asarray(obs)
    np.testing.assert_allclose(float(f_ts(o)), float(f_gen(o)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(f_ts)(o)),
                               np.asarray(jax.grad(f_gen)(o)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("level", ["pdf", "phone"])
def test_banded_expected_accuracy_matches_generic(decoded, level):
    obs, lens, fsas, framed, p = decoded
    bg = pack_graph_batch(fsas)
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    rng = np.random.RandomState(2)
    p2p = jnp.asarray(np.arange(p, dtype=np.int32) % 3 + 1)
    hi = p if level == "pdf" else 4
    lo = 0 if level == "pdf" else 1
    ref = jnp.asarray(rng.randint(lo, hi, obs.shape[:2]).astype(np.int32))
    lens_j = jnp.asarray(lens)

    def f_gen(o):
        return jnp.sum(batched_expected_accuracy(o, bg, ref, lens_j, level, p2p))

    def f_ts(o):
        return jnp.sum(lattice_expected_accuracy_ts(o, lat, ref, lens_j, level, p2p))

    o = jnp.asarray(obs)
    np.testing.assert_allclose(float(f_ts(o)), float(f_gen(o)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(f_ts)(o)),
                               np.asarray(jax.grad(f_gen)(o)),
                               rtol=1e-4, atol=1e-5)


def test_pad_time_sync_invariance(decoded):
    """Growing (K, A) paddings (the multihost shape-equalization path) must
    not change logZ/gamma."""
    from pykaldi2_tpu.ops.fb_lattice import pad_time_sync

    obs, lens, _fsas, framed, _p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    big = pad_time_sync(lat, lat.num_slots * 2, lat.src.shape[2] + 96)
    z1, g1 = lattice_occupancies_ts(jnp.asarray(obs), lat, jnp.asarray(lens))
    z2, g2 = lattice_occupancies_ts(jnp.asarray(obs), big, jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)

    # frame-axis padding too (ranks in different buckets): extra frames are
    # inert — the scan's active mask skips them past each utt's num_frames
    t0 = obs.shape[1]
    big_t = pad_time_sync(lat, lat.num_slots * 2, lat.src.shape[2] + 96,
                          t=t0 + 7)
    obs_t = np.pad(obs, [(0, 0), (0, 7), (0, 0)])
    z3, g3 = lattice_occupancies_ts(jnp.asarray(obs_t), big_t,
                                    jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(z3), np.asarray(z1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g3)[:, :t0], np.asarray(g1),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(g3)[:, t0:]).max() == 0.0


def test_matvec_form_matches_scan_form(decoded, monkeypatch):
    """The matvec banded form (per-frame [B,K,K] transition matrices, one
    hoisted scatter, MXU matvec scan bodies) must reproduce the scan form's
    logZ, occupancies, and MMI objective+grad on real decoder lattices."""
    from pykaldi2_tpu.ops import fb_lattice as fl

    obs, lens, _fsas, framed, p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    o, lens_j = jnp.asarray(obs), jnp.asarray(lens)
    rng = np.random.RandomState(3)
    ali = jnp.asarray(rng.randint(0, p, obs.shape[:2]).astype(np.int32))
    mask = (jnp.arange(obs.shape[1])[None] < lens_j[:, None]).astype(
        jnp.float32)

    def mmi(o_):
        return jnp.sum(mmi_objective_lattice_ts(o_, ali, lat, lens_j, mask,
                                                True, 1.0))

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("PK2_LATFB_MATVEC", mode)
        z, g = lattice_occupancies_ts(o, lat, lens_j)
        outs[mode] = (np.asarray(z), np.asarray(g), float(mmi(o)),
                      np.asarray(jax.grad(mmi)(o)))
    # sanity: the gate actually routes (tiny shapes are always under budget);
    # unset = auto-ON since the on-chip win (BASELINE.md r3 session 7), and
    # the byte budget still gates the auto path off
    assert fl.use_matvec_latfb(obs.shape[1], obs.shape[0], lat.num_slots)
    monkeypatch.delenv("PK2_LATFB_MATVEC")
    assert fl.use_matvec_latfb(obs.shape[1], obs.shape[0], lat.num_slots)
    monkeypatch.setenv("PK2_LATFB_MATVEC_BYTES", "1")
    assert not fl.use_matvec_latfb(obs.shape[1], obs.shape[0], lat.num_slots)
    monkeypatch.delenv("PK2_LATFB_MATVEC_BYTES")
    # precedence (ADVICE r3): explicit PK2_PALLAS_LATFB=1 opt-in disables
    # the matvec AUTO default (so Pallas is reachable) but not an explicit
    # PK2_LATFB_MATVEC=1
    monkeypatch.setenv("PK2_PALLAS_LATFB", "1")
    assert not fl.use_matvec_latfb(obs.shape[1], obs.shape[0], lat.num_slots)
    monkeypatch.setenv("PK2_LATFB_MATVEC", "1")
    assert fl.use_matvec_latfb(obs.shape[1], obs.shape[0], lat.num_slots)
    monkeypatch.delenv("PK2_LATFB_MATVEC")
    monkeypatch.delenv("PK2_PALLAS_LATFB")
    # default budget admits the measured sMBR shape (B=32/T=448/K=256,
    # n_mats=2 = 7.34 GB; ADVICE r3 item 1)
    assert fl.use_matvec_latfb(448, 32, 256, n_mats=2)
    z0, g0, f0, gr0 = outs["0"]
    z1, g1, f1, gr1 = outs["1"]
    np.testing.assert_allclose(z1, z0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g1, g0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(f1, f0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gr1, gr0, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("level", ["pdf", "phone"])
def test_matvec_form_smbr_matches_scan_form(decoded, monkeypatch, level):
    """Matvec expected-accuracy (M + accuracy-weighted M2 matvecs) must
    reproduce the scan form's objective and gradient."""
    obs, lens, _fsas, framed, p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    o, lens_j = jnp.asarray(obs), jnp.asarray(lens)
    rng = np.random.RandomState(4)
    p2p = jnp.asarray(np.arange(p, dtype=np.int32) % 3 + 1)
    hi, lo = (p, 0) if level == "pdf" else (4, 1)
    ref = jnp.asarray(rng.randint(lo, hi, obs.shape[:2]).astype(np.int32))

    def smbr(o_):
        return jnp.sum(lattice_expected_accuracy_ts(o_, lat, ref, lens_j,
                                                    level, p2p))

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("PK2_LATFB_MATVEC", mode)
        outs[mode] = (float(smbr(o)), np.asarray(jax.grad(smbr)(o)))
    np.testing.assert_allclose(outs["1"][0], outs["0"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["1"][1], outs["0"][1],
                               rtol=1e-4, atol=1e-6)


def test_matvec_form_ragged_and_padded(decoded, monkeypatch):
    """Matvec form under grown (K, A, T) paddings and ragged lengths —
    the multihost shape-equalization path."""
    from pykaldi2_tpu.ops.fb_lattice import pad_time_sync

    obs, lens, _fsas, framed, _p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    monkeypatch.setenv("PK2_LATFB_MATVEC", "0")
    z1, g1 = lattice_occupancies_ts(jnp.asarray(obs), lat, jnp.asarray(lens))
    monkeypatch.setenv("PK2_LATFB_MATVEC", "1")
    t0 = obs.shape[1]
    big = pad_time_sync(lat, lat.num_slots * 2, lat.src.shape[2] + 96,
                        t=t0 + 7)
    obs_t = np.pad(obs, [(0, 0), (0, 7), (0, 0)])
    z2, g2 = lattice_occupancies_ts(jnp.asarray(obs_t), big,
                                    jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2)[:, :t0], np.asarray(g1),
                               rtol=1e-4, atol=1e-6)
    assert np.abs(np.asarray(g2)[:, t0:]).max() == 0.0
def test_banded_memory_shape(decoded):
    """The win itself: slot count ≤ per-frame tokens, not total states."""
    obs, lens, fsas, framed, _p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    total_states = max(f.num_states for f in fsas)
    assert lat.num_slots < total_states
    arcs, nf, counts, _fin = time_sync_from_fsa(*framed[0])
    frame_of_arc = arcs[0]
    assert frame_of_arc.max() == nf - 1
    assert counts.sum() == framed[0][0].num_states


def test_matvec_form_under_shard_map(decoded, monkeypatch):
    """The matvec banded form must run inside shard_map (the mesh train
    path) and match the unsharded math — segment-sum + batched einsum under
    per-shard shapes."""
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    monkeypatch.setenv("PK2_LATFB_MATVEC", "1")
    obs, lens, _fsas, framed, _p = decoded
    framed8 = (list(framed) * 3)[:8]
    lens8 = jnp.asarray((list(lens) * 3)[:8], jnp.int32)
    obs8 = jnp.asarray(np.concatenate([obs] * 3, axis=0)[:8])
    lat = pack_time_sync(framed8, t_pad=obs.shape[1])
    z0, g0 = lattice_occupancies_ts(obs8, lat, lens8)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))

    def f(o, s, d, pf, w, fin, nf):
        z, g = lattice_occupancies_ts(
            o, TimeSyncLattice(s, d, pf, w, fin), nf)
        return z, g

    sharded = jax.jit(shard_map(
        f, mesh=mesh,
        in_specs=(P("data"),) * 7, out_specs=(P("data"), P("data"))))
    z1, g1 = sharded(obs8, lat.src, lat.dst, lat.pdf, lat.weight,
                     lat.final, lens8)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_einsum_trans_build_matches_scatter(decoded, monkeypatch):
    """PK2_LATFB_BUILD=einsum (one-hot MXU matmuls) must reproduce the
    scatter-built transition matrices' logZ/occupancies/MMI grad and the
    sMBR objective/grad — products are lin*{0,1} so only the f32
    accumulation order differs from the segment-sum."""
    obs, lens, _fsas, framed, p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    o, lens_j = jnp.asarray(obs), jnp.asarray(lens)
    rng = np.random.RandomState(5)
    ali = jnp.asarray(rng.randint(0, p, obs.shape[:2]).astype(np.int32))
    mask = (jnp.arange(obs.shape[1])[None] < lens_j[:, None]).astype(
        jnp.float32)
    ref = jnp.asarray(rng.randint(0, p, obs.shape[:2]).astype(np.int32))

    def mmi(o_):
        return jnp.sum(mmi_objective_lattice_ts(o_, ali, lat, lens_j, mask,
                                                True, 1.0))

    def smbr(o_):
        return jnp.sum(lattice_expected_accuracy_ts(o_, lat, ref, lens_j,
                                                    "pdf", None))

    monkeypatch.setenv("PK2_LATFB_MATVEC", "1")  # builds only exist here
    outs = {}
    for mode in ("scatter", "einsum"):
        monkeypatch.setenv("PK2_LATFB_BUILD", mode)
        jax.clear_caches()
        z, g = lattice_occupancies_ts(o, lat, lens_j)
        outs[mode] = (np.asarray(z), np.asarray(g),
                      float(mmi(o)), np.asarray(jax.grad(mmi)(o)),
                      float(smbr(o)), np.asarray(jax.grad(smbr)(o)))
    for a, b in zip(outs["scatter"], outs["einsum"]):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)

def test_pdf_set_gemm_routing_matches_scatter(decoded, monkeypatch):
    """set_den_pdf_ids routes the arc→pdf reductions through the one-hot
    GEMM form (ops/fb_lattice._arc_pdf_sums); results must match the
    scatter form on real decoder lattices for occupancies, MMI grad, and
    sMBR grad, in both matvec and scan kernel forms."""
    from pykaldi2_tpu.ops import fb_lattice as fl

    obs, lens, _fsas, framed, p = decoded
    lat = pack_time_sync(framed, t_pad=obs.shape[1])
    o, lens_j = jnp.asarray(obs), jnp.asarray(lens)
    rng = np.random.RandomState(6)
    ali = jnp.asarray(rng.randint(0, p, obs.shape[:2]).astype(np.int32))
    mask = (jnp.arange(obs.shape[1])[None] < lens_j[:, None]).astype(
        jnp.float32)
    p2p = jnp.asarray(np.arange(p, dtype=np.int32) % 3 + 1)
    ref = jnp.asarray(rng.randint(0, p, obs.shape[:2]).astype(np.int32))

    def mmi(o_):
        return jnp.sum(mmi_objective_lattice_ts(o_, ali, lat, lens_j, mask,
                                                True, 1.0))

    def smbr(o_):
        return jnp.sum(lattice_expected_accuracy_ts(o_, lat, ref, lens_j,
                                                    "pdf", p2p))

    # the lattices' pdfs all come from the toy den graph; declare that set
    pdf_ids = np.unique(np.asarray(lat.pdf))
    try:
        outs = {}
        for declared in (False, True):
            fl.set_den_pdf_ids(pdf_ids if declared else None)
            for mv in ("0", "1"):
                monkeypatch.setenv("PK2_LATFB_MATVEC", mv)
                z, g = lattice_occupancies_ts(o, lat, lens_j)
                outs[(declared, mv)] = (
                    np.asarray(z), np.asarray(g),
                    np.asarray(jax.grad(mmi)(o)),
                    np.asarray(jax.grad(smbr)(o)))
        for mv in ("0", "1"):
            a, b_ = outs[(False, mv)], outs[(True, mv)]
            np.testing.assert_allclose(b_[0], a[0], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(b_[1], a[1], rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(b_[2], a[2], rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(b_[3], a[3], rtol=1e-4, atol=1e-6)
        # escape hatch: PK2_LATFB_PDFSET=0 forces the scatter even when set
        fl.set_den_pdf_ids(pdf_ids)
        monkeypatch.setenv("PK2_LATFB_PDFSET", "0")
        z, g = lattice_occupancies_ts(o, lat, lens_j)
        np.testing.assert_allclose(np.asarray(g), outs[(False, "1")][1],
                                   rtol=1e-6, atol=0)
    finally:
        fl.set_den_pdf_ids(None)
