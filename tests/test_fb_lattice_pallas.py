"""Pallas banded-lattice FB kernels vs the lax.scan reference (interpret).

Pattern per CLAUDE.md: interpret-mode parity here; the on-chip parity and
timing check rides `bench.py --check` (lat_mmi runs with the kernels
enabled by default on TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import pykaldi2_tpu.ops.fb_lattice as FL
from pykaldi2_tpu.ops.fb import NEG_INF, SilenceOpts
from pykaldi2_tpu.ops.fb_lattice import (
    TimeSyncLattice, lattice_expected_accuracy_ts, lattice_occupancies_ts,
    mmi_objective_lattice_ts)

B, T, K, A, P = 8, 6, 128, 128, 12


@pytest.fixture
def _interpret(monkeypatch):
    real = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return real(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _rand_lattice(seed=0):
    """Random banded lattice: forward-connected slots, NEG_INF padding."""
    rng = np.random.RandomState(seed)
    live = 24  # live slots per frame (rest padding)
    src = rng.randint(0, live, (B, T, A)).astype(np.int32)
    src[:, 0, :] = 0  # frame 0 leaves the single start slot
    dst = rng.randint(0, live, (B, T, A)).astype(np.int32)
    w = (rng.randn(B, T, A) * 0.3).astype(np.float32)
    w[:, :, live * 3:] = NEG_INF  # padding arcs
    final = np.full((B, K), NEG_INF, np.float32)
    final[:, :live] = (rng.randn(B, live) * 0.2).astype(np.float32)
    return TimeSyncLattice(jnp.asarray(src), jnp.asarray(dst),
                           jnp.asarray(rng.randint(0, P, (B, T, A)).astype(np.int32)),
                           jnp.asarray(w), jnp.asarray(final))


def _both(monkeypatch, fn):
    monkeypatch.setenv("PK2_PALLAS_LATFB", "0")
    ref = fn()
    monkeypatch.setenv("PK2_PALLAS_LATFB", "1")
    got = fn()
    monkeypatch.delenv("PK2_PALLAS_LATFB")
    return ref, got


def test_gate_respects_shapes(monkeypatch):
    from pykaldi2_tpu.ops.fb_lattice_pallas import use_pallas_latfb

    monkeypatch.setenv("PK2_PALLAS_LATFB", "1")
    assert use_pallas_latfb(8, 128, 256)
    assert use_pallas_latfb(8, 100, 128)        # slots pad to 128 (shim)
    assert use_pallas_latfb(32, 200, 384)       # the compacted OTF shape
    assert not use_pallas_latfb(7, 128, 128)    # batch not 8-aligned
    assert not use_pallas_latfb(8, 128, 100)    # band not lane-aligned
    # sMBR budget (n_acc=2): supported at the bench/OTF shapes, and the
    # bigger scratch set must tighten the VMEM bound vs n_acc=1
    assert use_pallas_latfb(8, 128, 256, n_acc=2)
    assert use_pallas_latfb(32, 200, 384, n_acc=2)
    assert use_pallas_latfb(16, 512, 2048, n_acc=2)   # midscale dev-sMBR
    assert not use_pallas_latfb(32, 512, 2048, n_acc=2)  # one-hots blow VMEM
    monkeypatch.setenv("PK2_PALLAS_LATFB", "0")
    assert not use_pallas_latfb(8, 128, 128)
    # default (env unset): ON only for the real TPU backend — off here (CPU)
    monkeypatch.delenv("PK2_PALLAS_LATFB")
    assert not use_pallas_latfb(8, 128, 128)


def test_logz_and_gamma_parity(_interpret, monkeypatch):
    lat = _rand_lattice(0)
    rng = np.random.RandomState(1)
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(rng.randint(2, T + 1, B).astype(np.int32))
    (z_ref, g_ref), (z_pal, g_pal) = _both(
        monkeypatch, lambda: lattice_occupancies_ts(obs, lat, lens))
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_mmi_grad_parity(_interpret, monkeypatch):
    lat = _rand_lattice(2)
    rng = np.random.RandomState(3)
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    ali = jnp.asarray(rng.randint(0, P, (B, T)).astype(np.int32))
    lens = jnp.full((B,), T, jnp.int32)
    mask = jnp.ones((B, T), jnp.float32)

    def f():
        def obj(o):
            return jnp.sum(mmi_objective_lattice_ts(o, ali, lat, lens, mask))

        return jax.value_and_grad(obj)(obs)

    (v_ref, g_ref), (v_pal, g_pal) = _both(monkeypatch, f)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_smbr_value_and_grad_parity(_interpret, monkeypatch):
    """sMBR (pdf-level expected accuracy) through the one-hot Pallas
    fwd+bwd kernels vs the lax.scan route."""
    lat = _rand_lattice(4)
    rng = np.random.RandomState(5)
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    ref = jnp.asarray(rng.randint(0, P, (B, T)).astype(np.int32))
    lens = jnp.asarray(rng.randint(2, T + 1, B).astype(np.int32))

    def f():
        def obj(o):
            return jnp.sum(lattice_expected_accuracy_ts(o, lat, ref, lens))

        return jax.value_and_grad(obj)(obs)

    (v_ref, g_ref), (v_pal, g_pal) = _both(monkeypatch, f)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_mpe_silence_and_padded_slots_parity(_interpret, monkeypatch):
    """Phone-level MPE with Kaldi silence rules AND a non-lane-aligned slot
    count (K=200 → kp=256): the arc accuracies are computed outside the
    kernel, so the silence semantics must ride through unchanged; acc-side
    pad slots are zero-filled (linear domain) and must stay inert."""
    k2 = 200
    rng = np.random.RandomState(11)
    src = rng.randint(0, 24, (B, T, A)).astype(np.int32)
    src[:, 0, :] = 0
    dst = rng.randint(0, 24, (B, T, A)).astype(np.int32)
    w = (rng.randn(B, T, A) * 0.3).astype(np.float32)
    w[:, :, 96:] = NEG_INF
    final = np.full((B, k2), NEG_INF, np.float32)
    final[:, :24] = (rng.randn(B, 24) * 0.2).astype(np.float32)
    lat = TimeSyncLattice(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rng.randint(0, P, (B, T, A)).astype(np.int32)),
        jnp.asarray(w), jnp.asarray(final))
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    p2p = jnp.asarray(np.arange(P, dtype=np.int32) % 3 + 1)
    ref = jnp.asarray(rng.randint(1, 4, (B, T)).astype(np.int32))
    lens = jnp.asarray(rng.randint(2, T + 1, B).astype(np.int32))
    sil = SilenceOpts(  # phone 1 is silence
        sil_pdf=jnp.asarray((np.asarray(p2p) == 1).astype(np.float32)),
        sil_phone=jnp.asarray(np.array([0, 1, 0, 0], np.float32)),
        one_silence_class=False)

    def f():
        def obj(o):
            return jnp.sum(lattice_expected_accuracy_ts(
                o, lat, ref, lens, "phone", p2p, sil))

        return jax.value_and_grad(obj)(obs)

    (v_ref, g_ref), (v_pal, g_pal) = _both(monkeypatch, f)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_padded_slot_count(_interpret, monkeypatch):
    """K=200 (not lane-aligned): the kernels run at kp=256 with inert pad
    slots and must match the XLA route exactly (the OTF train path's
    lattices have K = max_active = 200)."""
    k2 = 200
    rng = np.random.RandomState(7)
    src = rng.randint(0, 24, (B, T, A)).astype(np.int32)
    src[:, 0, :] = 0
    dst = rng.randint(0, 24, (B, T, A)).astype(np.int32)
    w = (rng.randn(B, T, A) * 0.3).astype(np.float32)
    w[:, :, 96:] = NEG_INF
    final = np.full((B, k2), NEG_INF, np.float32)
    final[:, :24] = (rng.randn(B, 24) * 0.2).astype(np.float32)
    lat = TimeSyncLattice(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(rng.randint(0, P, (B, T, A)).astype(np.int32)),
                          jnp.asarray(w), jnp.asarray(final))
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(rng.randint(2, T + 1, B).astype(np.int32))
    (z_ref, g_ref), (z_pal, g_pal) = _both(
        monkeypatch, lambda: lattice_occupancies_ts(obs, lat, lens))
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_chunked_band(_interpret, monkeypatch):
    """A wide enough (2048 at B=8/K=128) that _chunk_a picks ca=128: the
    in-kernel chunk loop's gather/scatter accumulation must be lossless."""
    from pykaldi2_tpu.ops.fb_lattice_pallas import _chunk_a

    a2 = 2048
    assert _chunk_a(B, K, a2) == 128  # the loop actually engages
    rng = np.random.RandomState(9)
    src = rng.randint(0, 24, (B, T, a2)).astype(np.int32)
    src[:, 0, :] = 0
    dst = rng.randint(0, 24, (B, T, a2)).astype(np.int32)
    w = (rng.randn(B, T, a2) * 0.3).astype(np.float32)
    w[:, :, a2 * 3 // 4:] = NEG_INF
    final = np.full((B, K), NEG_INF, np.float32)
    final[:, :24] = 0.0
    lat = TimeSyncLattice(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(rng.randint(0, P, (B, T, a2)).astype(np.int32)),
                          jnp.asarray(w), jnp.asarray(final))
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(rng.randint(2, T + 1, B).astype(np.int32))
    (z_ref, g_ref), (z_pal, g_pal) = _both(
        monkeypatch, lambda: lattice_occupancies_ts(obs, lat, lens))
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_uneven_slot_and_arc_dims(_interpret, monkeypatch):
    """K != A (256 slots, 128-wide band)."""
    rng = np.random.RandomState(5)
    k2 = 256
    src = rng.randint(0, 30, (B, T, A)).astype(np.int32)
    src[:, 0, :] = 0
    dst = rng.randint(0, 30, (B, T, A)).astype(np.int32)
    w = (rng.randn(B, T, A) * 0.3).astype(np.float32)
    final = np.full((B, k2), NEG_INF, np.float32)
    final[:, :30] = 0.0
    lat = TimeSyncLattice(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(rng.randint(0, P, (B, T, A)).astype(np.int32)),
                          jnp.asarray(w), jnp.asarray(final))
    obs = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, T + 1, B).astype(np.int32))
    (z_ref, g_ref), (z_pal, g_pal) = _both(
        monkeypatch, lambda: lattice_occupancies_ts(obs, lat, lens))
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
