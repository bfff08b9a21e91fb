"""FSA forward-backward kernels vs brute-force path enumeration.

SURVEY.md §5: "FSA forward-backward vs brute-force path enumeration on toy
graphs; gradients vs finite differences; log-semiring numerics".
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.ops.fsa import DenseFsa, brute_force_paths, linear_chain_fsa
from pykaldi2_tpu.ops.fb import (
    fsa_expected_accuracy,
    fsa_logz,
    fsa_occupancies,
    fsa_viterbi,
    pack_graph,
)


def _toy_graph(seed=0, num_states=4, num_pdfs=3, num_arcs=10):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, num_states, num_arcs).astype(np.int32)
    dst = rng.randint(0, num_states, num_arcs).astype(np.int32)
    # ensure state 0 has outgoing arcs and some state is reachable+final
    src[0] = 0
    pdf = rng.randint(0, num_pdfs, num_arcs).astype(np.int32)
    weight = rng.randn(num_arcs).astype(np.float32) * 0.5
    final = np.full(num_states, -np.inf, np.float32)
    final[rng.randint(1, num_states)] = 0.0
    final[0] = -0.5
    phone = rng.randint(0, 2, num_arcs).astype(np.int32)
    return DenseFsa(num_states, src, dst, pdf, weight, final, 0, phone).validate()


def _paths_logz(fsa, obs):
    """Brute-force logZ and per-frame pdf occupancies from path enumeration."""
    t_len = obs.shape[0]
    paths = brute_force_paths(fsa, t_len)
    if not paths:
        return -np.inf, np.zeros((t_len, obs.shape[1]))
    scores = []
    for arcs, w in paths:
        s = w + sum(obs[t, fsa.pdf[e]] for t, e in enumerate(arcs))
        scores.append(s)
    scores = np.array(scores)
    m = scores.max()
    z = np.exp(scores - m).sum()
    logz = m + np.log(z)
    post = np.exp(scores - logz)
    gamma = np.zeros((t_len, obs.shape[1]))
    for (arcs, _w), p in zip(paths, post):
        for t, e in enumerate(arcs):
            gamma[t, fsa.pdf[e]] += p
    return logz, gamma


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_logz_matches_brute_force(seed):
    fsa = _toy_graph(seed)
    rng = np.random.RandomState(seed + 10)
    t_len = 5
    obs = rng.randn(1, t_len, 3).astype(np.float32)
    g = pack_graph(fsa)
    logz = np.asarray(fsa_logz(jnp.asarray(obs), g, jnp.asarray([t_len])))
    want, _ = _paths_logz(fsa, obs[0].astype(np.float64))
    np.testing.assert_allclose(logz[0], want, rtol=1e-5, atol=1e-5)


def test_logz_gradient_is_occupancy():
    fsa = _toy_graph(3)
    rng = np.random.RandomState(13)
    t_len = 4
    obs = rng.randn(1, t_len, 3).astype(np.float32)
    g = pack_graph(fsa)

    grad = jax.grad(lambda o: jnp.sum(fsa_logz(o, g, jnp.asarray([t_len]))))(jnp.asarray(obs))
    _, gamma_bf = _paths_logz(fsa, obs[0].astype(np.float64))
    np.testing.assert_allclose(np.asarray(grad)[0], gamma_bf, rtol=1e-4, atol=1e-5)

    # and vs finite differences
    eps = 1e-3
    fd = np.zeros_like(obs[0])
    for t in range(t_len):
        for p in range(3):
            op = obs.copy(); op[0, t, p] += eps
            om = obs.copy(); om[0, t, p] -= eps
            fp = float(fsa_logz(jnp.asarray(op), g, jnp.asarray([t_len]))[0])
            fm = float(fsa_logz(jnp.asarray(om), g, jnp.asarray([t_len]))[0])
            fd[t, p] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grad)[0], fd, rtol=2e-3, atol=2e-3)


def test_logz_batched_variable_lengths():
    fsa = _toy_graph(4)
    g = pack_graph(fsa)
    rng = np.random.RandomState(14)
    t_max = 6
    obs = rng.randn(3, t_max, 3).astype(np.float32)
    lens = np.array([6, 4, 2], np.int32)
    logz = np.asarray(fsa_logz(jnp.asarray(obs), g, jnp.asarray(lens)))
    for b, L in enumerate(lens):
        want, _ = _paths_logz(fsa, obs[b, :L].astype(np.float64))
        np.testing.assert_allclose(logz[b], want, rtol=1e-5, atol=1e-5)
    # occupancies of padded frames are exactly zero
    _, gamma = fsa_occupancies(jnp.asarray(obs), g, jnp.asarray(lens))
    gamma = np.asarray(gamma)
    assert np.all(gamma[1, 4:] == 0) and np.all(gamma[2, 2:] == 0)
    np.testing.assert_allclose(gamma[1, :4].sum(-1), 1.0, atol=1e-4)


def test_linear_chain_logz_equals_alignment_score():
    ali = np.array([0, 1, 1, 2], np.int32)
    fsa = linear_chain_fsa(ali)
    g = pack_graph(fsa)
    rng = np.random.RandomState(15)
    obs = rng.randn(1, 4, 3).astype(np.float32)
    logz = float(fsa_logz(jnp.asarray(obs), g, jnp.asarray([4]))[0])
    want = obs[0, np.arange(4), ali].sum()
    np.testing.assert_allclose(logz, want, rtol=1e-6)


def test_viterbi_matches_brute_force():
    fsa = _toy_graph(5)
    g = pack_graph(fsa)
    rng = np.random.RandomState(16)
    t_len = 5
    obs = rng.randn(2, t_len, 3).astype(np.float32)
    score, arcs = fsa_viterbi(jnp.asarray(obs), g, jnp.asarray([t_len, t_len]))
    score, arcs = np.asarray(score), np.asarray(arcs)
    for b in range(2):
        paths = brute_force_paths(fsa, t_len)
        best = max(w + sum(obs[b, t, fsa.pdf[e]] for t, e in enumerate(a)) for a, w in paths)
        np.testing.assert_allclose(score[b], best, rtol=1e-5, atol=1e-5)
        # returned arc sequence is a valid path achieving the best score
        s = fsa.start
        tot = 0.0
        for t in range(t_len):
            e = arcs[b, t]
            assert fsa.src[e] == s
            tot += fsa.weight[e] + obs[b, t, fsa.pdf[e]]
            s = fsa.dst[e]
        tot += fsa.final[s]
        np.testing.assert_allclose(tot, best, rtol=1e-5, atol=1e-5)


def _paths_expected_acc(fsa, obs, ref, level):
    paths = brute_force_paths(fsa, obs.shape[0])
    scores, accs = [], []
    for arcs, w in paths:
        s = w + sum(obs[t, fsa.pdf[e]] for t, e in enumerate(arcs))
        lab = fsa.pdf if level == "pdf" else fsa.phone
        a = sum(1.0 for t, e in enumerate(arcs) if lab[e] == ref[t])
        scores.append(s)
        accs.append(a)
    scores = np.array(scores)
    m = scores.max()
    post = np.exp(scores - m) / np.exp(scores - m).sum()
    return float((post * np.array(accs)).sum())


@pytest.mark.parametrize("level", ["pdf", "phone"])
def test_expected_accuracy_matches_brute_force(level):
    fsa = _toy_graph(6)
    g = pack_graph(fsa)
    rng = np.random.RandomState(17)
    t_len = 4
    obs = rng.randn(1, t_len, 3).astype(np.float32)
    ref = rng.randint(0, 3 if level == "pdf" else 2, (1, t_len)).astype(np.int32)
    f = float(fsa_expected_accuracy(jnp.asarray(obs), g, jnp.asarray(ref), jnp.asarray([t_len]), level)[0])
    want = _paths_expected_acc(fsa, obs[0].astype(np.float64), ref[0], level)
    np.testing.assert_allclose(f, want, rtol=1e-4, atol=1e-5)


def test_expected_accuracy_gradient_finite_diff():
    fsa = _toy_graph(7)
    g = pack_graph(fsa)
    rng = np.random.RandomState(18)
    t_len = 3
    obs = rng.randn(1, t_len, 3).astype(np.float32)
    ref = rng.randint(0, 3, (1, t_len)).astype(np.int32)
    lens = jnp.asarray([t_len])

    grad = jax.grad(lambda o: jnp.sum(fsa_expected_accuracy(o, g, jnp.asarray(ref), lens, "pdf")))(
        jnp.asarray(obs))
    eps = 1e-3
    fd = np.zeros_like(obs[0])
    for t in range(t_len):
        for p in range(3):
            op = obs.copy(); op[0, t, p] += eps
            om = obs.copy(); om[0, t, p] -= eps
            fp = float(fsa_expected_accuracy(jnp.asarray(op), g, jnp.asarray(ref), lens, "pdf")[0])
            fm = float(fsa_expected_accuracy(jnp.asarray(om), g, jnp.asarray(ref), lens, "pdf")[0])
            fd[t, p] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grad)[0], fd, rtol=5e-3, atol=5e-3)


def test_padded_graph_same_logz():
    fsa = _toy_graph(8)
    rng = np.random.RandomState(19)
    obs = rng.randn(1, 5, 3).astype(np.float32)
    lens = jnp.asarray([5])
    z1 = float(fsa_logz(jnp.asarray(obs), pack_graph(fsa), lens)[0])
    z2 = float(fsa_logz(jnp.asarray(obs), pack_graph(fsa.pad_to(fsa.num_arcs + 7, fsa.num_states + 2)), lens)[0])
    np.testing.assert_allclose(z1, z2, rtol=1e-6)
