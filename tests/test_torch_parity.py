"""Behavioral parity vs the reference's actual model layer: torch.nn.LSTM.

The reference's acoustic models ARE ``torch.nn.LSTM`` (+ an output Linear)
— pykaldi2/models/lstm.py ``LSTMStack``/``NnetAM`` (SURVEY.md §3.1
"Models"). The reference mount is empty, but torch (CPU) is in this
environment, so the model layer's parity can be asserted DIRECTLY against
the reference implementation rather than against transcribed semantics:
identical weights → identical outputs (fp32 tolerance), for LSTM, BLSTM,
multi-layer stacks, and LSTMP (proj_size), plus CE loss vs
``nn.CrossEntropyLoss``.

Weight mapping (torch convention): weight_ih_l{k} [4H, D] = our wx.T,
weight_hh_l{k} [4H, H or P] = our wh.T, weight_hr_l{k} [P, H] = our wp.T,
bias_ih = our b, bias_hh = 0. Torch gate order (i, f, g, o) matches ours.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pykaldi2_tpu.models.lstm import LSTMStack
from pykaldi2_tpu.ops.losses import ce_loss


def _copy_params_to_torch(stack: LSTMStack, params: dict, tl: "torch.nn.LSTM"):
    sd = {}
    for k, lp in enumerate(params["layers"]):
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if d not in lp:
                continue
            p = lp[d]
            sd[f"weight_ih_l{k}{suffix}"] = torch.tensor(np.asarray(p["wx"]).T.copy())
            sd[f"weight_hh_l{k}{suffix}"] = torch.tensor(np.asarray(p["wh"]).T.copy())
            sd[f"bias_ih_l{k}{suffix}"] = torch.tensor(np.asarray(p["b"]).copy())
            sd[f"bias_hh_l{k}{suffix}"] = torch.zeros_like(sd[f"bias_ih_l{k}{suffix}"])
            if "wp" in p:
                sd[f"weight_hr_l{k}{suffix}"] = torch.tensor(np.asarray(p["wp"]).T.copy())
    tl.load_state_dict(sd)


def _parity_case(bidirectional, num_layers, proj_size, seed, atol=2e-5):
    b, t, d, h = 3, 11, 10, 16
    stack = LSTMStack(d, h, num_layers, bidirectional=bidirectional,
                      proj_size=proj_size, compute_dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(seed))
    tl = torch.nn.LSTM(d, h, num_layers, batch_first=True,
                       bidirectional=bidirectional, proj_size=proj_size)
    _copy_params_to_torch(stack, params, tl)

    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, d).astype(np.float32)
    ours = np.asarray(stack.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs, _ = tl(torch.tensor(x))
    theirs = theirs.numpy()
    if bidirectional:
        # torch output interleaves [fwd, bwd] per layer output — ours
        # concatenates the same way, so shapes/layout agree directly
        assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-4)


def test_lstm_matches_torch():
    _parity_case(False, 1, 0, seed=0)


def test_lstm_two_layers_matches_torch():
    _parity_case(False, 2, 0, seed=1)


def test_blstm_matches_torch():
    _parity_case(True, 1, 0, seed=2)


def test_blstm_stack_matches_torch():
    _parity_case(True, 3, 0, seed=3, atol=5e-5)


def test_lstmp_matches_torch():
    _parity_case(False, 1, 8, seed=4)


def test_blstmp_stack_matches_torch():
    _parity_case(True, 2, 8, seed=5, atol=5e-5)


def test_ce_loss_matches_torch_cross_entropy():
    rng = np.random.RandomState(7)
    b, t, c = 4, 9, 12
    logits = rng.randn(b, t, c).astype(np.float32) * 2
    labels = rng.randint(0, c, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.float32)
    mask[-1, t // 2:] = 0.0
    labels_masked = labels.copy()
    labels_masked[mask == 0] = -1   # our padding convention

    ours, count = ce_loss(jnp.asarray(logits), jnp.asarray(labels_masked),
                          jnp.asarray(mask))
    # reference: nn.CrossEntropyLoss(ignore_index=-1) over [B*T, C]
    loss = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.tensor(logits.reshape(-1, c)),
        torch.tensor(labels_masked.reshape(-1).astype(np.int64)))
    assert abs(float(ours) - float(loss)) < 1e-5
    assert int(count) == int(mask.sum())


def test_masked_lstm_matches_torch_packed_sequence():
    """Padded batches: our mask semantics vs the reference's
    pack_padded_sequence path (SURVEY.md §4.2 SE trainer) — valid frames of
    each utterance must match; our outputs at padded frames carry state
    (by design) and are excluded by masks downstream."""
    b, t, d, h = 3, 12, 6, 16
    lens = [12, 9, 5]
    stack = LSTMStack(d, h, 1, bidirectional=True, compute_dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(8))
    tl = torch.nn.LSTM(d, h, 1, batch_first=True, bidirectional=True)
    _copy_params_to_torch(stack, params, tl)

    rng = np.random.RandomState(8)
    x = rng.randn(b, t, d).astype(np.float32)
    for i, L in enumerate(lens):
        x[i, L:] = 0.0
    mask = np.zeros((b, t), np.float32)
    for i, L in enumerate(lens):
        mask[i, :L] = 1.0

    ours = np.asarray(stack.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), lens, batch_first=True)
    with torch.no_grad():
        out_packed, _ = tl(packed)
    theirs, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=t)
    theirs = theirs.numpy()
    for i, L in enumerate(lens):
        np.testing.assert_allclose(ours[i, :L], theirs[i, :L],
                                   atol=5e-5, rtol=1e-4)


def test_optimizers_match_torch_optim():
    """The reference wraps torch.optim SGD(momentum)/Adam in Horovod
    (SURVEY.md §3.1 CE trainer row); our optax chain must trace the same
    parameter trajectory on identical gradients."""
    import optax

    from pykaldi2_tpu.config import OptimizerConfig
    from pykaldi2_tpu.utils import make_optimizer

    rng = np.random.RandomState(9)
    w0 = rng.randn(6).astype(np.float32)
    grads = [rng.randn(6).astype(np.float32) for _ in range(6)]

    for typ, torch_opt_fn, tol in [
        ("momentum",
         lambda p: torch.optim.SGD([p], lr=0.1, momentum=0.9), 1e-6),
        ("sgd", lambda p: torch.optim.SGD([p], lr=0.1), 1e-7),
        ("adam", lambda p: torch.optim.Adam([p], lr=0.1), 1e-5),
    ]:
        opt = make_optimizer(OptimizerConfig(type=typ, lr=0.1, momentum=0.9,
                                             grad_clip=0.0))
        w = jnp.asarray(w0)
        state = opt.init(w)
        tp = torch.nn.Parameter(torch.tensor(w0.copy()))
        topt = torch_opt_fn(tp)
        for g in grads:
            upd, state = opt.update(jnp.asarray(g), state, w)
            w = optax.apply_updates(w, upd)
            topt.zero_grad()
            tp.grad = torch.tensor(g.copy())
            topt.step()
        np.testing.assert_allclose(np.asarray(w), tp.detach().numpy(),
                                   atol=tol, rtol=1e-5), typ
