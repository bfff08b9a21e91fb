"""Pallas fused LSTM sequence kernels: weight-resident recurrence on TPU.

Why: the ``lax.scan`` LSTM re-reads the recurrent weight matrix Wh
(H×4H, ~8 MB bf16 at H=1024) from HBM on every timestep — ~640 MB per layer
per direction per pass. These kernels pin Wh (forward) / Whᵀ (backward) in
VMEM for the whole sequence (TPU grid steps run sequentially and VMEM scratch
persists across them), stream the per-step gate inputs/outputs through
pipelined block DMA, and keep h/c carries in fp32 scratch.

The backward kernel emits per-step pre-activation gate gradients; dWh then
falls out as ONE large [T·B, H]ᵀ×[T·B, 4H] MXU GEMM outside the kernel and
dX-projection is the gate-gradient tensor itself.

Masking follows models/lstm.py: padded frames carry state through unchanged,
which also makes the reversed (backward-direction) scan correct for
right-padded batches.

Gate order i, f, g, o (as models/lstm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET = int(15.8 * 1024 * 1024)  # headroom under the 16 MB scoped limit


def _sds(shape, dtype, like):
    """ShapeDtypeStruct inheriting the varying-axes type of ``like``.

    Inside ``shard_map`` with replication tracking (check_vma, the default),
    pallas_call out_shapes must declare how outputs vary across mesh axes;
    every output here varies exactly like the streamed inputs (batch-sharded).
    Outside shard_map the vma is the empty set and this is a no-op.
    """
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=jax.typeof(like).vma)
    except (AttributeError, TypeError):
        return jax.ShapeDtypeStruct(shape, dtype)


def _vma(x) -> frozenset:
    try:
        return frozenset(jax.typeof(x).vma)
    except (AttributeError, TypeError):
        return frozenset()


def _match_vma(*arrs):
    """pvary every operand up to the union vma (pallas_call requires all
    kernel operands to share a varying-axes type under shard_map); a no-op
    outside shard_map. The pvary lives inside a custom_vjp's fwd/bwd, so its
    AD transpose never runs — the explicit weight-grad psum below is the
    counterpart."""
    target = frozenset().union(*[_vma(a) for a in arrs])
    out = []
    for a in arrs:
        axes = tuple(sorted(target - _vma(a)))
        if axes:
            a = jax.lax.pcast(a, axes, to="varying")
        out.append(a)
    return out


def _psum_weight_grad(dw, varying_like, weight_like):
    """Reduce a weight cotangent over mesh axes the activations vary on.

    The custom VJP bypasses JAX's automatic pbroadcast-transpose (which is
    what psums cotangents of replicated params under shard_map replication
    tracking), so the kernel's own backward must do it: dW computed from
    batch-sharded activations is varying over the data axes while the weight
    is replicated — sum it so the returned cotangent's vma matches the
    primal weight's. No-op outside shard_map.
    """
    axes = tuple(sorted(_vma(varying_like) - _vma(weight_like)))
    return jax.lax.psum(dw, axes) if axes else dw


def _vmem_bytes(b: int, h: int, stream_bytes: int) -> int:
    """Worst-case (backward) VMEM estimate: resident Whᵀ + double-buffered
    per-step blocks + fp32 scratch carries. ``stream_bytes`` is the element
    size of the streamed gate-width tensors (4 = fp32 mode, 2 = bf16 mode)."""
    wh = 2 * h * 4 * h                            # bf16 weights, resident
    per_step = (stream_bytes * b * 4 * h          # dgates out [B,4H]
                + 2 * b * 4 * h                   # gates bf16 [B,4H]
                + 2 * 4 * b * h                   # cs/cs_prev fp32 [B,H]
                + stream_bytes * b * h)           # dys [B,H]
    scratch = 2 * 4 * b * h
    return wh + 2 * per_step + scratch


# Multi-tile (2-D grid) runs cost roughly one extra pipeline buffer stage
# over the single-tile 1-D grid (measured: tile 128 at H=1024 compiles 1-D
# but VMEM-OOMs by ~0.3 MB under grid=(2,T)), so tiles chosen for 2-D grids
# get a reduced budget.
_VMEM_BUDGET_TILED = int(14.5 * 1024 * 1024)


def _fp32_mode(b: int, h: int) -> bool:
    tb = _tile_b(b, h)
    return tb > 0 and _vmem_bytes(tb, h, 4) <= (
        _VMEM_BUDGET if tb == b else _VMEM_BUDGET_TILED)


def _tile_b(b: int, h: int) -> int:
    """Largest batch tile (divisor of b, multiple of 8) whose per-step blocks
    fit the VMEM budget. Single-tile batches run the original grid=(T,)
    pipeline; larger batches run grid=(b/tile, T) with the weights resident
    across tiles and h/c scratch re-initializing per tile."""
    if b % 8 == 0 and _vmem_bytes(b, h, 2) <= _VMEM_BUDGET:
        return b
    tb = b - 8
    while tb >= 8:
        if b % tb == 0 and tb % 8 == 0 and _vmem_bytes(tb, h, 2) <= _VMEM_BUDGET_TILED:
            return tb
        tb -= 8
    return 0


def _supported(b: int, h: int) -> bool:
    return b % 8 == 0 and h % 128 == 0 and _tile_b(b, h) > 0


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xp_ref, wh_ref, mask_ref, ys_ref, cs_ref, gates_ref, h_s, c_s,
                *, t_axis=0):
    t = pl.program_id(t_axis)  # grid (T,) or (batch tiles, T); T innermost

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    h = h_s[:]
    gates = xp_ref[0] + jnp.dot(
        h.astype(wh_ref.dtype), wh_ref[:], preferred_element_type=jnp.float32
    )
    hdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim : 2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim :])
    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)
    m = mask_ref[0]                      # [B, 1]
    h_s[:] = m * h_new + (1.0 - m) * h
    c_s[:] = m * c_new + (1.0 - m) * c_s[:]
    ys_ref[0] = h_s[:]
    cs_ref[0] = c_s[:]
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(gates_ref.dtype)


def _lstm_fwd_pallas(xp, wh, mask):
    """xp [T,B,4H] f32, wh [H,4H] bf16, mask [T,B,1] f32 → (ys, cs, gates)."""
    xp, wh, mask = _match_vma(xp, wh, mask)
    t_len, b, h4 = xp.shape
    h = h4 // 4
    tb = _tile_b(b, h)
    if tb == b:
        grid = (t_len,)
        t_axis, io_map, w_map = 0, (lambda t: (t, 0, 0)), (lambda t: (0, 0))
    else:
        grid = (b // tb, t_len)
        t_axis, io_map, w_map = 1, (lambda bt, t: (t, bt, 0)), (lambda bt, t: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_axis=t_axis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, h4), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 1), io_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, h), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h4), io_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((t_len, b, h), jnp.float32, xp),
            _sds((t_len, b, h), jnp.float32, xp),
            _sds((t_len, b, h4), jnp.bfloat16, xp),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, h), jnp.float32),
            pltpu.VMEM((tb, h), jnp.float32),
        ],
    )(xp, wh, mask)


# ---------------------------------------------------------------------------
# backward kernel (reverse time)
# ---------------------------------------------------------------------------


def _bwd_kernel(dys_ref, gates_ref, cs_ref, csp_ref, mask_ref, whT_ref,
                dgates_ref, dh_s, dc_s, *, t_axis=0):
    t = pl.program_id(t_axis)  # T innermost, reversed by the index maps

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    hdim = dh_s.shape[-1]
    m = mask_ref[0]                                  # [B, 1]
    dh_total = dh_s[:] + dys_ref[0]                  # recurrent + output cotangent
    dc_in = dc_s[:]
    gates = gates_ref[0].astype(jnp.float32)
    i = gates[:, :hdim]
    f = gates[:, hdim : 2 * hdim]
    g = gates[:, 2 * hdim : 3 * hdim]
    o = gates[:, 3 * hdim :]
    c = cs_ref[0]
    c_prev = csp_ref[0]
    tanh_c = jnp.tanh(c)
    dh_m = m * dh_total
    do = dh_m * tanh_c
    dc = dh_m * o * (1.0 - tanh_c * tanh_c) + m * dc_in
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dgates = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g), do * o * (1.0 - o)],
        axis=-1,
    )
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)
    dh_rec = jnp.dot(dgates.astype(whT_ref.dtype), whT_ref[:],
                     preferred_element_type=jnp.float32)
    dh_s[:] = dh_rec + (1.0 - m) * dh_total
    dc_s[:] = dc * f + (1.0 - m) * dc_in


def _lstm_bwd_pallas(dys, gates, cs, cs_prev, mask, whT, dgates_dtype):
    dys, gates, cs, cs_prev, mask, whT = _match_vma(
        dys, gates, cs, cs_prev, mask, whT)
    t_len, b, h = dys.shape
    h4 = 4 * h
    tb = _tile_b(b, h)
    if tb == b:
        grid = (t_len,)
        t_axis, rev, w_map = 0, (lambda t: (t_len - 1 - t, 0, 0)), (lambda t: (0, 0))
    else:
        grid = (b // tb, t_len)
        t_axis = 1
        rev = lambda bt, t: (t_len - 1 - t, bt, 0)
        w_map = lambda bt, t: (0, 0)
    (dgates,) = pl.pallas_call(
        functools.partial(_bwd_kernel, t_axis=t_axis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h4, h), w_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, h4), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[_sds((t_len, b, h4), dgates_dtype, dys)],
        scratch_shapes=[
            pltpu.VMEM((tb, h), jnp.float32),
            pltpu.VMEM((tb, h), jnp.float32),
        ],
    )(dys, gates, cs, cs_prev, mask, whT)
    return dgates


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


def _stream_dtype(xp):
    """fp32 streaming when the VMEM budget allows, bf16 otherwise (large B).

    The bf16 mode stores gate inputs / output cotangents / gate gradients in
    bf16 (standard mixed-precision; fp32 cell state and fp32 gate math are
    unchanged) to fit batches the fp32 mode cannot.
    """
    _t, b, h4 = xp.shape
    return jnp.float32 if _fp32_mode(b, h4 // 4) else jnp.bfloat16


@jax.custom_vjp
def lstm_seq_pallas(xp, wh, mask):
    """xp [T,B,4H] (input projections + bias), wh [H,4H], mask [T,B,1] → ys [T,B,H]."""
    sd = _stream_dtype(xp)
    ys, _, _ = _lstm_fwd_pallas(xp.astype(sd), wh.astype(jnp.bfloat16), mask)
    return ys


def _seq_fwd(xp, wh, mask):
    sd = _stream_dtype(xp)
    wh_b = wh.astype(jnp.bfloat16)
    ys, cs, gates = _lstm_fwd_pallas(xp.astype(sd), wh_b, mask)
    return ys, (wh_b, mask, ys, cs, gates)


def _seq_bwd(res, dys):
    wh_b, mask, ys, cs, gates = res
    t_len, b, h = ys.shape
    sd = jnp.float32 if _fp32_mode(b, h) else jnp.bfloat16
    cs_prev = jnp.concatenate([jnp.zeros((1, b, h), jnp.float32), cs[:-1]], axis=0)
    whT = jnp.swapaxes(wh_b, 0, 1)
    dgates = _lstm_bwd_pallas(dys.astype(sd), gates, cs, cs_prev, mask, whT, sd)
    # dWh = sum_t h_{t-1}^T dgates_t — one big MXU GEMM
    h_prev = jnp.concatenate([jnp.zeros((1, b, h), jnp.float32), ys[:-1]], axis=0)
    dwh = jax.lax.dot_general(
        h_prev.reshape(-1, h).astype(jnp.bfloat16),
        dgates.reshape(-1, 4 * h).astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwh = _psum_weight_grad(dwh, dgates, wh_b)
    return dgates.astype(jnp.float32), dwh, None


lstm_seq_pallas.defvjp(_seq_fwd, _seq_bwd)


def supported(b: int, h: int) -> bool:
    """Shapes the kernels handle (8-sublane batch, 128-lane hidden)."""
    return _supported(b, h)


# ---------------------------------------------------------------------------
# projected-LSTM (LSTMP) kernels
#
# Reference behavior: torch.nn.LSTM(proj_size=P) as used by LSTMP acoustic
# models (models/lstm.py proj_size). The recurrence reads the projected state
# hp [B, P], so the recurrent weight is Wh [P, 4H] (half the FLOPs at P=H/2)
# and a projection Wp [H, P] follows the cell output each step. Both weights
# stay VMEM-resident across the whole sequence.
# ---------------------------------------------------------------------------


def _vmem_bytes_proj(b: int, h: int, p: int, stream_bytes: int) -> int:
    """Worst-case (backward) VMEM estimate for the projected kernels."""
    resident = 2 * p * 4 * h + 2 * h * p          # Whᵀ + Wpᵀ, bf16
    per_step = (stream_bytes * b * 4 * h          # dgates out [B,4H]
                + 2 * b * 4 * h                   # gates bf16 [B,4H]
                + 2 * 4 * b * h                   # cs/cs_prev fp32 [B,H]
                + 2 * b * h                       # h_full bf16 [B,H]
                + 2 * stream_bytes * b * p)       # dys in + dhpm out [B,P]
    scratch = 4 * b * p + 4 * b * h
    return resident + 2 * per_step + scratch


def _tile_b_proj(b: int, h: int, p: int) -> int:
    if b % 8 == 0 and _vmem_bytes_proj(b, h, p, 2) <= _VMEM_BUDGET:
        return b
    tb = b - 8
    while tb >= 8:
        if (b % tb == 0 and tb % 8 == 0
                and _vmem_bytes_proj(tb, h, p, 2) <= _VMEM_BUDGET_TILED):
            return tb
        tb -= 8
    return 0


def _fp32_mode_proj(b: int, h: int, p: int) -> bool:
    tb = _tile_b_proj(b, h, p)
    return tb > 0 and _vmem_bytes_proj(tb, h, p, 4) <= (
        _VMEM_BUDGET if tb == b else _VMEM_BUDGET_TILED)


def supported_proj(b: int, h: int, p: int) -> bool:
    return (b % 8 == 0 and h % 128 == 0 and p % 128 == 0
            and _tile_b_proj(b, h, p) > 0)


def _fwd_proj_kernel(xp_ref, wh_ref, wp_ref, mask_ref,
                     ys_ref, cs_ref, gates_ref, hfull_ref, hp_s, c_s,
                     *, t_axis=0):
    t = pl.program_id(t_axis)  # grid (T,) or (batch tiles, T); T innermost

    @pl.when(t == 0)
    def _():
        hp_s[:] = jnp.zeros_like(hp_s)
        c_s[:] = jnp.zeros_like(c_s)

    hp = hp_s[:]
    gates = xp_ref[0] + jnp.dot(
        hp.astype(wh_ref.dtype), wh_ref[:], preferred_element_type=jnp.float32
    )
    hdim = c_s.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim : 2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim :])
    c_new = f * c_s[:] + i * g
    h_full = o * jnp.tanh(c_new)
    hp_new = jnp.dot(h_full.astype(wp_ref.dtype), wp_ref[:],
                     preferred_element_type=jnp.float32)
    m = mask_ref[0]                      # [B, 1]
    hp_s[:] = m * hp_new + (1.0 - m) * hp
    c_s[:] = m * c_new + (1.0 - m) * c_s[:]
    ys_ref[0] = hp_s[:]
    cs_ref[0] = c_s[:]
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(gates_ref.dtype)
    hfull_ref[0] = h_full.astype(hfull_ref.dtype)


def _lstm_fwd_proj_pallas(xp, wh, wp, mask):
    """xp [T,B,4H], wh [P,4H] bf16, wp [H,P] bf16, mask [T,B,1]
    → (ys [T,B,P] f32, cs [T,B,H] f32, gates [T,B,4H] bf16, hfull [T,B,H] bf16)."""
    xp, wh, wp, mask = _match_vma(xp, wh, wp, mask)
    t_len, b, h4 = xp.shape
    h = h4 // 4
    p = wh.shape[0]
    tb = _tile_b_proj(b, h, p)
    if tb == b:
        grid = (t_len,)
        t_axis, io_map, w_map = 0, (lambda t: (t, 0, 0)), (lambda t: (0, 0))
    else:
        grid = (b // tb, t_len)
        t_axis, io_map, w_map = 1, (lambda bt, t: (t, bt, 0)), (lambda bt, t: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_proj_kernel, t_axis=t_axis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, h4), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, h4), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, p), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 1), io_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, p), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h4), io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), io_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((t_len, b, p), jnp.float32, xp),
            _sds((t_len, b, h), jnp.float32, xp),
            _sds((t_len, b, h4), jnp.bfloat16, xp),
            _sds((t_len, b, h), jnp.bfloat16, xp),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, p), jnp.float32),
            pltpu.VMEM((tb, h), jnp.float32),
        ],
    )(xp, wh, wp, mask)


def _bwd_proj_kernel(dys_ref, gates_ref, cs_ref, csp_ref, mask_ref,
                     whT_ref, wpT_ref, dgates_ref, dhpm_ref, dhp_s, dc_s,
                     *, t_axis=0):
    t = pl.program_id(t_axis)  # T innermost, reversed by the index maps

    @pl.when(t == 0)
    def _():
        dhp_s[:] = jnp.zeros_like(dhp_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    hdim = dc_s.shape[-1]
    m = mask_ref[0]                                  # [B, 1]
    dhp_total = dhp_s[:] + dys_ref[0]                # recurrent + output cotangent
    dhp_m = m * dhp_total                            # hp_new = m·proj + (1−m)·hp
    dc_in = dc_s[:]
    # back through the projection: dh_full = dhp_m @ Wpᵀ
    dh_full = jnp.dot(dhp_m.astype(wpT_ref.dtype), wpT_ref[:],
                      preferred_element_type=jnp.float32)
    gates = gates_ref[0].astype(jnp.float32)
    i = gates[:, :hdim]
    f = gates[:, hdim : 2 * hdim]
    g = gates[:, 2 * hdim : 3 * hdim]
    o = gates[:, 3 * hdim :]
    c = cs_ref[0]
    c_prev = csp_ref[0]
    tanh_c = jnp.tanh(c)
    do = dh_full * tanh_c
    dc = dh_full * o * (1.0 - tanh_c * tanh_c) + m * dc_in
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dgates = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g), do * o * (1.0 - o)],
        axis=-1,
    )
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)
    dhpm_ref[0] = dhp_m.astype(dhpm_ref.dtype)
    dhp_rec = jnp.dot(dgates.astype(whT_ref.dtype), whT_ref[:],
                      preferred_element_type=jnp.float32)
    dhp_s[:] = dhp_rec + (1.0 - m) * dhp_total
    dc_s[:] = dc * f + (1.0 - m) * dc_in


def _lstm_bwd_proj_pallas(dys, gates, cs, cs_prev, mask, whT, wpT, stream_dtype):
    dys, gates, cs, cs_prev, mask, whT, wpT = _match_vma(
        dys, gates, cs, cs_prev, mask, whT, wpT)
    t_len, b, p = dys.shape
    h = cs.shape[-1]
    h4 = 4 * h
    tb = _tile_b_proj(b, h, p)
    if tb == b:
        grid = (t_len,)
        t_axis, rev, w_map = 0, (lambda t: (t_len - 1 - t, 0, 0)), (lambda t: (0, 0))
    else:
        grid = (b // tb, t_len)
        t_axis = 1
        rev = lambda bt, t: (t_len - 1 - t, bt, 0)
        w_map = lambda bt, t: (0, 0)
    dgates, dhpm = pl.pallas_call(
        functools.partial(_bwd_proj_kernel, t_axis=t_axis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, p), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h4, p), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, h), w_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, p), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((t_len, b, h4), stream_dtype, dys),
            _sds((t_len, b, p), stream_dtype, dys),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, p), jnp.float32),
            pltpu.VMEM((tb, h), jnp.float32),
        ],
    )(dys, gates, cs, cs_prev, mask, whT, wpT)
    return dgates, dhpm


def _stream_dtype_proj(xp, p):
    _t, b, h4 = xp.shape
    return jnp.float32 if _fp32_mode_proj(b, h4 // 4, p) else jnp.bfloat16


@jax.custom_vjp
def lstm_seq_proj_pallas(xp, wh, wp, mask):
    """Projected-LSTM sequence kernel.

    xp [T,B,4H] (input projections + bias), wh [P,4H], wp [H,P],
    mask [T,B,1] → ys [T,B,P] (projected hidden states).
    """
    sd = _stream_dtype_proj(xp, wh.shape[0])
    ys, _, _, _ = _lstm_fwd_proj_pallas(
        xp.astype(sd), wh.astype(jnp.bfloat16), wp.astype(jnp.bfloat16), mask)
    return ys


def _seq_proj_fwd(xp, wh, wp, mask):
    sd = _stream_dtype_proj(xp, wh.shape[0])
    wh_b = wh.astype(jnp.bfloat16)
    wp_b = wp.astype(jnp.bfloat16)
    ys, cs, gates, hfull = _lstm_fwd_proj_pallas(xp.astype(sd), wh_b, wp_b, mask)
    return ys, (wh_b, wp_b, mask, ys, cs, gates, hfull)


def _seq_proj_bwd(res, dys):
    wh_b, wp_b, mask, ys, cs, gates, hfull = res
    t_len, b, p = ys.shape
    h = cs.shape[-1]
    sd = jnp.float32 if _fp32_mode_proj(b, h, p) else jnp.bfloat16
    cs_prev = jnp.concatenate([jnp.zeros((1, b, h), jnp.float32), cs[:-1]], axis=0)
    whT = jnp.swapaxes(wh_b, 0, 1)
    wpT = jnp.swapaxes(wp_b, 0, 1)
    dgates, dhpm = _lstm_bwd_proj_pallas(
        dys.astype(sd), gates, cs, cs_prev, mask, whT, wpT, sd)
    # dWh = Σ_t hp_{t-1}ᵀ dgates_t ; dWp = Σ_t h_fullᵀ dhp_m — two big MXU GEMMs
    hp_prev = jnp.concatenate([jnp.zeros((1, b, p), jnp.float32), ys[:-1]], axis=0)
    dwh = jax.lax.dot_general(
        hp_prev.reshape(-1, p).astype(jnp.bfloat16),
        dgates.reshape(-1, 4 * h).astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwp = jax.lax.dot_general(
        hfull.reshape(-1, h),
        dhpm.reshape(-1, p).astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwh = _psum_weight_grad(dwh, dgates, wh_b)
    dwp = _psum_weight_grad(dwp, dgates, wp_b)
    return dgates.astype(jnp.float32), dwh, dwp, None


lstm_seq_proj_pallas.defvjp(_seq_proj_fwd, _seq_proj_bwd)
