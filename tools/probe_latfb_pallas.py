"""On-chip probe for the one-hot Pallas banded-lattice FB kernels.

VERDICT r4 item 5: does the round-5 one-hot matmul formulation
(ops/fb_lattice_pallas.py) actually LOWER on this image's Mosaic, and if
so, does it beat the XLA matvec/scan paths?  One compile each at the
lat_mmi bench shape, grad parity between paths, then timing.

Run:  PK2_PLATFORM=tpu python tools/probe_latfb_pallas.py [B T K A] [crit]
``crit`` = mmi (default) | smbr (times the expected-accuracy kernels,
round-5 session-3 extension). Record the verdict in BASELINE.md either way.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pykaldi2_tpu.ops.fb_lattice import (TimeSyncLattice,
                                             lattice_expected_accuracy_ts,
                                             mmi_objective_lattice_ts)

    from pykaldi2_tpu.ops.fb import NEG_INF

    args = [int(x) for x in sys.argv[1:5]]
    B, T, K, A = (args + [32, 448, 256, 256][len(args):])
    crit = sys.argv[5] if len(sys.argv) > 5 else "mmi"
    NUM_PDFS = 8952
    rng = np.random.RandomState(0)
    # realistic CONNECTED banded lattice. Two traps found round 5 session 3
    # (both produced logZ = NEG_INF on chip AND CPU alike — the math was
    # right, the inputs were degenerate): (a) a fully random lattice with
    # final=0 compares garbage against garbage; (b) random src/dst over
    # `live` slots with n_arcs ≈ live is a SUBCRITICAL branching process
    # (alive-set branching factor n_live_arcs/live < 1 ⇒ the alive slot set
    # contracts to extinction by ~frame 250 at T=448 and the TRUE logZ is
    # NEG_INF). Arcs [0:live] are a deterministic self-loop spine (slot
    # j→j), so every live slot stays alive; arcs [live:4A/5] are random;
    # the rest are NEG_INF padding.
    live = min(K - 8, A // 2)
    spine = np.broadcast_to(np.arange(live, dtype=np.int32), (B, T, live))
    src = np.concatenate(
        [spine, rng.randint(0, live, (B, T, A - live)).astype(np.int32)], 2)
    dst = np.concatenate(
        [spine, rng.randint(0, live, (B, T, A - live)).astype(np.int32)], 2)
    src = np.ascontiguousarray(src)
    src[:, 0, :] = 0  # frame 0 leaves the single start slot
    w = (rng.randn(B, T, A) * 0.3).astype(np.float32)
    w[:, :, A * 4 // 5:] = NEG_INF  # ~20% padding arcs per frame
    final = np.full((B, K), NEG_INF, np.float32)
    final[:, :live] = (rng.randn(B, live) * 0.2).astype(np.float32)
    lat = TimeSyncLattice(
        src=jax.device_put(src),
        dst=jax.device_put(dst),
        pdf=jax.device_put(
            rng.randint(0, NUM_PDFS, (B, T, A)).astype(np.int32)),
        weight=jax.device_put(w),
        final=jax.device_put(final),
    )
    obs = jax.device_put(
        rng.randn(B, T, NUM_PDFS).astype(np.float32) * 0.1)
    ali = jax.device_put(rng.randint(0, NUM_PDFS, (B, T)).astype(np.int32))
    mask = jax.device_put(np.ones((B, T), np.float32))
    nf = jax.device_put(np.full(B, T, np.int32))

    def build():
        # fresh jit per env setting (the path gates read env at trace time)
        if crit == "smbr":
            return jax.jit(jax.value_and_grad(lambda o: jnp.sum(
                lattice_expected_accuracy_ts(o, lat, ali, nf))))
        return jax.jit(jax.value_and_grad(lambda o: jnp.sum(
            mmi_objective_lattice_ts(o, ali, lat, nf, mask, True, 1.0))))

    def run(name, env):
        for k_, v_ in env.items():
            os.environ[k_] = v_
        try:
            fn = build()

            def _sync(val, grad):
                # float() of a value data-dependent on the WHOLE computation:
                # block_until_ready alone under-measures through the axon
                # tunnel (repo timing rule, BASELINE.md methodology note)
                return float(val + jnp.sum(grad))

            t0 = time.perf_counter()
            v, g = fn(obs)
            _sync(v, g)
            compile_s = time.perf_counter() - t0
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                v, g = fn(obs)
            _sync(v, g)
            ms = (time.perf_counter() - t0) / n * 1e3
            print(json.dumps({"path": name, "ok": True,
                              "compile_s": round(compile_s, 1),
                              "ms_per_step": round(ms, 1),
                              "value": float(v)}), flush=True)
            return float(v), np.asarray(g)
        except Exception as e:
            print(json.dumps({"path": name, "ok": False,
                              "error": f"{type(e).__name__}: {e}"[:500]}),
                  flush=True)
            return None, None
        finally:
            for k_ in env:
                os.environ.pop(k_, None)

    v_mv, g_mv = run("xla_matvec", {"PK2_LATFB_MATVEC": "1"})
    v_sc, g_sc = run("xla_scan", {"PK2_LATFB_MATVEC": "0",
                                  "PK2_PALLAS_LATFB": "0"})
    v_pal, g_pal = run("pallas_onehot", {"PK2_LATFB_MATVEC": "0",
                                         "PK2_PALLAS_LATFB": "1"})

    def rel(name, va, ga, vb, gb):
        if ga is None or gb is None:
            return
        dv = abs(va - vb) / max(abs(vb), 1.0)
        dg = float(np.max(np.abs(ga - gb))
                   / max(float(np.max(np.abs(gb))), 1e-9))
        # bar: 1e-3 rel on grads — three exp-space renormalized f32
        # recursions over T=448 frames; the XLA scan-vs-matvec pair bounds
        # the inherent form-to-form noise (printed alongside)
        print(json.dumps({name: {"rel_dvalue": dv, "rel_dgrad_max": dg,
                                 "pass": dv < 1e-5 and dg < 1e-3}}),
              flush=True)

    rel("parity_pallas_vs_matvec", v_pal, g_pal, v_mv, g_mv)
    rel("parity_pallas_vs_scan", v_pal, g_pal, v_sc, g_sc)
    rel("parity_matvec_vs_scan", v_mv, g_mv, v_sc, g_sc)


if __name__ == "__main__":
    main()
