"""On-chip probe for the one-hot Pallas banded-lattice FB kernels.

VERDICT r4 item 5: does the round-5 one-hot matmul formulation
(ops/fb_lattice_pallas.py) actually LOWER on this image's Mosaic, and if
so, does it beat the XLA matvec/scan paths?  One compile each at the
lat_mmi bench shape, grad parity between paths, then timing.

Run:  PK2_PLATFORM=tpu python tools/probe_latfb_pallas.py [B T K A]
Record the verdict in BASELINE.md either way.
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
                                             mmi_objective_lattice_ts)

    args = [int(x) for x in sys.argv[1:5]]
    B, T, K, A = (args + [32, 448, 256, 256][len(args):])
    NUM_PDFS = 8952
    rng = np.random.RandomState(0)
    lat = TimeSyncLattice(
        src=jax.device_put(rng.randint(0, K, (B, T, A)).astype(np.int32)),
        dst=jax.device_put(rng.randint(0, K, (B, T, A)).astype(np.int32)),
        pdf=jax.device_put(
            rng.randint(0, NUM_PDFS, (B, T, A)).astype(np.int32)),
        weight=jax.device_put((rng.randn(B, T, A) * 0.1).astype(np.float32)),
        final=jax.device_put(np.zeros((B, K), np.float32)),
    )
    obs = jax.device_put(
        rng.randn(B, T, NUM_PDFS).astype(np.float32) * 0.1)
    ali = jax.device_put(rng.randint(0, NUM_PDFS, (B, T)).astype(np.int32))
    mask = jax.device_put(np.ones((B, T), np.float32))
    nf = jax.device_put(np.full(B, T, np.int32))

    def build():
        # fresh jit per env setting (the path gates read env at trace time)
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

    v_ref, g_ref = run("xla_default", {})
    v_pal, g_pal = run("pallas_onehot", {"PK2_PALLAS_LATFB": "1"})
    if g_ref is not None and g_pal is not None:
        dv = abs(v_pal - v_ref) / max(abs(v_ref), 1.0)
        dg = float(np.max(np.abs(g_pal - g_ref))
                   / max(float(np.max(np.abs(g_ref))), 1e-9))
        print(json.dumps({"parity": {"rel_dvalue": dv, "rel_dgrad_max": dg,
                                     "pass": dv < 1e-5 and dg < 1e-4}}),
              flush=True)


if __name__ == "__main__":
    main()
