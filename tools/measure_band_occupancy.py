"""Measure true per-frame link counts of the device-OTF search bands.

The profiler (tools/profile_dev_otf.py, round 5) shows the banded train
step is ~all lattice-FB, and the FB cost is ~linear in the band width A —
but the search pads every frame's links to max_arcs (800 at the bench
config).  Valid links are a sort-order PREFIX of the band, so if the true
max count fits a smaller power-of-two bucket, slicing the band is lossless
(identical lattice) and the FB pays only for real links.

Prints the per-(b,t) link-count distribution + dropped counts at the bench
config, and times the lattice FB at candidate sliced widths.

Run:  PK2_PLATFORM=tpu python tools/measure_band_occupancy.py
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

    import bench
    from pykaldi2_tpu.decode.device_lattice import device_lattice_generate

    def note(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", flush=True)

    B, T = 32, 448
    note("setup...")
    graph, forward_fn, train_fn, batch, params, opt_state = \
        bench._dev_otf_setup(B, T, "mmi")
    note("forward...")
    obs = forward_fn(params, batch)

    @jax.jit
    def stats(o):
        lat, _sc, dropped = device_lattice_generate(
            o, graph, batch["num_frames"], max_active=200, max_arcs=800,
            beam=10.0, lattice_beam=4.0)
        valid = lat.weight > 0.5 * (-1e30)
        counts = jnp.sum(valid.astype(jnp.int32), axis=2)   # [B, T]
        return counts, dropped, lat

    counts, dropped, lat = stats(obs)
    counts = np.asarray(counts)
    note("counts pulled")
    hist = {int(p): int(np.percentile(counts, p))
            for p in (50, 90, 99, 100)}
    print(json.dumps({"link_counts": hist,
                      "dropped_at_800": int(np.asarray(dropped).sum()),
                      "mean": float(counts.mean())}), flush=True)

    # FB timing at sliced widths (valid links are a sort-order prefix)
    from pykaldi2_tpu.ops.fb_lattice import mmi_objective_lattice_ts

    sup = jnp.asarray(np.ones((B, T), np.float32))
    labels = batch["labels"]
    nf = batch["num_frames"]

    def slice_lat(l, a):
        return type(l)(src=l.src[:, :, :a], dst=l.dst[:, :, :a],
                       pdf=l.pdf[:, :, :a], weight=l.weight[:, :, :a],
                       final=l.final)

    def timefb(l):
        @jax.jit
        def f(o):
            def g(o32):
                return jnp.sum(mmi_objective_lattice_ts(
                    o32, labels, l, nf, sup, True, 1.0))
            return jax.value_and_grad(g)(o.astype(jnp.float32))

        v, gr = f(obs)
        float(v + jnp.sum(gr))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            v, gr = f(obs)
        float(v + jnp.sum(gr))
        return (time.perf_counter() - t0) / n * 1e3, float(v)

    mx = int(counts.max())
    cands = sorted({800} | {a for a in (128, 192, 256, 320, 384, 512)
                            if a >= mx})
    vals = {}
    for a in cands:
        note(f"fb at A={a}...")
        ms, v = timefb(slice_lat(lat, a))
        vals[a] = (ms, v)
        print(json.dumps({"A": a, "latfb_ms": round(ms, 1),
                          "objective_rows_sum": v}), flush=True)
    # objective must be IDENTICAL across widths >= max count (lossless slice)
    ref = vals[800][1]
    print(json.dumps({"lossless": all(abs(v - ref) < 1e-3 * max(abs(ref), 1)
                                      for _ms, v in vals.values()),
                      "max_count": mx}), flush=True)


if __name__ == "__main__":
    main()
