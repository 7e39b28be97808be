"""Binary-swap combine cost model for config 5 (VERDICT round-2 item 4).

The 8-chip c5 frame = per-chip depth-slice render (measured on the real
chip: bench/suite.py c5shard) + the binary-swap OVER combine over ICI.
The mesh itself is not available here (one chip), so this script bounds
the combine honestly instead of asserting it:

1. TRAFFIC (exact, from the algorithm): per round r of log2(n), each
   chip ppermutes HALF its current region; regions halve every round,
   and a final bit-reversal ppermute moves the owned 1/n strip.  Bytes
   are computed from the real c5 canvas dims (fp32 — the swap requires
   it, dist/sharded.py).
2. COMPUTE (measured, real chip): the per-chip OVER merges on the
   descending region sizes, timed fetch-synced.
3. PROJECTION: combine wall time ~ max(traffic / ICI_bw, compute) +
   per-round latency; reported for v5e's ~45 GB/s/link ICI with the
   compute overlapped.

Prints one JSON object.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_shards=8):
    import jax
    import jax.numpy as jnp
    from volq.scene.config import PRESETS
    from volq.render.kernel import _canvas_dims
    from volq.dist.sharded import _over, _cdiv
    from volq.engine.loop import _sync

    cfg = PRESETS["c5"]()
    r = cfg.render
    # the sharded path composites the fused-path canvas (fp32 for the
    # swap); per-chip canvas = full frame height
    WH, WW, Hc, Wc = _canvas_dims(cfg, r.height, fused=r.warp_fused)
    Hp = _cdiv(Hc, n_shards) * n_shards
    itemsize = 4               # fp32 canvas (swap requirement)
    canvas_bytes = 4 * Hp * Wc * itemsize
    rounds = n_shards.bit_length() - 1

    # 1. traffic per chip: half the current region per round (regions
    # halve), plus the closing bit-reversal ppermute of the owned strip
    sent = 0
    region = canvas_bytes
    per_round = []
    for _ in range(rounds):
        sent += region // 2
        per_round.append(region // 2)
        region //= 2
    bitrev = region            # the owned 1/n strip moves once more
    sent += bitrev

    # 2. measured per-chip combine compute: OVER on descending regions
    rows = Hp
    merges = []
    for _ in range(rounds):
        rows //= 2
        merges.append(rows)

    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (4, Hp, Wc), jnp.float32)
    bbuf = jax.random.uniform(key, (4, Hp, Wc), jnp.float32)

    @jax.jit
    def combine(a, bbuf):
        outs = []
        for rws in merges:
            outs.append(_over(a[:, :rws], bbuf[:, :rws]))
        return outs

    outs = combine(a, bbuf)
    _sync(outs[0])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        outs = combine(a, bbuf)
    _sync(outs[0])
    compute_ms = (time.perf_counter() - t0) / reps * 1e3

    ici_gbps = 45.0            # v5e per-link ICI, one direction
    traffic_ms = sent / (ici_gbps * 1e9) * 1e3
    # per-round latency: a ppermute dispatch + fence each round
    latency_ms = 0.05 * (rounds + 1)
    combine_ms = max(traffic_ms, compute_ms) + latency_ms

    print(json.dumps({
        "n_shards": n_shards,
        "canvas": [4, Hp, Wc], "canvas_MB": round(canvas_bytes / 2**20, 1),
        "rounds": rounds,
        "sent_per_chip_MB": round(sent / 2**20, 1),
        "sent_per_chip_canvases": round(sent / canvas_bytes, 3),
        "per_round_MB": [round(x / 2**20, 1) for x in per_round],
        "bitrev_MB": round(bitrev / 2**20, 1),
        "combine_compute_ms_measured": round(compute_ms, 2),
        "ici_assumed_GBps": ici_gbps,
        "traffic_ms_at_ici": round(traffic_ms, 2),
        "projected_combine_ms": round(combine_ms, 2),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]) or None) if sys.argv[1:] \
        else main()
