"""Binary-swap combine cost model for config 5 (VERDICT round-2 item 4).

The 8-chip c5 frame = per-chip depth-slice render (measured on the real
chip: bench/suite.py c5shard) + the binary-swap OVER combine over ICI.
The mesh itself is not available here (one chip), so this script bounds
the combine honestly instead of asserting it:

1. TRAFFIC (exact): per round r of log2(n), each chip ppermutes HALF
   its current region; regions halve every round, and a final
   bit-reversal ppermute moves the owned 1/n strip — exactly ONE
   canvas per chip per frame in total.  Since round 3 the sharded path
   crops the rect padding BEFORE the swap (dist/sharded.py), so the
   canvas on the wire is the bare [4, H, W] fp32 frame (132.7 MB at
   c5's 4K vs 177.4 padded — a 25% traffic cut).  Under VOLQ_CPU=1
   this is not computed but MEASURED: the script traces the real
   _binary_swap on an 8-virtual-device mesh and reads every ppermute
   operand aval out of the jaxpr, then asserts it against the closed
   form.
2. COMPUTE (measured, real chip): the per-chip OVER merges on the
   descending region sizes, timed fetch-synced.
3. PROJECTION: combine wall time ~ max(traffic / ICI_bw, compute) +
   per-round latency; reported for v5e's ~45 GB/s/link ICI with the
   compute overlapped.

Prints one JSON object.

VOLQ_CPU=1 forces the CPU backend (sitecustomize pins JAX_PLATFORMS to
axon before main() runs, so the env var alone is too late); pair it
with XLA_FLAGS=--xla_force_host_platform_device_count=8 to run the
jaxpr traffic audit; compute timing is skipped in that mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VOLQ_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def audited_ppermute_bytes(canvas_shape, n_shards, bf16_wire=False):
    """Trace dist/sharded._binary_swap on a virtual mesh and read the
    per-chip ppermute operand bytes per round out of the jaxpr (shape
    AND dtype come from the traced operand, so a bf16 wire is audited
    as the 2-byte payload it actually ships)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from volq.dist.mesh import AXIS
    from volq.dist.sharded import _binary_swap

    devs = jax.devices()
    assert len(devs) >= n_shards, (
        f"need {n_shards} devices (VOLQ_CPU=1 "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n_shards})")
    mesh = Mesh(np.asarray(devs[:n_shards]), (AXIS,))

    def body(canvas):
        idx = jax.lax.axis_index(AXIS)
        return _binary_swap(canvas, idx, n_shards, bf16_wire=bf16_wire)

    f = jax.shard_map(body, mesh=mesh, in_specs=P(), out_specs=P(AXIS),
                      check_vma=False)
    jaxpr = jax.make_jaxpr(f)(
        jax.ShapeDtypeStruct(canvas_shape, jnp.float32))
    rounds = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "ppermute":
                av = eqn.invars[0].aval
                rounds.append(int(np.prod(av.shape)) * av.dtype.itemsize)
            for sub in eqn.params.values():
                if hasattr(sub, "eqns"):            # raw Jaxpr
                    walk(sub)
                elif hasattr(sub, "jaxpr"):         # ClosedJaxpr
                    walk(sub.jaxpr)

    walk(jaxpr.jaxpr)
    return rounds


def main(n_shards=8):
    import jax
    import jax.numpy as jnp
    from volq.scene.config import PRESETS
    from volq.dist.sharded import _over, _cdiv
    from volq.engine.loop import _sync

    cfg = PRESETS["c5"]()
    for part in sys.argv[1:]:          # e.g. coarse+ilv variant
        if part.startswith("--") or part.isdigit():
            continue
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "psnr_c3", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "psnr_c3.py"))
        pm = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pm)
        cfg = pm.variant_cfg(cfg, part)
    r = cfg.render
    # the sharded path crops to the bare frame BEFORE the swap
    # (dist/sharded.py canvas_geom crop) — [4, hc_img, wc_img]; in
    # coarse mode that is the MARCH-CELL frame, ~(RP/RM)^2 smaller
    from volq.render.kernel import canvas_geom
    g = canvas_geom(cfg, r.height)
    Hp = _cdiv(g.hc_img, n_shards) * n_shards
    Wc = g.wc_img
    itemsize = 4               # fp32 canvas (swap requirement)
    # wire dtype: the warp_swap_bf16 flag ships ppermute payloads bf16
    wire_itemsize = 2 if r.warp_swap_bf16 else itemsize
    canvas_bytes = 4 * Hp * Wc * itemsize
    wire_canvas = 4 * Hp * Wc * wire_itemsize
    rounds = n_shards.bit_length() - 1

    # 1. traffic per chip: half the current region per round (regions
    # halve), plus the closing bit-reversal ppermute of the owned strip
    sent = 0
    region = wire_canvas
    per_round = []
    for _ in range(rounds):
        sent += region // 2
        per_round.append(region // 2)
        region //= 2
    bitrev = region            # the owned 1/n strip moves once more
    sent += bitrev

    audited = None
    if jax.default_backend() == "cpu":
        measured = audited_ppermute_bytes(
            (4, Hp, Wc), n_shards, bf16_wire=bool(r.warp_swap_bf16))
        assert measured == per_round + [bitrev], (measured, per_round)
        audited = [round(x / 2**20, 1) for x in measured]

    # 2. measured per-chip combine compute: OVER on descending regions
    compute_ms = None
    if jax.default_backend() != "cpu":
        rows, merges = Hp, []
        for _ in range(rounds):
            rows //= 2
            merges.append(rows)
        key = jax.random.PRNGKey(0)
        a = jax.random.uniform(key, (4, Hp, Wc), jnp.float32)
        bbuf = jax.random.uniform(key, (4, Hp, Wc), jnp.float32)

        @jax.jit
        def combine(a, bbuf):
            return [_over(a[:, :rws], bbuf[:, :rws]) for rws in merges]

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
    combine_ms = max(traffic_ms, compute_ms or 0.0) + latency_ms

    print(json.dumps({
        "n_shards": n_shards,
        "wire_dtype": "bf16" if wire_itemsize == 2 else "fp32",
        "canvas": [4, Hp, Wc], "canvas_MB": round(canvas_bytes / 2**20, 1),
        "rounds": rounds,
        "sent_per_chip_MB": round(sent / 2**20, 1),
        "sent_per_chip_canvases": round(sent / canvas_bytes, 3),
        "per_round_MB": [round(x / 2**20, 1) for x in per_round],
        "bitrev_MB": round(bitrev / 2**20, 1),
        "jaxpr_audited_MB": audited,
        "combine_compute_ms_measured":
            round(compute_ms, 2) if compute_ms is not None else None,
        "ici_assumed_GBps": ici_gbps,
        "traffic_ms_at_ici": round(traffic_ms, 2),
        "projected_combine_ms": round(combine_ms, 2),
    }))


if __name__ == "__main__":
    shards = [int(a) for a in sys.argv[1:] if a.isdigit()]
    main(*shards) if shards else main()
