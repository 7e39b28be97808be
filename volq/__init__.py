"""volq — a TPU-native volumetric particle engine.

A from-scratch JAX/XLA rebuild of the capabilities of the Unity demo
rajabala/Volumetric-Particles-For-Unity (see SURVEY.md): a particle system
(emission, explicit-Euler advection under gravity/drag/curl forces,
age-and-fade lifecycle) fused into a single XLA step over structure-of-arrays
state, and a raymarched volumetric renderer (per-pixel ray-AABB slab tests,
fixed-step front-to-back integration with trilinear sampling of procedural
3D density volumes, directional light-march self-shadowing, depth-sorted
alpha compositing) expressed as a tile-binned, gather-based XLA program.

The rendering semantics of record live in ``volq.oracle.raymarch_cpu`` (a
readable numpy implementation); every device frame must match it to 1e-3
per pixel (BASELINE.json:5).

Layout (SURVEY.md section 7):
    core/    pytrees, camera ray generation, slab tests, trilinear sampling
    volume/  hash-gradient 3D/4D noise, fBm, density-volume baking
    oracle/  the CPU reference renderer (the spec)
    sim/     fused particle simulation step
    render/  tile binning + the device raymarch renderer
    scene/   scene state + config system + the five BASELINE presets
    dist/    device-mesh sharding of the frame over ray tiles
    engine/  frame loop, IO, checkpointing, stats
"""

__version__ = "0.1.0"
