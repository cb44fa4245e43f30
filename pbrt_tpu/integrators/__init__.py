"""Integrators — the "model zoo" of the renderer (SURVEY.md §2.5).

Each integrator is a pure function from (scene, rays, sample fn) to radiance,
compiled as one wavefront program under jit: recursion becomes a
``lax.fori_loop`` over bounces with active masks; pbrt's per-tile
ParallelFor2D becomes sharding of the ray batch (pbrt_tpu/parallel).
"""

from pbrt_tpu.integrators.render import render, render_image  # noqa: F401
