"""Backend identification without forcing backend initialization.

Static spec builders (make_ff_spec / make_col_spec) pick a weight dtype by
backend.  Calling ``jax.default_backend()`` there initializes the platform
stack — in the axon environment that binds the TPU tunnel plugin even for
pure host-side config work, before a caller gets the chance to force CPU
(CLAUDE.md gotcha).  When ``jax_platforms`` is pinned (the axon
sitecustomize pins ``axon,cpu``; the test conftest pins ``cpu``), its first
entry already decides the answer, so the live query is only needed in an
unpinned environment (where initialization is harmless and inevitable).
"""

from __future__ import annotations


def probable_backend() -> str:
    """The platform jit will execute on, resolved WITHOUT initializing the
    backend when ``jax_platforms`` is pinned.  TPU plugin platforms (axon)
    report as "tpu"."""
    import jax

    plats = jax.config.jax_platforms
    if plats:
        first = plats.split(",")[0].strip().lower()
        return "tpu" if first in ("axon", "tpu") else first
    return jax.default_backend()
