"""Backend dispatch helper for Pallas-TPU kernels.

Pallas TPU (pltpu) kernels lower only on TPU backends. Two platform
strings qualify: "tpu" (local chips) and "axon" (the remote-TPU tunnel
used in this environment — real TPU hardware behind an experimental JAX
platform name). Everything else (cpu tests, gpu) takes the XLA fallback
or interpret mode.

Round-3 postmortem: two call sites compared ``jax.default_backend() ==
"tpu"`` and therefore silently ran the XLA fallback / interpret mode on
the real chip — the Pallas splat-compositing kernel had never actually
compiled on hardware while the bench reported its time. Every dispatch
goes through this ONE helper now.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when Pallas TPU kernels can compile on the default backend."""
    return jax.default_backend() in ("tpu", "axon")
