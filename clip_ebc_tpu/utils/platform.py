"""Target-platform resolution for platform-keyed lowering decisions.

Several hot-path choices (Pallas fused attention vs XLA sdpa, fused eval
head, in-kernel interpret mode) are keyed on "are we on TPU?". At runtime
``jax.default_backend()`` answers that — but during ahead-of-time export
(clip_ebc_tpu.export, ``platforms=("tpu",)``) the RUNTIME backend is the
build host (often CPU) while the LOWERING target is TPU, and the gates
must follow the target or the serving artifact ships the slow paths (or
worse, interpret-mode Pallas). ``target_platform_override`` pins the
answer for the duration of a trace; the export helpers use it
automatically for single-platform exports.
"""

from __future__ import annotations

import contextlib
import threading

_tls = threading.local()


def target_platform() -> str:
    """The platform that platform-keyed lowering decisions should assume:
    the active override if one is set, else the runtime backend."""
    override = getattr(_tls, "override", None)
    if override is not None:
        return override
    import jax

    return jax.default_backend()


@contextlib.contextmanager
def target_platform_override(platform: str):
    """Pin :func:`target_platform` to ``platform`` within the block.

    Thread-local (jit tracing happens on the calling thread), reentrant.
    """
    prev = getattr(_tls, "override", None)
    _tls.override = platform
    try:
        yield
    finally:
        _tls.override = prev
