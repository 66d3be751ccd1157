"""Target-platform resolution shared by backend-dispatching code.

jax.default_backend() answers "what platform is this process running on",
which is wrong when a CPU host AOT-exports a TPU artifact (aot.py): an
'auto' dispatch would bake the CPU path (and Pallas interpret mode) into
the TPU module. aot.export_* wraps tracing in override_target_platform so
dispatchers (solver.qp factorizers, rbda._derivs_batch) resolve for the
ARTIFACT's platform."""

import contextlib

import jax

_TARGET_PLATFORM = [None]


def target_platform():
    return _TARGET_PLATFORM[0] or jax.default_backend()


@contextlib.contextmanager
def override_target_platform(platform):
    """Trace-for-`platform` context used by cross-platform jax.export."""
    prev = _TARGET_PLATFORM[0]
    _TARGET_PLATFORM[0] = platform
    try:
        yield
    finally:
        _TARGET_PLATFORM[0] = prev
