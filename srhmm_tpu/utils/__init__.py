from .logging import NULL_LOG, EventLog
from .profiling import Throughput, timed, trace

__all__ = ["NULL_LOG", "EventLog", "Throughput", "timed", "trace"]


def ensure_usable_backend():
    """Fall back to CPU when the TPU backend is unavailable (e.g. the chip's
    session is held by another process).  The environment's TPU plugin
    force-sets jax_platforms="axon,cpu" but leaves 'axon' unregistered when
    its claim fails, which would otherwise break even CPU-only work."""
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
