"""Framework warning taxonomy (reference: src/pyxu/info/warning.py:1-49)."""

__all__ = [
    "PyxuTpuWarning",
    "PyxuWarning",
    "AutoInferenceWarning",
    "BackendWarning",
    "DenseWarning",
    "NonTransparentWarning",
    "PerformanceWarning",
    "PrecisionWarning",
    "ShardingWarning",
]


class PyxuTpuWarning(UserWarning):
    """Base class for all framework warnings."""


# Migration alias — the reference names its root warning ``PyxuWarning``
# (reference: src/pyxu/info/warning.py:6-8).
PyxuWarning = PyxuTpuWarning


class AutoInferenceWarning(PyxuTpuWarning):
    """A quantity (adjoint/grad/Lipschitz) was auto-derived and may be loose."""


class BackendWarning(PyxuTpuWarning):
    """Requested platform/backend feature is unavailable or degraded."""


class DenseWarning(PyxuTpuWarning):
    """A structured operator is being materialized densely."""


class NonTransparentWarning(PyxuTpuWarning):
    """An operation may not be referentially transparent."""


class PerformanceWarning(PyxuTpuWarning):
    """Code path known to be slow on TPU (e.g. host sync inside a loop)."""


class PrecisionWarning(PyxuTpuWarning):
    """Dtype/precision mismatch silently coerced."""


class ShardingWarning(PyxuTpuWarning):
    """Sharding annotation dropped or resharding forced a collective."""
