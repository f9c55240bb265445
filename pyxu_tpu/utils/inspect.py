"""Introspection helpers (reference: src/pyxu/util/inspect.py:12-43)."""

from __future__ import annotations

import importlib
import inspect
import types

__all__ = ["parse_params", "import_module"]


def parse_params(func, *args, **kwargs) -> dict:
    """(key, value) params as seen in the body of ``func`` when called via
    ``func(*args, **kwargs)`` (reference `parse_params`,
    util/inspect.py:12-30)."""
    sig = inspect.Signature.from_callable(func)
    f_args = sig.bind(*args, **kwargs)
    f_args.apply_defaults()
    return dict(f_args.arguments)


def import_module(name: str, fail_on_error: bool = True) -> types.ModuleType:
    """Load a module dynamically; None when absent and ``fail_on_error=False``
    (reference `import_module`, util/inspect.py:32-43)."""
    try:
        return importlib.import_module(name)
    except ModuleNotFoundError:
        if fail_on_error:
            raise
        return None
