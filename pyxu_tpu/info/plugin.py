"""Entry-point plugin discovery — the FAIR-ecosystem mechanism.

The reference framework's plugin ecosystem ("Pyxu FAIR",
reference: doc/fair/index.rst:219 and doc/fair/howto.rst) lets third-party
wheels contribute operators/solvers/stop-criteria to the main namespaces
via Python entry points.  Same convention here, with these groups:

    ``pyxu_tpu.operator``   -> injected into :mod:`pyxu_tpu.operator`
    ``pyxu_tpu.opt.solver`` -> injected into :mod:`pyxu_tpu.opt.solver`
    ``pyxu_tpu.opt.stop``   -> injected into :mod:`pyxu_tpu.opt.stop`
    ``pyxu_tpu.math``       -> injected into :mod:`pyxu_tpu.math`

A plugin wheel declares, e.g. in its ``pyproject.toml``::

    [project.entry-points."pyxu_tpu.operator"]
    MyRadon = "my_pkg.ops:MyRadon"

Names prefixed with ``_`` *override* an existing symbol of the same
(unprefixed) name — the FAIR convention for replacing a core implementation
with a specialized one; overriding without the prefix is refused with a
warning so a plugin cannot silently shadow core API.
"""

from __future__ import annotations

import importlib
import importlib.metadata
import warnings as _w

from pyxu_tpu.info.warnings import BackendWarning

__all__ = ["discover_plugins", "load_plugins", "PLUGIN_GROUPS"]

PLUGIN_GROUPS = (
    "pyxu_tpu.operator",
    "pyxu_tpu.opt.solver",
    "pyxu_tpu.opt.stop",
    "pyxu_tpu.math",
)


def discover_plugins(group: str = None) -> dict:
    """Map ``group -> {name: entry_point}`` for installed plugin wheels
    (nothing is imported yet)."""
    groups = PLUGIN_GROUPS if group is None else (group,)
    eps = importlib.metadata.entry_points()  # scan metadata once
    found = {}
    for g in groups:
        try:  # py3.10+: selectable entry points
            sel = eps.select(group=g)
        except AttributeError:  # pragma: no cover - py3.9 dict API
            sel = eps.get(g, [])
        found[g] = {ep.name: ep for ep in sel}
    return found


def load_plugins(group: str = None) -> dict:
    """Import every discovered plugin and inject its symbols into the target
    module.  Returns ``{qualified_name: object}`` of everything loaded.
    Load failures warn (BackendWarning) instead of raising, so one broken
    plugin cannot take down the framework import."""
    loaded = {}
    for g, eps in discover_plugins(group).items():
        if not eps:
            continue
        mod = importlib.import_module(g)
        for name, ep in eps.items():
            try:
                obj = ep.load()
            except Exception as e:  # noqa: BLE001 - isolation by design
                _w.warn(f"plugin {g}:{name} failed to load: {e!r}",
                        BackendWarning, stacklevel=2)
                continue
            target = name
            if name.startswith("_"):
                target = name[1:]  # explicit-override convention
            elif hasattr(mod, name):
                _w.warn(
                    f"plugin {g}:{name} shadows an existing symbol; "
                    f"rename it or use the '_' override prefix — skipped",
                    BackendWarning, stacklevel=2)
                continue
            setattr(mod, target, obj)
            loaded[f"{g}.{target}"] = obj
    return loaded
