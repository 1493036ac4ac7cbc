"""Make dpr_ray UDFs runnable on Ray workers that don't have the repo on
their sys.path (e.g. a driver that did ray.init() elsewhere and imported
this package via a path hack).

Ray ships map_batches UDFs with cloudpickle, which pickles classes from an
importable module BY REFERENCE — the worker then needs ``import dpr_ray`` to
succeed. ``ensure_shippable()`` registers every imported dpr_ray module for
by-value pickling instead, so stage classes/functions travel inside the task
spec. Idempotent; called at the top of every pipeline entry point.
"""

from __future__ import annotations

import sys

_done: set[str] = set()


def ensure_shippable() -> None:
    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray always present in this env
        return
    reg = getattr(cloudpickle, "register_pickle_by_value", None)
    if reg is None:  # pragma: no cover
        return
    for name, mod in list(sys.modules.items()):
        if mod is None or name in _done:
            continue
        if name == "dpr_ray" or name.startswith("dpr_ray."):
            try:
                reg(mod)
                _done.add(name)
            except Exception:  # pragma: no cover
                pass
