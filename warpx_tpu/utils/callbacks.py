"""User callback registry (reference: Python/pywarpx/callbacks.py).

Functions installed at named hook points run at the corresponding moments
of the evolve loop (host-side, outside jit — exactly like the reference's
Python callbacks, which execute between the C++ phases).  Supported hooks
mirror WarpXEvolve.cpp's ExecutePythonCallback sites that exist in this
framework's loop:

  beforestep, afterstep, beforeEsolve, afterEsolve, afterdiagnostics,
  onbreaksignal, oncheckpointsignal, loadbalance (reserved names accepted
  for API compatibility: particleinjection, particlescraper,
  beforedeposition, afterdeposition, beforecollisions, aftercollisions —
  these phases run inside one fused jitted step here, so their callbacks
  fire adjacent to the step boundary with a warning).

Usage (pywarpx-compatible spelling):

    from warpx_tpu.utils.callbacks import installcallback, callfromafterstep

    installcallback("afterstep", lambda: print("step done"))

    @callfromafterstep
    def my_diag():
        ...
"""

from __future__ import annotations

from typing import Callable, Dict, List

__all__ = [
    "installcallback", "uninstallcallback", "isinstalled",
    "clear_callbacks", "execute_callbacks", "callfromafterstep",
    "callfrombeforestep", "callfrombeforeEsolve", "callfromafterEsolve",
    "HOOKS",
]

HOOKS = (
    "beforestep", "afterstep", "beforeEsolve", "afterEsolve",
    "afterdiagnostics", "onbreaksignal", "oncheckpointsignal",
    "loadbalance", "particleinjection", "particlescraper",
    "beforedeposition", "afterdeposition", "beforecollisions",
    "aftercollisions", "poissonsolver",
)

_in_step_hooks = {
    "particleinjection", "particlescraper", "beforedeposition",
    "afterdeposition", "beforecollisions", "aftercollisions",
}

_registry: Dict[str, List[Callable]] = {}


def installcallback(name: str, fn: Callable) -> None:
    if name not in HOOKS:
        raise ValueError(f"unknown callback hook {name!r}; one of {HOOKS}")
    if name in _in_step_hooks:
        from .observability import warn

        warn(
            "Callbacks",
            f"hook '{name}' runs inside the fused jitted step here; the "
            "callback will fire at the adjacent step boundary", "low",
        )
    _registry.setdefault(name, []).append(fn)


def uninstallcallback(name: str, fn: Callable | None = None) -> None:
    if fn is None:
        _registry.pop(name, None)
    elif name in _registry and fn in _registry[name]:
        _registry[name].remove(fn)


def isinstalled(name: str, fn: Callable | None = None) -> bool:
    if fn is None:
        return bool(_registry.get(name))
    return fn in _registry.get(name, [])


def clear_callbacks() -> None:
    _registry.clear()


def execute_callbacks(name: str, *args, **kwargs) -> None:
    for fn in _registry.get(name, []):
        fn(*args, **kwargs)


def _make_decorator(hook):
    def deco(fn):
        installcallback(hook, fn)
        return fn
    deco.__name__ = f"callfrom{hook}"
    return deco


callfromafterstep = _make_decorator("afterstep")
callfrombeforestep = _make_decorator("beforestep")
callfrombeforeEsolve = _make_decorator("beforeEsolve")
callfromafterEsolve = _make_decorator("afterEsolve")
