"""Worker-shipping helper: force a module-level kernel to serialize BY
VALUE.

The grading driver imports `__spark_entry__` from its own process with the
repo on `sys.path` — but Spark's Python WORKERS inherit neither the
driver's `sys.path` nor (necessarily) its cwd, so this package is not
importable worker-side. cloudpickle serializes closures and lambdas by
value, but a plain module-level function pickles as a REFERENCE
(module + qualname) and the worker import then fails with
ModuleNotFoundError. Every Arrow-stage kernel in this package is therefore
either defined inside its operator's closure (the multimodal codec
pattern) or — when the kernel must stay module-level so property tests can
import the exact shipped code — wrapped with `ship_by_value` at the point
it is captured.

`ship_by_value` rebinds the function's code object into a fresh function
whose globals carry only the names the code actually references. The copy
is not the module attribute, so cloudpickle's module/qualname lookup fails
and it falls back to by-value code serialization; the original stays
importable for tests. Constraint (asserted): the kernel must be
self-contained — builtins plus imports done INSIDE the body — because any
captured module-global function would itself pickle by reference and
reintroduce the worker import.
"""

from __future__ import annotations

import types
from collections.abc import Callable

_ALLOWED_GLOBAL_TYPES = (int, float, str, bytes, bool, tuple, frozenset, type(None))


def _global_loads(code) -> set[str]:
    """Names the code object (and nested code objects) actually loads as
    GLOBALS — from LOAD_GLOBAL instructions, not co_names: co_names also
    carries ATTRIBUTE names, so a kernel calling ``pd.DataFrame(...)``
    would otherwise false-positive on a module-level ``DataFrame`` type
    import (found live wiring the r10 SemDeDup cell kernels)."""
    import dis

    names = {
        i.argval for i in dis.get_instructions(code) if i.opname == "LOAD_GLOBAL"
    }
    for const in code.co_consts:
        if hasattr(const, "co_code"):
            names |= _global_loads(const)
    return names


def ship_by_value(fn: Callable) -> Callable:
    """Return a copy of `fn` that cloudpickle serializes by value."""
    code = fn.__code__
    globs: dict = {"__builtins__": __builtins__}
    for name in _global_loads(code):
        if name in fn.__globals__:
            val = fn.__globals__[name]
            if not isinstance(val, _ALLOWED_GLOBAL_TYPES):
                raise TypeError(
                    f"ship_by_value({fn.__name__}): global {name!r} is a "
                    f"{type(val).__name__}; kernels must be self-contained "
                    "(import inside the body) so workers never import this "
                    "package"
                )
            globs[name] = val
    out = types.FunctionType(code, globs, fn.__name__, fn.__defaults__, fn.__closure__)
    out.__kwdefaults__ = fn.__kwdefaults__
    out.__doc__ = fn.__doc__
    return out
