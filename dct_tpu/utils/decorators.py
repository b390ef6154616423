"""Runtime type / one-hot check decorators
(rebuild of ref:generalframework/utils/decorators.py:8-52).

Debug-mode guards for host-side code paths; they no-op on traced values so
decorated functions stay jit-safe.
"""
from __future__ import annotations

import functools
import inspect
import typing
from typing import Sequence

import jax
import numpy as np

from .general import one_hot


def _is_traced(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def accepts(func):
    """Check call arguments against the function's type annotations
    (ref:decorators.py:8-33). Annotation containers (List[int] etc.) check the
    origin type only."""
    sig = inspect.signature(func)
    hints = typing.get_type_hints(func)

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        for name, value in bound.arguments.items():
            if name not in hints or _is_traced(value):
                continue
            expected = hints[name]
            origin = typing.get_origin(expected) or expected
            if origin is typing.Union:
                options = tuple(typing.get_origin(t) or t
                                for t in typing.get_args(expected)
                                if t is not type(None))
                ok = value is None or isinstance(value, options)
            else:
                try:
                    ok = isinstance(value, origin)
                except TypeError:
                    ok = True
            assert ok, (f"{func.__name__}: argument {name!r} expected "
                        f"{expected}, got {type(value)}")
        return func(*args, **kwargs)

    return wrapper


def onehot(*arg_names: Sequence[str]):
    """Assert the named array arguments are one-hot along the class (last)
    axis (ref:decorators.py:36-52)."""
    def deco(func):
        sig = inspect.signature(func)

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            for name in arg_names:
                value = bound.arguments.get(name)
                if value is None or _is_traced(value):
                    continue
                assert one_hot(np.asarray(value)), \
                    f"{func.__name__}: argument {name!r} is not one-hot"
            return func(*args, **kwargs)

        return wrapper
    return deco
