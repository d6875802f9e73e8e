"""numpy <-> jax array interop decorator (parity with
core/bbox/array_converter.py:6-321, whose job is letting geometry helpers
accept torch tensors, numpy arrays, or lists transparently).

`array_converter` wraps a jnp-based function so that callers may pass
numpy arrays / lists / scalars; designated arguments are converted to
jnp arrays up front and outputs are converted back to the type of the
template argument (numpy in -> numpy out)."""

import functools

import jax.numpy as jnp
import numpy as np


def array_converter(apply_to=(), template_arg_name_=None):
    def deco(fn):
        import inspect

        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            template_name = template_arg_name_ or (
                apply_to[0] if apply_to else None
            )
            template = (
                bound.arguments.get(template_name)
                if template_name
                else None
            )
            to_numpy = isinstance(template, (np.ndarray, list, tuple))
            for name in apply_to:
                if name in bound.arguments and bound.arguments[name] is not None:
                    bound.arguments[name] = jnp.asarray(
                        bound.arguments[name]
                    )
            out = fn(*bound.args, **bound.kwargs)
            if not to_numpy:
                return out
            if isinstance(out, tuple):
                return tuple(
                    np.asarray(o) if isinstance(o, jnp.ndarray) else o
                    for o in out
                )
            return np.asarray(out) if isinstance(out, jnp.ndarray) else out

        return wrapper

    return deco
