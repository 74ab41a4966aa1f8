"""Deep float-dtype casting over nested containers/dataclasses.

Used to build the f32 shadow of the model/props/state for mixed-precision
Jacobian assembly (OPM_TPU_ASM_F32): every floating-point array in the
object graph is cast; ints, bools, strings, callables and python scalars
pass through untouched (python float scalars are weak-typed in jax and
follow the array dtype in mixed ops).
"""

from __future__ import annotations

import copy
import dataclasses

import jax.numpy as jnp
import numpy as np


def cast_floats(obj, dtype):
    """Recursively cast floating arrays in obj to dtype. Handles jax/numpy
    arrays, dataclasses, NamedTuples, dicts, lists, tuples. Returns new
    objects; never mutates."""
    if obj is None:
        return None
    if isinstance(obj, (jnp.ndarray, np.ndarray)):
        if jnp.issubdtype(obj.dtype, jnp.floating):
            return jnp.asarray(obj, dtype)
        return obj
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(obj, **{
            f.name: cast_floats(getattr(obj, f.name), dtype)
            for f in dataclasses.fields(obj) if f.init})
    if isinstance(obj, tuple):
        vals = [cast_floats(v, dtype) for v in obj]
        if hasattr(obj, "_fields"):          # NamedTuple
            return type(obj)(*vals)
        return tuple(vals)
    if isinstance(obj, list):
        return [cast_floats(v, dtype) for v in obj]
    if isinstance(obj, dict):
        return {k: cast_floats(v, dtype) for k, v in obj.items()}
    return obj


def shadow_model(model, dtype):
    """Shallow-clone a model object with every floating array (and nested
    dataclass/dict content) in its __dict__ cast to dtype. Methods resolve
    on the clone via the class; index arrays and python scalars are
    shared."""
    m = copy.copy(model)
    for k, v in list(vars(m).items()):
        if k == "grid":
            continue        # only .dims (ints) is read on the hot path
        setattr(m, k, cast_floats(v, dtype))
    return m
