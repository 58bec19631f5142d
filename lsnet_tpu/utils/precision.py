"""Mixed-precision policy.

The reference implements fp16 with loss scaling + fp32 master weights
(`/root/reference/code/mmdet/core/fp16/decorators.py`, `fp16/hooks.py`).
On TPU the native story is simpler: bf16 has fp32-range exponents, so no
loss scaling is needed — params stay fp32, compute casts to bf16, norm
statistics stay fp32 (our norm layers already compute in fp32 internally).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32


def cast_floating(tree: Any, dtype) -> Any:
    """Cast float leaves of a pytree, leaving ints/bools untouched."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def bf16_inference_variables(variables: Any) -> Any:
    """Whole-model bf16 weights for serving (params + running stats)."""
    return cast_floating(variables, jnp.bfloat16)


def bf16_compute(fn, policy: Policy = Policy()):
    """Wrap an apply-style fn: cast inputs+params to compute dtype, outputs
    back to output dtype."""
    def wrapped(variables, *args, **kwargs):
        v = cast_floating(variables, policy.compute_dtype)
        a = cast_floating(args, policy.compute_dtype)
        out = fn(v, *a, **kwargs)
        return cast_floating(out, policy.output_dtype)
    return wrapped
