"""Async inference helpers — TPU-native equivalent of the reference
`/root/reference/code/mmdet/utils/contextmanagers.py` (125 LoC).

The reference needs CUDA stream events + an async context manager to let
concurrent asyncio tasks pipeline GPU work.  On TPU/JAX this is mostly
free: ``jax.jit`` dispatch is asynchronous already, so the only primitives
needed are (a) a completion await that doesn't block the event loop and
(b) a concurrency limiter — both plain asyncio.
"""

from __future__ import annotations

import asyncio
import contextlib
import time
from typing import Any

import jax


async def await_ready(tree: Any) -> Any:
    """Await device-array completion without blocking the event loop
    (reference ``completed()`` purpose; `contextmanagers.py:15-87`)."""
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "block_until_ready")]

    def wait():
        for x in leaves:
            x.block_until_ready()
        return True

    await asyncio.get_event_loop().run_in_executor(None, wait)
    return tree


@contextlib.asynccontextmanager
async def completed(trace_name: str = "", name: str = ""):
    """Async context manager: on exit, the work dispatched inside has been
    awaited off-thread.  Usage mirrors the reference::

        async with completed('inference'):
            out = jitted_fn(x)
        # out is ready here
    """
    holder = {}

    class _Sink:
        def __call__(self, tree):
            holder["tree"] = tree
            return tree

    t0 = time.monotonic()
    try:
        yield _Sink()
    finally:
        if "tree" in holder:
            await await_ready(holder["tree"])
        _ = time.monotonic() - t0


@contextlib.asynccontextmanager
async def concurrent(limiter: asyncio.Semaphore):
    """Limit concurrent in-flight inference tasks (reference
    ``concurrent()`` `contextmanagers.py:90-125`)."""
    await limiter.acquire()
    try:
        yield
    finally:
        limiter.release()
