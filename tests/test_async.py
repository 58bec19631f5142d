"""Async inference API (reference `tests/test_async.py` +
`mmdet/utils/contextmanagers.py`): concurrent single-image inference
through asyncio produces the same results as the sync path."""

import asyncio

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_await_ready_roundtrip():
    from lsnet_tpu.utils.contextmanagers import await_ready
    x = jnp.arange(8.0)

    async def main():
        return await await_ready({"a": x * 2})

    out = asyncio.run(main())
    np.testing.assert_allclose(np.asarray(out["a"]), np.arange(8.0) * 2)


def test_completed_context():
    from lsnet_tpu.utils.contextmanagers import completed

    async def main():
        async with completed("test") as sink:
            y = sink(jnp.ones((4,)) * 3)
        return y

    y = asyncio.run(main())
    np.testing.assert_allclose(np.asarray(y), 3.0)


def test_concurrent_limiter():
    from lsnet_tpu.utils.contextmanagers import concurrent
    peak = {"now": 0, "max": 0}

    async def task(sem):
        async with concurrent(sem):
            peak["now"] += 1
            peak["max"] = max(peak["max"], peak["now"])
            await asyncio.sleep(0.01)
            peak["now"] -= 1

    async def main():
        sem = asyncio.Semaphore(2)
        await asyncio.gather(*[task(sem) for _ in range(6)])

    asyncio.run(main())
    assert peak["max"] <= 2


@pytest.mark.slow
def test_async_inference_matches_sync():
    from tests.test_apis import tiny_cfg
    from lsnet_tpu.apis import (async_inference_detector, inference_detector,
                                init_detector)
    bundle = init_detector(tiny_cfg())
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
            for _ in range(3)]

    sync_outs = [inference_detector(bundle, im) for im in imgs]

    async def main():
        return await asyncio.gather(
            *[async_inference_detector(bundle, im) for im in imgs])

    async_outs = asyncio.run(main())
    for s, a in zip(sync_outs, async_outs):
        np.testing.assert_allclose(s["bboxes"], a["bboxes"], atol=1e-5)
        np.testing.assert_allclose(s["scores"], a["scores"], atol=1e-5)
