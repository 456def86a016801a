"""Async inference helpers.

reference: ``mmdet/utils/contextmanagers.py:16-90`` (``completed`` /
``concurrent`` asyncio context managers around CUDA streams/events).
On TPU the stream machinery has no analog — jax dispatch is already
asynchronous — so these helpers keep the API surface (bounded in-flight
concurrency + awaitable completion) with a semaphore.
"""

from __future__ import annotations

import asyncio
import contextlib


@contextlib.asynccontextmanager
async def concurrent(limiter):
    """Bound in-flight async inference (reference ``concurrent``,
    ``contextmanagers.py:59-90``).  ``limiter``: an
    ``asyncio.Semaphore`` (the reference uses a CUDA-stream queue)."""
    await limiter.acquire()
    try:
        yield
    finally:
        limiter.release()


@contextlib.asynccontextmanager
async def completed(trace_name="", name="", **kwargs):
    """API-parity analog of the reference ``completed`` CM
    (``contextmanagers.py:16-57``): on CUDA it records events and awaits
    stream completion; jax arrays are awaited by ``block_until_ready`` at
    fetch time, so this reduces to a checkpoint that yields control to
    the event loop once."""
    try:
        yield
    finally:
        await asyncio.sleep(0)
