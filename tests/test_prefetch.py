"""Unit tests for the background staging thread (train/prefetch.py)."""

import threading
import time

import pytest

from k3m_tpu.train.prefetch import staged_prefetch


def test_order_and_completeness():
    out = list(staged_prefetch(range(57), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(57)]


def test_stage_runs_ahead_of_consumer():
    """The producer stages batches while the consumer is busy — the whole
    point of the thread. Consume slowly and check staging ran ahead."""
    staged = []

    def stage(x):
        staged.append(x)
        return x

    gen = staged_prefetch(range(10), stage, depth=4)
    first = next(gen)
    assert first == 0
    deadline = time.time() + 5.0
    # queue(4) + the one in-flight put: at least items 1..4 stage without
    # any further consumption
    while len(staged) < 5 and time.time() < deadline:
        time.sleep(0.01)
    assert len(staged) >= 5
    assert list(gen) == list(range(1, 10))


def test_loader_exception_surfaces_in_consumer():
    def bad_loader():
        yield 1
        raise RuntimeError("loader died")

    gen = staged_prefetch(bad_loader(), lambda x: x, depth=2)
    assert next(gen) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        list(gen)


def test_stage_exception_surfaces_in_consumer():
    def stage(x):
        if x == 3:
            raise ValueError("encode failed")
        return x

    with pytest.raises(ValueError, match="encode failed"):
        list(staged_prefetch(range(10), stage, depth=2))


def test_close_stops_producer_thread():
    """Abandoning the generator must not leave the producer blocked on a
    full queue forever (it holds staged device buffers in real use)."""
    n0 = threading.active_count()
    gen = staged_prefetch(range(1000), lambda x: x, depth=2)
    assert next(gen) == 0
    gen.close()
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= n0
