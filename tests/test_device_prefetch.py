"""DevicePrefetcher: ordering, lookahead bound, error propagation, cleanup.

The prefetcher overlaps H2D with the step (trainer.py train loops); these
tests pin the contract the loops rely on — results arrive in loader order,
the feeder never runs more than ``depth`` puts ahead, and exceptions on
either side neither deadlock nor vanish.
"""

import threading
import time

import pytest

from visiondk_tpu.data.loader import DevicePrefetcher


def test_order_and_values():
    loader = [dict(i=i) for i in range(10)]
    out = list(DevicePrefetcher(loader, lambda i, b: (i, b["i"] * 2), depth=3))
    assert out == [(i, 2 * i) for i in range(10)]


def test_lookahead_is_bounded():
    depth = 2
    put_started = []
    consumed = threading.Event()

    def put(i, b):
        put_started.append(i)
        return i

    loader = list(range(20))
    it = iter(DevicePrefetcher(loader, put, depth=depth))
    first = next(it)
    assert first == 0
    # give the feeder time to run as far ahead as it can while the consumer
    # holds: the slot semaphore admits at most ``depth`` put results beyond
    # the one already consumed (a put is only STARTED once a slot is held)
    time.sleep(0.3)
    assert len(put_started) <= 1 + depth
    assert list(it) == list(range(1, 20))
    assert put_started == list(range(20))


def test_put_exception_propagates():
    def put(i, b):
        if i == 3:
            raise RuntimeError("boom in put")
        return i

    with pytest.raises(RuntimeError, match="boom in put"):
        list(DevicePrefetcher(range(10), put, depth=2))


def test_loader_exception_propagates():
    def gen():
        yield 1
        raise ValueError("loader died")

    with pytest.raises(ValueError, match="loader died"):
        list(DevicePrefetcher(gen(), lambda i, b: b, depth=2))


def test_consumer_early_exit_joins_feeder():
    """A step exception mid-epoch must not leave the feeder thread parked on
    a full queue (it would hold loader worker resources forever)."""
    n_alive_before = threading.active_count()
    pf = DevicePrefetcher(range(100), lambda i, b: b, depth=1)
    it = iter(pf)
    assert next(it) == 0
    it.close()  # GeneratorExit → finally-drain → feeder joined
    deadline = time.time() + 5
    while threading.active_count() > n_alive_before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_alive_before


def test_consumer_early_exit_stops_feeding():
    """Early exit must CANCEL remaining work, not drain it: a step exception
    at batch 2 of a long epoch must not decode+transfer the rest of the
    epoch inside exception unwind."""
    puts = []

    def put(i, b):
        puts.append(i)
        time.sleep(0.005)
        return b

    it = iter(DevicePrefetcher(range(500), put, depth=2))
    next(it)
    next(it)
    it.close()
    time.sleep(0.3)  # a draining feeder would rack up dozens more puts
    assert len(puts) <= 2 + 2 + 1  # consumed + staged + one in-flight


def test_partial_iteration_then_reuse():
    """The prefetcher is re-iterable: each __iter__ spawns a fresh feeder."""
    pf = DevicePrefetcher(range(5), lambda i, b: b, depth=2)
    assert list(pf) == list(range(5))
    assert list(pf) == list(range(5))


def test_hold_first_parks_until_release():
    produced = []
    pf = DevicePrefetcher(range(10), lambda i, b: produced.append(i) or b,
                          depth=3, hold_first=True)
    it = iter(pf)
    assert next(it) == 0
    time.sleep(0.2)
    assert produced == [0]  # feeder parked after item 0
    pf.release()
    assert list(it) == list(range(1, 10))
    assert produced == list(range(10))


def test_hold_first_early_exit_does_not_leak_thread():
    n_before = threading.active_count()
    pf = DevicePrefetcher(range(10), lambda i, b: b, depth=2, hold_first=True)
    it = iter(pf)
    assert next(it) == 0
    it.close()  # never released — the drain must unpark the feeder
    deadline = time.time() + 5
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_before
