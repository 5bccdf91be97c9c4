"""Native host library (C++ conversions + SPSC queue) vs numpy semantics."""

import threading

import numpy as np
import pytest

from sdrmodem_tpu.utils import native

RNG = np.random.default_rng(11)

needs_native = pytest.mark.skipif(not native.available(), reason="native lib not built")


@needs_native
def test_int16_float_roundtrip():
    x = RNG.integers(-2048, 2048, 4096).astype(np.int16)
    f = native.int16_to_float(x, 2048.0)
    np.testing.assert_allclose(f, x.astype(np.float32) / 2048.0, rtol=1e-6)
    back = native.float_to_int16(f, 2048.0)
    np.testing.assert_array_equal(back, x)


@needs_native
def test_float_to_int16_saturates():
    x = np.array([2.0, -2.0, 0.5], np.float32)
    out = native.float_to_int16(x, 32768.0)
    np.testing.assert_array_equal(out, [32767, -32768, 16384])


@needs_native
def test_float_to_int8_matches_volk_semantics():
    x = RNG.standard_normal(10000).astype(np.float32)
    got = native.float_to_int8(x, 127.0)
    want = np.round(np.clip(x * np.float32(127.0), -128, 127)).astype(np.int8)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_bytes_to_nrz():
    data = bytes([0b10110001, 0xFF, 0x00])
    out = native.bytes_to_nrz(data)
    want = np.unpackbits(np.frombuffer(data, np.uint8)).astype(np.float32) * 2 - 1
    np.testing.assert_array_equal(out, want)


@needs_native
def test_native_queue_blocking_fifo():
    q = native.NativeQueue(capacity=4, block_bytes=64, blocking=True)
    for i in range(4):
        assert q.put(np.full(8, i, np.uint8))
    got = [q.take() for _ in range(4)]
    assert [g[0] for g in got] == [0, 1, 2, 3]
    q.interrupt()
    assert q.take() is None  # poison pill


@needs_native
def test_native_queue_lossy_overwrites_newest():
    q = native.NativeQueue(capacity=2, block_bytes=16, blocking=False)
    for i in range(5):
        q.put(np.full(4, i, np.uint8))
    assert q.dropped == 3
    a, b = q.take(), q.take()
    # oldest survives; the last slot holds the newest value (queue.c:124-128)
    assert a[0] == 0 and b[0] == 4


@needs_native
def test_native_queue_threaded_producer_consumer():
    q = native.NativeQueue(capacity=8, block_bytes=4096, blocking=True)
    n = 200
    payloads = [RNG.integers(0, 255, 1024).astype(np.uint8) for _ in range(n)]

    def producer():
        for p in payloads:
            q.put(p)
        q.interrupt()

    results = []

    def consumer():
        while True:
            item = q.take()
            if item is None:
                break
            results.append(item)

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t2.start(); t1.start(); t1.join(); t2.join()
    assert len(results) == n
    for got, want in zip(results, payloads):
        np.testing.assert_array_equal(np.frombuffer(got, np.uint8), want)
