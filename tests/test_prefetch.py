"""Tests for the background batch prefetcher (data/prefetch.py)."""

import time

import numpy as np
import pytest

from difusco_tpu.data.prefetch import prefetch


class TestPrefetch:
    def test_yields_identical_stream(self):
        items = [{"a": np.full((2, 2), i)} for i in range(20)]
        out = list(prefetch(iter(items), depth=3))
        assert len(out) == 20
        for i, b in enumerate(out):
            np.testing.assert_array_equal(b["a"], items[i]["a"])

    def test_propagates_producer_exception(self):
        def gen():
            yield 1
            raise ValueError("producer boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="producer boom"):
            list(it)

    def test_overlaps_production_with_consumption(self):
        """Producer (10ms/item) and consumer (10ms/item) overlapped must run
        in well under the 2x serial time."""
        N, dt = 20, 0.01

        def slow_gen():
            for i in range(N):
                time.sleep(dt)
                yield i

        t0 = time.time()
        for _ in prefetch(slow_gen(), depth=3):
            time.sleep(dt)
        elapsed = time.time() - t0
        assert elapsed < 1.6 * N * dt, f"no overlap: {elapsed:.2f}s"

    def test_empty_iterator(self):
        assert list(prefetch(iter([]))) == []
