"""Prefetcher tests: stream order preserved, errors surfaced."""

import numpy as np
import pytest

from action_conditioned_gans_tpu.data.pipeline import Prefetcher


class FakeDataset:
    def __init__(self, fail_at=None):
        self.fail_at = fail_at

    def batch_at(self, i):
        if self.fail_at is not None and i >= self.fail_at:
            raise ValueError("boom")
        return {"i": np.array(i)}


def test_stream_order():
    pf = Prefetcher(FakeDataset(), depth=2)
    got = [int(pf.batch_at(k)["i"]) for k in range(5)]
    assert got == [0, 1, 2, 3, 4]


def test_error_propagates():
    pf = Prefetcher(FakeDataset(fail_at=2), depth=2)
    assert int(pf.batch_at(0)["i"]) == 0
    assert int(pf.batch_at(1)["i"]) == 1
    with pytest.raises(ValueError, match="boom"):
        pf.batch_at(2)


def test_iter_protocol():
    it = iter(Prefetcher(FakeDataset(), depth=1))
    assert int(next(it)["i"]) == 0
    assert int(next(it)["i"]) == 1
