"""Property fuzz of run_slot_scheduler with MOCK device ops (no jax).

The shared host loop is the part of continuous serving that a parity test
can't see (the device math is proven elsewhere): admission packing, slot
recycling, poll markers, completion routing. Here a pure-python ops mock
assigns every request a KNOWN caption (its key stamped into the tokens and a
chosen length), so across random pool geometries and arrival patterns we can
assert the loop never loses, duplicates, or cross-wires a request.
"""

import numpy as np

from vcr_tpu.serving_continuous import run_slot_scheduler


class MockOps:
    """Implements the scheduler's device-ops protocol in numpy: slot r decodes
    `length[key]` tokens, each token = key (so cross-wiring is detectable)."""

    def __init__(self, slots, admit_chunk, step_chunk, max_len, lengths):
        self.slots, self.admit_chunk, self.step_chunk = (slots, admit_chunk,
                                                         step_chunk)
        self.max_len = max_len
        self.lengths = lengths                      # key -> caption length
        self.stats = {"ticks": 0, "admit_chunks": 0, "served": 0,
                      "useful_steps": 0, "slot_steps": 0}
        self.in_flight = 0
        self._key = np.full((slots,), -1, np.int64)   # feats[...,0] = key
        self._steps = np.zeros((slots,), np.int32)
        self._active = np.zeros((slots,), bool)
        self._toks = np.zeros((slots, max_len), np.int32)

    def encode_admit(self, feats, ids, valid):
        for j in range(len(ids)):
            if not valid[j]:
                continue
            s = int(ids[j])
            self._key[s] = int(feats[j].flat[0])
            self._steps[s] = 0
            self._active[s] = True
            self._toks[s] = 0

    def tick(self):
        for _ in range(self.step_chunk):
            for s in range(self.slots):
                if not self._active[s]:
                    continue
                self._toks[s, self._steps[s]] = self._key[s]
                self._steps[s] += 1
                done = (self._steps[s] >= self.lengths[int(self._key[s])]
                        or self._steps[s] >= self.max_len)
                if done:
                    self._active[s] = False

    def poll_active(self):
        return self._active.copy()

    def read_tokens(self):
        return self._toks.copy(), self._steps.copy()


def test_scheduler_fuzz_never_loses_or_crosswires():
    rng = np.random.default_rng(0)
    for trial in range(25):
        slots = int(rng.integers(1, 6))
        admit = int(rng.integers(1, slots + 1))
        step_chunk = int(rng.integers(1, 4))
        max_len = int(rng.integers(2, 9))
        n_req = int(rng.integers(1, 30))
        lengths = {k: int(rng.integers(1, max_len + 2)) for k in range(n_req)}
        ops = MockOps(slots, admit, step_chunk, max_len, lengths)

        def requests():
            for k in range(n_req):
                # random poll markers model bursty arrivals
                for _ in range(int(rng.integers(0, 3))):
                    yield None
                yield k, np.full((3, 2), float(k), np.float32)

        got = dict(run_slot_scheduler(ops, requests()))
        assert sorted(got) == list(range(n_req)), (trial, sorted(got))
        for k, toks in got.items():
            want_len = min(lengths[k], max_len)
            assert len(toks) == want_len, (trial, k, toks, lengths[k])
            assert (toks == k).all(), (trial, k, toks)  # no cross-wiring
        assert ops.stats["served"] == n_req
        assert ops.stats["useful_steps"] == sum(
            min(lengths[k], max_len) for k in range(n_req))
        assert ops.in_flight == 0


class MockOpsRelease(MockOps):
    """MockOps + the optional release_slots op (in-flight cancellation)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.released = []

    def release_slots(self, ids):
        self.released.extend(int(s) for s in ids)
        for s in ids:
            self._active[int(s)] = False


def test_cancel_queued_request_dropped_before_admission():
    """A cancelled request still waiting in the host queue is dropped without
    ever touching the device (works even without release_slots)."""
    lengths = {0: 3, 1: 2}
    ops = MockOps(1, 1, 1, 4, lengths)  # one slot: key 1 must queue behind 0
    seen = []

    def poll_cancelled(outstanding):
        seen.append(set(outstanding))
        return {1} & outstanding

    def requests():
        yield 0, np.zeros((2, 2), np.float32)
        yield 1, np.full((2, 2), 1.0, np.float32)

    got = dict(run_slot_scheduler(ops, requests(),
                                  poll_cancelled=poll_cancelled))
    assert sorted(got) == [0]
    assert list(got[0]) == [0, 0, 0]
    assert ops.stats["cancelled"] == 1
    # without release_slots, key 0 is offered only while QUEUED (the first
    # sweep, pre-admission) — never again once in flight
    assert all(0 not in s for s in seen[1:])


def test_cancel_inflight_releases_slot_for_next_request():
    """Cancelling an admitted request frees its slot immediately; the next
    request reuses it and the cancelled key is never yielded."""
    lengths = {0: 10, 1: 2}
    ops = MockOpsRelease(1, 1, 2, 10, lengths)
    offers = []

    def poll_cancelled(outstanding):
        # first offer of key 0 is pre-admission (queued sweep): let it
        # through so the cancel lands while it is IN FLIGHT
        if 0 in outstanding:
            offers.append(True)
            if len(offers) == 2:
                return {0}
        return set()

    def requests():
        yield 0, np.zeros((2, 2), np.float32)
        yield 1, np.full((2, 2), 1.0, np.float32)

    got = dict(run_slot_scheduler(ops, requests(),
                                  poll_cancelled=poll_cancelled))
    assert sorted(got) == [1]
    assert list(got[1]) == [1, 1]
    assert ops.released == [0]
    assert ops.stats["cancelled"] == 1
    assert ops.stats["served"] == 1
    assert ops.in_flight == 0


def test_cancel_fuzz_subset_never_breaks_the_rest():
    """Randomly cancel a subset mid-stream: survivors are always complete and
    correct, cancelled keys never appear, counts reconcile."""
    rng = np.random.default_rng(7)
    for trial in range(15):
        slots = int(rng.integers(1, 5))
        n_req = int(rng.integers(2, 20))
        max_len = int(rng.integers(2, 8))
        lengths = {k: int(rng.integers(1, max_len + 2)) for k in range(n_req)}
        to_cancel = {k for k in range(n_req) if rng.random() < 0.3}
        ops = MockOpsRelease(slots, int(rng.integers(1, slots + 1)),
                             int(rng.integers(1, 3)), max_len, lengths)

        def poll_cancelled(outstanding, to_cancel=to_cancel):
            return to_cancel & outstanding

        def requests():
            for k in range(n_req):
                yield k, np.full((2, 2), float(k), np.float32)

        got = dict(run_slot_scheduler(ops, requests(),
                                      poll_cancelled=poll_cancelled))
        # a to-cancel key may still complete if it finishes before any sweep
        # sees it — but a yielded key must NEVER be wrong, and every
        # un-cancelled key must be served exactly once
        for k in range(n_req):
            if k not in to_cancel:
                assert k in got, (trial, k)
            if k in got:
                assert (got[k] == k).all()
                assert len(got[k]) == min(lengths[k], max_len)
        assert ops.stats["served"] == len(got)
        assert (ops.stats["served"]
                + ops.stats.get("cancelled", 0)) == n_req
        assert ops.in_flight == 0


def test_scheduler_all_poll_markers_then_requests():
    """A source that stalls (markers only) before producing must not deadlock
    or drop; results still complete."""
    lengths = {0: 2, 1: 3}
    ops = MockOps(2, 2, 1, 4, lengths)

    def requests():
        for _ in range(5):
            yield None
        yield 0, np.zeros((2, 2), np.float32)
        for _ in range(3):
            yield None
        yield 1, np.full((2, 2), 1.0, np.float32)

    got = dict(run_slot_scheduler(ops, requests()))
    assert sorted(got) == [0, 1]
    assert list(got[0]) == [0, 0] and list(got[1]) == [1, 1, 1]
