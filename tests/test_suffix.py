"""Suffix array / PLCP / match finder unit tests against brute-force
oracles on small inputs."""

import numpy as np
import pytest

from zultra_tpu.constants import MAX_MATCH_SIZE, MAX_OFFSET, MIN_MATCH_SIZE
from zultra_tpu.matchfinder import MatchFinder, find_all_matches
from zultra_tpu.suffix import plcp_numpy, suffix_array_numpy, suffix_array_ref


def naive_plcp(data: bytes, sa: np.ndarray) -> np.ndarray:
    n = len(data)
    plcp = np.zeros(n, dtype=np.int32)
    for r in range(1, n):
        i, j = int(sa[r]), int(sa[r - 1])
        l = 0
        while i + l < n and j + l < n and data[i + l] == data[j + l]:
            l += 1
        plcp[i] = l
    return plcp


@pytest.mark.parametrize("seed", range(12))
def test_suffix_array_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 400))
    alphabet = int(rng.choice([2, 4, 256]))
    data = bytes(rng.randint(0, alphabet, n, dtype=np.uint8))
    arr = np.frombuffer(data, dtype=np.uint8)
    assert np.array_equal(suffix_array_numpy(arr), suffix_array_ref(data))


@pytest.mark.parametrize("seed", range(8))
def test_plcp_matches_oracle(seed):
    rng = np.random.RandomState(100 + seed)
    n = int(rng.randint(2, 500))
    data = bytes(rng.randint(0, 4, n, dtype=np.uint8))
    arr = np.frombuffer(data, dtype=np.uint8)
    sa = suffix_array_numpy(arr)
    assert np.array_equal(plcp_numpy(arr, sa), naive_plcp(data, sa))


def brute_force_best_matches(data: bytes, pos: int):
    """All (length, nearest offset) pairs: for each achievable length ≥ 3
    (clamped to MAX_MATCH_SIZE), the closest previous occurrence."""
    best = {}
    for prev in range(max(0, pos - MAX_OFFSET), pos):
        l = 0
        while pos + l < len(data) and data[prev + l] == data[pos + l] and l < MAX_MATCH_SIZE:
            l += 1
        if l >= MIN_MATCH_SIZE:
            if l not in best or (pos - prev) < best[l]:
                best[l] = pos - prev
    return best


@pytest.mark.parametrize("seed", range(6))
def test_match_finder_reports_valid_nearest_matches(seed):
    """Every reported match must reference genuinely matching bytes; the
    longest reported match must equal the true maximum achievable length;
    lengths must be strictly decreasing."""
    rng = np.random.RandomState(200 + seed)
    n = 600
    data = bytes(rng.randint(0, 5, n, dtype=np.uint8))
    arr = np.frombuffer(data, dtype=np.uint8)
    table = find_all_matches(arr, 0, n)

    for pos in range(1, n):
        reported = [(int(l), int(o)) for l, o in table[pos] if l >= MIN_MATCH_SIZE]
        truth = brute_force_best_matches(data, pos)
        max_true = max(truth) if truth else 0
        clamp = n - pos
        if reported:
            lengths = [l for l, _ in reported]
            assert lengths == sorted(lengths, reverse=True)
            # Longest reported match is the true best (clamped to window end)
            assert lengths[0] == min(max_true, clamp)
        for l, o in reported:
            assert data[pos - o : pos - o + l] == data[pos : pos + l]


def test_skip_then_find_consistency():
    """Skipping history positions then finding matches must behave the
    same as the reference: matches may reach into the skipped prefix."""
    rng = np.random.RandomState(42)
    body = bytes(rng.randint(0, 8, 256, dtype=np.uint8))
    data = body + body  # second half matches into first half
    arr = np.frombuffer(data, dtype=np.uint8)
    table = find_all_matches(arr, 256, 512)
    l, o = int(table[256, 0, 0]), int(table[256, 0, 1])
    assert o == 256 and l == 256  # full-history match (clamped to window end)


def test_walk_equals_nearest_occurrence_staircase():
    """The lazy interval walk's match list equals a closed form: scanning
    previous positions from nearest to farthest, report each position
    whose lcp strictly exceeds every nearer position's lcp (longest
    first, capped at 8). This is the correctness basis for the planned
    data-parallel (PSV/NSV + RMQ) matchfinder — see docs/STATUS.md."""
    import numpy as np

    rng = np.random.RandomState(123)
    for _ in range(15):
        n = int(rng.randint(30, 250))
        data = rng.randint(0, int(rng.choice([2, 4, 8])), n).astype(np.uint8)
        table = find_all_matches(data, 0, n)
        raw = bytes(data)
        for i in range(n):
            cands = []
            for j in range(i):
                l = 0
                while i + l < n and raw[j + l] == raw[i + l] and l < MAX_MATCH_SIZE:
                    l += 1
                if l >= MIN_MATCH_SIZE:
                    cands.append((l, j))
            cands.sort(key=lambda t: -t[1])  # nearest first
            best = 0
            rows = []
            for l, j in cands:
                l = min(l, n - i)
                if l > best and l >= MIN_MATCH_SIZE:
                    rows.append((l, i - j))
                    best = l
            rows.reverse()
            walk = [(int(l), int(o)) for l, o in table[i] if l >= MIN_MATCH_SIZE]
            assert walk == rows[:8], (i, walk, rows[:8])


def test_interval_centric_construction_equals_walk():
    """Round-2 device-matchfinder design validation: enumerating every
    (position, ancestor-interval) membership, taking within-interval
    predecessors from ONE sort by (interval, pos), and deduping each
    position's chain reproduces the lazy walk's match table exactly.
    Every step is a device-wide sort/scan/gather — no sequential state."""
    from zultra_tpu.constants import LCP_SHIFT, MAX_OFFSET, POS_MASK
    from zultra_tpu.matchfinder import build_intervals

    rng = np.random.RandomState(3)
    for _ in range(10):
        n = int(rng.randint(30, 300))
        data = rng.randint(0, int(rng.choice([2, 4, 16])), n).astype(np.uint8)

        intervals, pos_data = build_intervals(data)
        interval_lcp = {}
        chains = []
        memberships = []
        for p in range(n):
            ref = int(pos_data[p])
            chain = []
            while True:
                idx = ref & POS_MASK
                lcp = ref >> LCP_SHIFT
                if lcp == 0:
                    break
                chain.append(idx)
                interval_lcp[idx] = lcp
                memberships.append((idx, p))
                ref = int(intervals[idx])
            chains.append(chain)

        memberships.sort()
        pred = {}
        for k, (idx, p) in enumerate(memberships):
            if k > 0 and memberships[k - 1][0] == idx:
                pred[(idx, p)] = memberships[k - 1][1]

        table = np.zeros((n, 8, 2), dtype=np.int32)
        for p in range(n):
            out = []
            last_pred = None
            for idx in chains[p]:
                j = pred.get((idx, p))
                if j is None or (last_pred is not None and j <= last_pred):
                    continue
                offset = p - j
                if offset <= MAX_OFFSET and len(out) < 8:
                    out.append((min(interval_lcp[idx], n - p), offset))
                last_pred = j
            for m, (l, o) in enumerate(out):
                if l >= MIN_MATCH_SIZE:
                    table[p, m] = (l, o)

        assert np.array_equal(table, find_all_matches(data.copy(), 0, n))
