"""Count the lazy interval walk's scalar memory accesses per position on
real data — sizes the SMEM walk kernel's per-position trip budget before
building it (VERDICT r4 item 1)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from bench import build_corpus, build_mixed_corpus
from zultra_tpu.constants import (
    EXCL_VISITED_MASK, LCP_MASK, LCP_SHIFT, MAX_OFFSET, POS_MASK, VISITED_FLAG,
    NMATCHES_PER_OFFSET,
)
from zultra_tpu.matchfinder import build_intervals

C = {"r": 0, "w": 0, "asc": 0, "hop": 0, "acc": 0, "emit": 0}


def walk_counted(window, start, end):
    intervals, pos_data = build_intervals(window)
    n_rows = 0
    for pos in range(end):
        max_matches = 0 if pos < start else NMATCHES_PER_OFFSET
        ref = int(pos_data[pos]); C["r"] += 1
        pos_data[pos] = 0; C["w"] += 1
        while True:
            super_ref = int(intervals[ref & POS_MASK]); C["r"] += 1
            if not (super_ref & LCP_MASK):
                break
            intervals[ref & POS_MASK] = pos | VISITED_FLAG; C["w"] += 1
            C["asc"] += 1
            ref = super_ref
        if super_ref == 0:
            if ref != 0:
                intervals[ref & POS_MASK] = pos | VISITED_FLAG; C["w"] += 1
            continue
        match_pos = super_ref & EXCL_VISITED_MASK
        out = 0
        while True:
            while True:
                super_ref = int(pos_data[match_pos]); C["r"] += 1
                if super_ref <= ref:
                    break
                match_pos = int(intervals[super_ref & POS_MASK]) & EXCL_VISITED_MASK
                C["r"] += 1; C["hop"] += 1
            intervals[ref & POS_MASK] = pos | VISITED_FLAG; C["w"] += 1
            pos_data[match_pos] = ref; C["w"] += 1
            C["acc"] += 1
            if out < max_matches:
                if pos - match_pos <= MAX_OFFSET:
                    out += 1; C["emit"] += 1
            if super_ref == 0:
                break
            ref = super_ref
            match_pos = int(intervals[ref & POS_MASK]) & EXCL_VISITED_MASK
            C["r"] += 1
        n_rows += out
    return n_rows


def run(tag, data, start, end):
    for k in C:
        C[k] = 0
    window = np.frombuffer(data, dtype=np.uint8)[:end].copy()
    rows = walk_counted(window, start, end)
    n = end
    print(f"{tag}: n={n} reads/pos={C['r']/n:.2f} writes/pos={C['w']/n:.2f} "
          f"asc/pos={C['asc']/n:.2f} hops/pos={C['hop']/n:.2f} "
          f"accepts/pos={C['acc']/n:.2f} emit/pos={C['emit']/n:.2f} "
          f"(r+w)/pos={(C['r']+C['w'])/n:.2f}")


text = build_corpus(1 << 20)
mixed = build_mixed_corpus(1 << 20)
# A realistic segment: 32 KB halo + core, like the kernel will see.
run("text 64K", text, 0, 65536)
run("text seg (32K halo + 32K core)", text[100000:], 0, 65536)
run("mixed 64K", mixed, 0, 65536)
rng = np.random.default_rng(3)
rnd = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
run("random 64K", rnd, 0, 65536)
zz = bytes(65536)
run("zeros 64K", zz, 0, 65536)
