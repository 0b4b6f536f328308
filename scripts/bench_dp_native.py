"""Microbench: zn_optimize_matches on one real 1 MB window (min of N —
robust on this shared 2-vCPU host). Used to tune the host DP hot loop."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import build_corpus
from zultra_tpu import native
from zultra_tpu.huffman import HuffmanEncoder
from zultra_tpu.constants import NLITERALSYMS, NOFFSETSYMS

n = 1 << 20
window = np.frombuffer(build_corpus(n), np.uint8).copy()
table = native.build_match_table(window, 0)

# Greedy-pass code lengths (realistic DP input).
lit = HuffmanEncoder(NLITERALSYMS, 15)
off = HuffmanEncoder(NOFFSETSYMS, 15)
i = 0
while i < n:
    ln, of = int(table[i, 0, 0]), int(table[i, 0, 1])
    if ln >= 3:
        from zultra_tpu.constants import MATCHLEN_SYMBOL, OFFSET_SYMBOL, offset_table_index
        lit.entropy[MATCHLEN_SYMBOL[min(ln - 3, 255)]] += 1
        off.entropy[OFFSET_SYMBOL[offset_table_index(of)]] += 1
        i += ln
    else:
        lit.entropy[window[i]] += 1
        i += 1
lit.entropy[256] += 1
lit.estimate_dynamic_codelens()
off.estimate_dynamic_codelens()
ll = np.where(lit.code_length == 0, 9, lit.code_length).astype(np.int32)
ol = np.where(off.code_length == 0, 6, off.code_length).astype(np.int32)

best = native.optimize_matches(ll, ol, window, table, 0, n)
times = []
for _ in range(12):
    t0 = time.perf_counter()
    native.optimize_matches(ll, ol, window, table, 0, n)
    times.append(time.perf_counter() - t0)
times.sort()
print(f"dp 1MB: min {times[0]*1e3:.1f} ms  med {times[len(times)//2]*1e3:.1f} ms"
      f"  ({n/times[0]/1e6:.1f} MB/s)")
print("checksum:", int(best.astype(np.int64).sum()))
