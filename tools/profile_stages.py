"""Per-stage warm throughput profile of the production pipeline.

Measures, on the bench corpus (.bench_cache), warm rates for:
  dev_seed     device batched seeding           (reads/s, whole chip)
  dev_extend   device _filterHits+path_dst_2    (reads/s, whole chip)
  host_full    native engine full map_read      (reads/s, ONE core)
  host_hits    native apx_hits (given seeds)    (reads/s, ONE core)
  host_finish  native apx_finish (given cords)  (reads/s, ONE core)

Usage: python tools/profile_stages.py [n_reads] [--json]
"""
import json
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from linear_tpu.map.mapper import Mapper, MapperConfig
from linear_tpu.utils import seqio

N = 256
for a in sys.argv[1:]:
    if a.isdigit():
        N = int(a)
AS_JSON = "--json" in sys.argv

g_fa = ".bench_cache/bench_g.fa"
r_fa = ".bench_cache/bench_r1024.fa"

t0 = time.time()
mapper = Mapper([g_fa], MapperConfig(), device="tpu")
mapper.prepare()
ne = mapper.native_engine()
t_prep = time.time() - t0

block = next(seqio.read_blocks(r_fa))
sub = seqio.SeqSet(ids=block.ids[:N], seqs=block.seqs[:N])

out = {"n_reads": N, "prep_s": round(t_prep, 2)}


def rate(f, warm=1, reps=2):
    for _ in range(warm):
        f()
    t0 = time.time()
    for _ in range(reps):
        f()
    return N * reps / (time.time() - t0)


# --- device seeding (includes h2d of packed reads + d2h of anchors)
out["dev_seed_reads_per_s"] = round(rate(lambda: mapper._device_seed_block(sub)), 1)
seeds = mapper._device_seed_block(sub)

# --- host apx_hits from device seeds (one core)
def hits_pass():
    return [ne.apx_hits(r, seeds=np.asarray(s, dtype=np.uint64)
                        if s is not None else None)
            for r, s in zip(sub.seqs, seeds)]


out["host_hits_reads_per_s"] = round(rate(hits_pass), 1)
hits_list = hits_pass()

# --- device extension
out["dev_extend_reads_per_s"] = round(
    rate(lambda: mapper._device_extend_block(sub, hits_list)), 1)
dev_cords = mapper._device_extend_block(sub, hits_list)
out["dev_extend_coverage"] = round(
    sum(c is not None for c in dev_cords) / N, 3)

# --- host finish (apx tail + gap + output) from device cords
def finish_pass():
    ne.reset()
    k = 0
    for r, rid, dc, s in zip(sub.seqs, sub.ids, dev_cords, seeds):
        res = ne.apx_finish(r, rid, dc, tid=0) if dc is not None else None
        if res is None:
            ne.map_read(r, rid, seeds=np.asarray(s, dtype=np.uint64)
                        if s is not None else None, tid=0)
            k += 1
    return k


n_fallback = finish_pass()
out["host_finish_reads_per_s"] = round(rate(finish_pass), 1)
out["finish_fallback_reads"] = n_fallback

# --- host full map_read (native engine does its own seeding)
def full_pass():
    ne.reset()
    for r, rid in zip(sub.seqs, sub.ids):
        ne.map_read(r, rid, tid=0)


out["host_full_reads_per_s"] = round(rate(full_pass), 1)

# --- host full map_read with device seeds
def full_seeded_pass():
    ne.reset()
    for r, rid, s in zip(sub.seqs, sub.ids, seeds):
        ne.map_read(r, rid, seeds=np.asarray(s, dtype=np.uint64)
                    if s is not None else None, tid=0)


out["host_full_seeded_reads_per_s"] = round(rate(full_seeded_pass), 1)

if AS_JSON:
    print(json.dumps(out))
else:
    for k, v in out.items():
        print(f"{k:>28}: {v}")
