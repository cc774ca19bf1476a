"""Stage-trace differ: localize host-engine divergences vs the reference.

Workflow (see tests/difftest.py for corpus generation):
  1. Build an instrumented copy of the reference (outside the repo) that
     dumps `TAG n v0 v1 ...` lines at the apxMap stage boundaries
     (ANCH/FANC/CHA1/PREF/HITS/CRDS/APXF) and run it with LINEAR_DBG=<path>.
  2. Run `python tools/diffstage.py trace --reads r.fa --genome g.fa
     --out mine.txt` to produce our trace (serial per-read order, host path).
  3. Run `python tools/diffstage.py diff ref.txt mine.txt` to find the first
     diverging stage line.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cmd_trace(args):
    assert os.environ.get("LINEAR_TPU_DBG"), "set LINEAR_TPU_DBG=<out path> before running trace"
    import numpy as np

    from linear_tpu.map.mapper import Mapper, MapperConfig
    from linear_tpu.utils import seqio

    m = Mapper([args.genome], MapperConfig(gap_len=args.gap_len, threads=args.threads,
                                           read_group="", sample_name=""))
    m.prepare()
    for block in seqio.read_blocks(args.reads):
        for read in block.seqs:
            m.map_read(read)
    print("trace written to", os.environ["LINEAR_TPU_DBG"])


def parse_trace(path):
    out = []
    for ln in open(path):
        parts = ln.split()
        if not parts:
            continue
        tag, n = parts[0], int(parts[1])
        vals = [int(v) for v in parts[2:]]
        assert len(vals) == n, f"bad line in {path}: {ln[:80]}"
        out.append((tag, vals))
    return out


def fmt_cord(v):
    from linear_tpu.utils.cordscalar import cid, cx, cy, strand, is_end

    return f"{v}(id={cid(v)} x={cx(v)} y={cy(v)} s={strand(v)} e={1 if is_end(v) else 0})"


def cmd_diff(args):
    t1 = parse_trace(args.ref)
    t2 = parse_trace(args.mine)
    n_reads = 0
    for i, ((tag1, v1), (tag2, v2)) in enumerate(zip(t1, t2)):
        if tag1 == "ANCH":
            n_reads += 1
        if tag1 != tag2:
            print(f"line {i}: TAG mismatch {tag1} vs {tag2} (read ~{n_reads})")
            return 1
        if v1 != v2:
            print(f"line {i}: stage {tag1} diverges (read ordinal ~{n_reads}, 1-based)")
            print(f"  ref  n={len(v1)}  mine n={len(v2)}")
            shown = 0
            for k in range(max(len(v1), len(v2))):
                a = v1[k] if k < len(v1) else None
                b = v2[k] if k < len(v2) else None
                if a != b and shown < args.show:
                    fa = fmt_cord(a) if a is not None else "<none>"
                    fb = fmt_cord(b) if b is not None else "<none>"
                    print(f"  [{k}] ref {fa}\n       mine {fb}")
                    shown += 1
            return 1
    if len(t1) != len(t2):
        print(f"trace length mismatch: ref {len(t1)} mine {len(t2)} (common prefix identical)")
        return 1
    print(f"traces identical ({len(t1)} stage lines, ~{n_reads} reads)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("trace")
    tr.add_argument("--reads", required=True)
    tr.add_argument("--genome", required=True)
    tr.add_argument("--gap-len", type=int, default=0)
    tr.add_argument("--threads", type=int, default=1)
    tr.set_defaults(fn=cmd_trace)
    df = sub.add_parser("diff")
    df.add_argument("ref")
    df.add_argument("mine")
    df.add_argument("--show", type=int, default=6)
    df.set_defaults(fn=cmd_diff)
    args = ap.parse_args()
    sys.exit(args.fn(args) or 0)


if __name__ == "__main__":
    main()
