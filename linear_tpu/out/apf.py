""".apf approximate-map text format printer (reference: print_cords_apf
src/f_io.cpp:100-207)."""
from __future__ import annotations

from typing import List

from ..utils.cordscalar import cy, cx, cid, strand, is_end

WINDOW = 96


def print_cords_apf(
    cords_set: List[List[int]],
    genome_lens: List[int],
    genome_ids: List[str],
    read_lens: List[int],
    read_ids: List[str],
) -> str:
    """Render one block of reads' cords as .apf text. cords_set[k] is the
    cords_str list (with header at [0]) for read k; empty/len<2 reads print
    nothing (matching the reference's empty(cords) check)."""
    out: List[str] = []
    for k, cords in enumerate(cords_set):
        if not cords:
            continue
        fflag = 0
        for j in range(1, len(cords)):
            if is_end(cords[j - 1]):
                m = j
                main_strand_count = 0
                block_len = 0
                while m < len(cords) and not is_end(cords[m]):
                    if strand(cords[m]):
                        main_strand_count += 1
                    block_len += 1
                    m += 1
                if main_strand_count > block_len // 2:
                    main_icon = '-'
                elif main_strand_count == block_len // 2:
                    main_icon = '-' if strand(cords[j]) else '+'
                else:
                    main_icon = '+'
                i = j
                while True:
                    if is_end(cords[i]) or i == len(cords) - 1:
                        read_cord_end = cy(cords[i]) + WINDOW
                        seqs_cord_end = cx(cords[i]) + WINDOW
                        break
                    i += 1
                if k > 0:
                    out.append("\n")
                gid = cid(cords[j])
                out.append(
                    f"@ {read_ids[k]} {read_lens[k]} {cy(cords[j])} "
                    f"{min(read_cord_end, read_lens[k])} {main_icon} "
                    f"{genome_ids[gid]} {genome_lens[gid]} {cx(cords[j])} "
                    f"{seqs_cord_end}\n"
                )
                fflag = 1
            icon = '-' if strand(cords[j]) else '+'
            d1 = 0
            d2 = 0
            if not fflag:
                d1 = cx(cords[j]) - cx(cords[j - 1])
                d2 = cy(cords[j]) - cy(cords[j - 1])
            out.append(f"| {cy(cords[j])} {cx(cords[j])} {d2} {d1} {icon}\n")
            fflag = 0
    return "".join(out)
