// Native HIndex (-i 2) build: __createHsArray + _hsSortX_1 + _createYSA +
// XString fill (reference: src/index_util.cpp:719-818, 432-561, 1166-1447,
// sizing :217-237, hash :971-982). Bit-identical twin of the Python build
// in linear_tpu/index/hindex.py (build_hindex/_finalize) — which is the
// difftested oracle — including its documented reference quirks:
//   - thread-chunk bounds affect sampling (chunk list mirrors
//     _thread_chunks, :740-760);
//   - the N-jump that lands one extra emission past the chunk end;
//   - heads are written one emission late (rewritten with preX) and the
//     final flush stamps the chunk's LAST computed XValue;
//   - countMove <= 2 aborts the last group (head + first body zeroed,
//     empty_dir points at the aborted head, bodies stay unsorted);
//   - build YValues spill into bits 61-62 (unmasked make_hs_body).
#pragma once
#include "le_common.hpp"
#include "le_hash.hpp"

#include <algorithm>
#include <functional>
#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#endif

namespace le {

struct HIndexBuild {
    std::vector<u64> ysa;
    std::vector<u64> v1;
    std::vector<i64> v2;
    u64 mask = 0;
    i64 empty_dir = 0;
};

static const u64 HB_BIT63 = 1ull << 63;
static const u64 HB_STRAND = 1ull << 40;
static const u64 HB_MASK40 = (1ull << 40) - 1;
static const u64 HB_MASK20 = (1ull << 20) - 1;
static const u64 HB_YFIELD = HB_MASK20 << 41;

static inline u64 hb_make_head(u64 ptr, u64 xval) {
    return ((ptr << 40) + xval) & (HB_BIT63 - 1);
}
static inline u64 hb_make_body(u64 yval, u64 gid, u64 pos, int strand) {
    u64 v = ((yval << 41) | HB_BIT63) + (gid << 30) + pos;
    return strand ? (v | HB_STRAND) : v;
}
static inline u64 hb_body_y(u64 v) { return (v >> 41) & HB_MASK20; }

// hashNext (src/shape_extend.cpp:132-168): rolls h/crh/x AND computes
// XValue/strand plus the FULL remainder-encoded YValue (used by the build
// stream; nextx's 4-adjacent-bases YValue is the query-side variant)
static inline void hb_next_full(HashStream& st, const u8* seq, i64 it) {
    int s = st.span, w = st.weight;
    int span2 = 2 * s, weight2 = 2 * w;
    u64 mask = (1ull << (span2 - 2)) - 1;
    u64 v2 = seq[it + s - 1];
    st.h = ((st.h & mask) << 2) + v2;
    st.crh = ((st.crh >> 2) & mask) + ((3 - v2) << (span2 - 2));
    st.x += ((i64)v2 - (i64)st.left) << 1;
    st.left = seq[it];
    u64 v = (st.x > 0) ? st.h : st.crh;
    st.strand = (st.x > 0) ? 0 : 1;
    u64 xv = (1ull << span2) - 1;
    int t = 0;
    for (int k = 64 - span2; k <= 64 - weight2; k += 2) {
        u64 v1 = (v << k) >> (64 - weight2);
        if (xv > v1) { xv = v1; t = k; }
    }
    st.xval = xv;
    st.yval = ((v >> (64 - t)) << (64 - t - weight2))
              + (v & ((1ull << (64 - t - weight2)) - 1))
              + ((u64)t << (span2 - weight2 - 1));
}

// one thread chunk of __createHsArray (exact port of hindex.py
// _chunk_blocks_scalar, :761-794 incl. the N-jump quirk)
static inline void hb_chunk(const u8* seq, i64 n, i64 start, i64 csize,
                            int span, int weight, i64 step, i64 gid,
                            std::vector<u64>& out) {
    HashStream st(span, weight);
    if (st.init(seq, n, start) < 0) return;
    i64 pre_x = -1;
    u64 last_xval = 0;
    i64 k = start;
    i64 end = start + csize;
    while (k < end) {
        if (k + span - 1 < n && seq[k + span - 1] == 4) {
            i64 skip = st.init(seq, n, k);
            if (skip < 0) break;
            k += skip;
            if (k > csize - span + 1 + start)
                k = csize - (csize + start) % step + step + start;
        }
        if (k + span - 1 >= n) break;
        hb_next_full(st, seq, k);
        last_xval = st.xval;
        if (k % step == 0 && (i64)st.xval != pre_x) {
            if (!out.empty())
                out[out.size() - 2] = hb_make_head(2, (u64)pre_x);
            out.push_back(hb_make_head(2, pre_x >= 0 ? (u64)pre_x : 0));
            out.push_back(hb_make_body(st.yval, gid, k, st.strand));
            pre_x = (i64)st.xval;
        }
        k++;
    }
    if (!out.empty()) out[out.size() - 2] = hb_make_head(2, last_xval);
}

// _hsSortX_1 + _createYSA + XString fill (hindex.py _finalize)
static inline void hb_finalize(std::vector<u64>& hs, int weight,
                               i64 blocklimit, double alpha, HIndexBuild& b) {
    i64 n = (i64)hs.size() / 2;
    if (n == 0) {
        b.ysa.assign(2, 0);
        b.v1.assign(2, 0);
        b.v2.assign(2, 0);
        b.mask = 1;
        b.empty_dir = 0;
        return;
    }
    // stable sort node pairs by the low 2*weight bits of the head xval.
    // Encoded as (key << 46) | index: the composite u64s are DISTINCT
    // (index is unique), so an unstable sort of them reproduces the
    // stable order exactly — and sorts plain u64s instead of chasing a
    // comparator through the hs array (2*weight = 18 bits for the 17-mer
    // HIndex; n < 2^46 always)
    u64 kmask = (1ull << (2 * weight)) - 1;
    std::vector<u64> order(n);
    if (2 * weight <= 18) {
        for (i64 i = 0; i < n; i++)
            order[i] = ((hs[2 * i] & kmask) << 46) | (u64)i;
#ifdef _OPENMP
        __gnu_parallel::sort(order.begin(), order.end());
#else
        std::sort(order.begin(), order.end());
#endif
    } else {  // wider keys: comparator-based stable sort (same permutation)
        for (i64 i = 0; i < n; i++) order[i] = (u64)i;
        auto cmp = [&](u64 a, u64 c) {
            return (hs[2 * a] & kmask) < (hs[2 * c] & kmask);
        };
#ifdef _OPENMP
        __gnu_parallel::stable_sort(order.begin(), order.end(), cmp);
#else
        std::stable_sort(order.begin(), order.end(), cmp);
#endif
    }
    const u64 imask = (2 * weight <= 18) ? ((1ull << 46) - 1) : ~0ull;
    std::vector<u64> hx(n), bodies(n);
    for (i64 i = 0; i < n; i++) {
        i64 o = (i64)(order[i] & imask);
        hx[i] = hs[2 * o] & HB_MASK40;
        bodies[i] = hs[2 * o + 1];
    }
    // group consecutive equal xvals
    std::vector<i64> grp_start;  // index into bodies
    for (i64 i = 0; i < n; i++)
        if (i == 0 || hx[i] != hx[i - 1]) grp_start.push_back(i);
    i64 n_grp = (i64)grp_start.size();
    grp_start.push_back(n);
    bool abort_last = (n - n_grp) <= 2;
    i64 total_nodes = n_grp + n;
    b.ysa.assign(total_nodes + 2, 0);
    std::vector<i64> grp_head_pos(n_grp);
    {
        i64 pos = 0;
        for (i64 g = 0; g < n_grp; g++) {
            grp_head_pos[g] = pos;
            pos += grp_start[g + 1] - grp_start[g] + 1;
        }
    }
    // per-group descending body sorts are independent (bodies are distinct
    // u64s, so the comparator admits exactly one sorted order)
#pragma omp parallel for schedule(dynamic, 1024)
    for (i64 g = 0; g < n_grp; g++) {
        i64 s0 = grp_start[g], s1 = grp_start[g + 1];
        i64 sz = s1 - s0;
        i64 pos = grp_head_pos[g];
        b.ysa[pos] = hb_make_head((u64)(sz + 1), hx[s0]);
        if (!(abort_last && g == n_grp - 1))
            std::sort(bodies.begin() + s0, bodies.begin() + s1,
                      std::greater<u64>());
        for (i64 j = 0; j < sz; j++) b.ysa[pos + 1 + j] = bodies[s0 + j];
    }
    i64 fill_grps;
    if (abort_last && n_grp >= 1) {
        b.empty_dir = grp_head_pos[n_grp - 1];
        b.ysa[b.empty_dir] = 0;
        b.ysa[b.empty_dir + 1] = 0;
        fill_grps = n_grp - 1;
    } else {
        b.empty_dir = total_nodes;
        fill_grps = n_grp;
    }
    // XString sizing (:1398-1420) — pure counting, safely parallel
    i64 count = 0;
#pragma omp parallel for schedule(dynamic, 4096) reduction(+ : count)
    for (i64 g = 0; g < fill_grps; g++) {
        i64 sz = grp_start[g + 1] - grp_start[g];
        if (sz + 1 < blocklimit) {
            count++;
        } else {
            i64 p = grp_head_pos[g];
            u64 prev = b.ysa[p];
            for (i64 j = p + 1; j < p + 1 + sz; j++) {
                if (hb_body_y(b.ysa[j] ^ prev)) count++;
                prev = b.ysa[j];
            }
            count++;
        }
    }
    u64 size = 1;
    while ((double)size < count * alpha) size <<= 1;
    b.mask = size - 1;
    b.v1.assign(size, 0);
    b.v2.assign(size, 0);
    auto insert = [&](u64 key, i64 val2, u64 node_type) {
        u64 h1 = wang_hash64(key) & b.mask;
        u64 delta = 0;
        while (b.v1[h1]) {
            h1 = (h1 + delta + 1) & b.mask;
            delta++;
        }
        b.v1[h1] = (key << 2) + node_type;
        b.v2[h1] = val2;
    };
    for (i64 g = 0; g < fill_grps; g++) {
        i64 sz = grp_start[g + 1] - grp_start[g];
        i64 p = grp_head_pos[g];
        u64 xval = hx[grp_start[g]];
        if (sz + 1 < blocklimit) {
            // zero the bodies' y-field (bits 41-60 only; overflow bits stay)
            for (i64 j = p + 1; j < p + 1 + sz; j++) b.ysa[j] &= ~HB_YFIELD;
            insert(xval, p + 1, 1);
        } else {
            insert(xval, (i64)((~1u) & 0xFFFFFFFFu), 3);  // virtual head
            u64 prev = b.ysa[p];
            for (i64 j = p + 1; j < p + 1 + sz; j++) {
                u64 cur = b.ysa[j];
                if (hb_body_y(cur ^ prev))
                    insert(xval + ((cur & HB_YFIELD) >> 1), j, 1);
                prev = cur;
            }
        }
    }
}

}  // namespace le
