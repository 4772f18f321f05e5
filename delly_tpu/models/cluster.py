"""Clique clustering of split-read and paired-end evidence.

Reference: src/cluster.h. The algorithm is a streaming connected-component
builder over position-sorted records plus greedy weighted clique growth.
The greedy acceptance order (edges sorted by weight) is order-sensitive, so
this stays a faithful host-side implementation; the downstream alignment
work it gates is what runs on the TPU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from delly_tpu.utils.tags import (
    StructuralVariantRecord, SVT_TRANS, is_translocation, max_coord,
    min_coord, pairs_disagree, span_orientation, sv_size_check_lr,
    sv_size_check_sr,
)


@dataclass
class BamAlignRecord:
    """Reduced abnormal-pair record (cluster.h:24-50)."""
    tid: int
    pos: int
    mtid: int
    mpos: int
    alen: int
    malen: int
    median: int
    mad: int
    maxNormalISize: int
    flag: int
    mapQuality: int

    def sort_key(self):
        if self.tid == self.mtid:
            return (min(self.pos, self.mpos), max(self.pos, self.mpos),
                    self.maxNormalISize)
        return (self.pos, self.mpos, self.maxNormalISize)


def _sr_wiggle(pos: int, pos2: int, inslen: int, svt: int,
               max_read_sep: int) -> int:
    """cluster.h:242-251 / :362-370."""
    if is_translocation(svt):
        return 2 * max_read_sep
    svvar = abs(int(0.1 * (inslen if svt == 4 else (pos2 - pos))))
    wiggle = max(max_read_sep, svvar)
    return min(wiggle, 1000)


def _search_cliques_sr(br, comp_edges: dict, svs: list, svt: int,
                       min_clique_size: int, max_read_sep: int) -> None:
    """cluster.h:207-321 (SR instantiation)."""
    for comp_index in sorted(comp_edges):
        edges = comp_edges[comp_index]
        edges.sort(key=lambda e: (e[2], e[0], e[1]))

        src = edges[0][0]
        clique = {src}
        incompatible: set = set()
        seeds = {br[src].id}
        chr_ = br[src].chr
        chr2 = br[src].chr2
        ciposlow = ciposhigh = br[src].pos
        ciendlow = ciendhigh = br[src].pos2
        pos_sum = br[src].pos
        pos2_sum = br[src].pos2
        mapq = br[src].qual
        inslen = br[src].inslen
        wiggle = _sr_wiggle(br[src].pos, br[src].pos2, br[src].inslen, svt,
                            max_read_sep)

        grow = True
        while grow:
            grow = False
            for s, t, _w in edges:
                if grow:
                    break
                if s not in clique and t in clique:
                    v = s
                elif s in clique and t not in clique:
                    v = t
                else:
                    continue
                if v in incompatible:
                    continue
                if br[v].id in seeds:
                    continue
                new_cip_lo = min(br[v].pos, ciposlow)
                new_cip_hi = max(br[v].pos, ciposhigh)
                new_cie_lo = min(br[v].pos2, ciendlow)
                new_cie_hi = max(br[v].pos2, ciendhigh)
                ok = ((new_cip_hi - new_cip_lo) < wiggle
                      and (new_cie_hi - new_cie_lo) < wiggle
                      and ((not is_translocation(svt)) or br[v].chr2 == chr2))
                if ok:
                    grow = True
                    clique.add(v)
                    seeds.add(br[v].id)
                    ciposlow, ciposhigh = new_cip_lo, new_cip_hi
                    ciendlow, ciendhigh = new_cie_lo, new_cie_hi
                    pos_sum += br[v].pos
                    pos2_sum += br[v].pos2
                    mapq += br[v].qual
                    inslen += br[v].inslen
                else:
                    incompatible.add(v)

        # Count paired-end fragments only once (consecutive hash ids are
        # READ1/READ2 of the same fragment, cluster.h:288-298).
        prev_seed = 0
        cliq_size = 0
        selected = set()
        for sid in sorted(seeds):
            if prev_seed + 1 != sid:
                selected.add(sid)
                cliq_size += 1
            prev_seed = sid

        if cliq_size >= min_clique_size:
            sv_start = pos_sum // len(clique)
            sv_end = pos2_sum // len(clique)
            sv_inslen = inslen // len(clique)
            # cluster.h:305 always uses the inslen-aware size gate here.
            if sv_size_check_lr(sv_start, sv_end, svt, sv_inslen):
                svid = len(svs)
                svs.append(StructuralVariantRecord(
                    chr=chr_, svStart=sv_start, chr2=chr2, svEnd=sv_end,
                    ciposlow=ciposlow - sv_start, ciposhigh=ciposhigh - sv_start,
                    ciendlow=ciendlow - sv_end, ciendhigh=ciendhigh - sv_end,
                    srSupport=cliq_size, srMapQuality=mapq // len(clique),
                    mapq=mapq, insLen=sv_inslen, svt=svt, id=svid,
                    precise=True))
                for v in clique:
                    if br[v].id in selected:
                        br[v].svid = svid


def cluster_sr(br: list, svs: list, svt: int, nchr: int, max_read_sep: int,
               graph_pruning: int, min_clique_size: int) -> None:
    """Split-read clustering (cluster.h:324-442).

    ``br`` must be sorted by (chr, pos, chr2, pos2). Records that join a
    clique get ``svid`` assigned in place.
    """
    n = len(br)
    comp = [0] * n
    lo = 0
    for ref_idx in range(nchr):
        while lo < n and br[lo].chr < ref_idx:
            lo += 1
        hi = lo
        while hi < n and br[hi].chr == ref_idx:
            hi += 1
        if lo >= hi:
            continue
        num_comp = 0
        comp_edges: dict = {}
        last_connected = lo
        last_connected_start = lo
        for i in range(lo, hi):
            if i > last_connected:
                if comp_edges:
                    _search_cliques_sr(br, comp_edges, svs, svt,
                                       min_clique_size, max_read_sep)
                    last_connected_start = last_connected
                    comp_edges = {}
            varisize = _sr_wiggle(br[i].pos, br[i].pos2, br[i].inslen, svt,
                                  max_read_sep)
            for j in range(i + 1, hi):
                if (br[j].pos - br[i].pos) > varisize:
                    break
                if svt == 4 and abs(br[j].inslen - br[i].inslen) > varisize:
                    continue
                if is_translocation(svt) and br[j].chr2 != br[i].chr2:
                    continue
                if abs(br[j].pos2 - br[i].pos2) < varisize:
                    if j > last_connected:
                        last_connected = j
                    if not comp[i]:
                        if not comp[j]:
                            num_comp += 1
                            comp_index = num_comp
                            comp[i] = comp[j] = comp_index
                            comp_edges[comp_index] = []
                        else:
                            comp_index = comp[j]
                            comp[i] = comp_index
                    else:
                        if not comp[j]:
                            comp_index = comp[i]
                            comp[j] = comp_index
                        else:
                            if comp[j] == comp[i]:
                                comp_index = comp[j]
                            else:
                                comp_index = min(comp[i], comp[j])
                                other = max(comp[i], comp[j])
                                for k in range(last_connected_start,
                                               last_connected + 1):
                                    if comp[k] == other:
                                        comp[k] = comp_index
                                comp_edges[comp_index].extend(comp_edges[other])
                                del comp_edges[other]
                    if len(comp_edges[comp_index]) < graph_pruning:
                        weight = (abs(br[j].pos2 - br[i].pos2)
                                  + abs(br[j].pos - br[i].pos))
                        comp_edges[comp_index].append((i, j, weight))
        if comp_edges:
            _search_cliques_sr(br, comp_edges, svs, svt, min_clique_size,
                               max_read_sep)
        for k in range(lo, hi):
            comp[k] = 0
        lo = hi


def _init_clique_pe(el: BamAlignRecord, svt: int):
    """cluster.h:68-102."""
    if is_translocation(svt):
        ct = span_orientation(svt)
        if ct % 2 == 0:
            sv_start = el.pos + el.alen
            sv_end = el.mpos if ct >= 2 else el.mpos + el.malen
        else:
            sv_start = el.pos
            sv_end = el.mpos + el.malen if ct >= 2 else el.mpos
        return sv_start, sv_end, el.maxNormalISize
    if svt == 0:
        return (el.mpos + el.malen, el.pos + el.alen,
                el.maxNormalISize - max(el.alen, el.malen))
    if svt == 1:
        return el.mpos, el.pos, el.maxNormalISize - max(el.alen, el.malen)
    if svt == 2:
        return el.mpos + el.malen, el.pos, -el.maxNormalISize
    if svt == 3:
        return el.mpos, el.pos + el.alen, el.maxNormalISize
    return -1, -1, 0


def _update_clique_pe(el: BamAlignRecord, sv_start: int, sv_end: int,
                      wiggle: int, svt: int):
    """cluster.h:105-204. Returns (ok, sv_start, sv_end, wiggle)."""
    if is_translocation(svt):
        ct = span_orientation(svt)
        new_wiggle = wiggle
        if ct % 2 == 0:
            new_start = max(sv_start, el.pos + el.alen)
            new_wiggle -= new_start - sv_start
            if ct >= 2:
                new_end = min(sv_end, el.mpos)
                new_wiggle -= sv_end - new_end
            else:
                new_end = max(sv_end, el.mpos + el.malen)
                new_wiggle -= new_end - sv_end
        else:
            new_start = min(sv_start, el.pos)
            new_wiggle -= sv_start - new_start
            if ct >= 2:
                new_end = max(sv_end, el.mpos + el.malen)
                new_wiggle -= new_end - sv_end
            else:
                new_end = min(sv_end, el.mpos)
                new_wiggle -= sv_end - new_end
        if new_wiggle > 0:
            return True, new_start, new_end, new_wiggle
        return False, sv_start, sv_end, wiggle
    if svt in (0, 1):
        ct = span_orientation(svt)
        if not ct:
            new_start = max(sv_start, el.mpos + el.malen)
            new_end = max(sv_end, el.pos + el.alen)
            new_wiggle = min(el.maxNormalISize - (new_start - el.mpos),
                             el.maxNormalISize - (new_end - el.pos))
            wiggle_change = wiggle - max(new_start - sv_start, new_end - sv_end)
        else:
            new_start = min(sv_start, el.mpos)
            new_end = min(sv_end, el.pos)
            new_wiggle = min(
                el.maxNormalISize - (el.mpos + el.malen - new_start),
                el.maxNormalISize - (el.pos + el.alen - new_end))
            wiggle_change = wiggle - max(sv_start - new_start, sv_end - new_end)
        if wiggle_change < new_wiggle:
            new_wiggle = wiggle_change
        if new_start < new_end and new_wiggle >= 0:
            return True, new_start, new_end, new_wiggle
        return False, sv_start, sv_end, wiggle
    if svt == 2:
        new_start = max(sv_start, el.mpos + el.malen)
        new_end = min(sv_end, el.pos)
        new_wiggle = (el.pos + el.alen - el.mpos - el.maxNormalISize
                      - (new_end - new_start))
        wiggle_change = wiggle + (sv_end - sv_start) - (new_end - new_start)
        if wiggle_change > new_wiggle:
            new_wiggle = wiggle_change
        if new_start < new_end and new_wiggle <= 0:
            return True, new_start, new_end, new_wiggle
        return False, sv_start, sv_end, wiggle
    if svt == 3:
        new_start = min(sv_start, el.mpos)
        new_end = max(sv_end, el.pos + el.alen)
        new_wiggle = (el.pos - (el.mpos + el.malen) + el.maxNormalISize
                      - (new_end - new_start))
        wiggle_change = wiggle - ((new_end - new_start) - (sv_end - sv_start))
        if wiggle_change < new_wiggle:
            new_wiggle = wiggle_change
        if new_start < new_end and new_wiggle >= 0:
            return True, new_start, new_end, new_wiggle
        return False, sv_start, sv_end, wiggle
    return False, sv_start, sv_end, wiggle


def _search_cliques_pe(comp_edges: dict, bam_records: list, svs: list,
                       svt: int, min_clique_size: int) -> None:
    """cluster.h:445-524."""
    for comp_index in sorted(comp_edges):
        edges = comp_edges[comp_index]
        edges.sort(key=lambda e: (e[2], e[0], e[1]))
        src = edges[0][0]
        cluster_ref = bam_records[src].tid
        cluster_mate_ref = bam_records[src].mtid
        sv_start, sv_end, wiggle = _init_clique_pe(bam_records[src], svt)
        if cluster_ref == cluster_mate_ref and sv_start >= sv_end:
            continue
        clique = {src}
        incompatible: set = set()
        grow = True
        while grow:
            grow = False
            for s, t, _w in edges:
                if grow:
                    break
                if s not in clique and t in clique:
                    v = s
                elif s in clique and t not in clique:
                    v = t
                else:
                    continue
                if v in incompatible:
                    continue
                ok, sv_start, sv_end, wiggle = _update_clique_pe(
                    bam_records[v], sv_start, sv_end, wiggle, svt)
                if ok:
                    grow = True
                    clique.add(v)
                else:
                    incompatible.add(v)
        if len(clique) >= min_clique_size and sv_size_check_sr(sv_start, sv_end, svt):
            rec = StructuralVariantRecord()
            rec.chr = cluster_ref
            rec.chr2 = cluster_mate_ref
            if svt < SVT_TRANS:
                rec.svStart = sv_start
                rec.svEnd = sv_end
            else:
                rec.svStart = sv_start + 1
                rec.svEnd = sv_end + 1
            rec.peSupport = len(clique)
            ci_wiggle = max(abs(wiggle), 50)
            rec.ciposlow = -ci_wiggle
            rec.ciposhigh = ci_wiggle
            rec.ciendlow = -ci_wiggle
            rec.ciendhigh = ci_wiggle
            mapqv = sorted(bam_records[v].mapQuality for v in clique)
            rec.mapq = sum(mapqv)
            rec.peMapQuality = mapqv[len(mapqv) // 2]
            rec.srSupport = 0
            rec.srAlignQuality = 0
            rec.precise = False
            rec.svt = svt
            rec.insLen = 0
            rec.homLen = 0
            svs.append(rec)


def cluster_pe(bam_records: list, svs: list, varisize: int, svt: int,
               graph_pruning: int, min_clique_size: int) -> None:
    """Paired-end clustering (cluster.h:528-629).

    ``bam_records`` must be sorted by BamAlignRecord.sort_key().
    """
    n = len(bam_records)
    comp = [0] * n
    num_comp = 0
    comp_edges: dict = {}
    last_connected = 0
    last_connected_start = 0
    for i in range(n):
        if i > last_connected:
            if comp_edges:
                _search_cliques_pe(comp_edges, bam_records, svs, svt,
                                   min_clique_size)
                last_connected_start = last_connected
                comp_edges = {}
        rec_i = bam_records[i]
        mincoord = min_coord(rec_i.pos, rec_i.mpos, svt)
        maxcoord = max_coord(rec_i.pos, rec_i.mpos, svt)
        for j in range(i + 1, n):
            rec_j = bam_records[j]
            if abs(min_coord(rec_j.pos, rec_j.mpos, svt) + rec_j.alen
                   - mincoord) > varisize:
                break
            if rec_i.mtid != rec_j.mtid:
                continue
            if pairs_disagree(mincoord, maxcoord, rec_i.alen,
                              rec_i.maxNormalISize,
                              min_coord(rec_j.pos, rec_j.mpos, svt),
                              max_coord(rec_j.pos, rec_j.mpos, svt),
                              rec_j.alen, rec_j.maxNormalISize, svt):
                continue
            if j > last_connected:
                last_connected = j
            if not comp[i]:
                if not comp[j]:
                    num_comp += 1
                    comp_index = num_comp
                    comp[i] = comp[j] = comp_index
                    comp_edges[comp_index] = []
                else:
                    comp_index = comp[j]
                    comp[i] = comp_index
            else:
                if not comp[j]:
                    comp_index = comp[i]
                    comp[j] = comp_index
                else:
                    if comp[j] == comp[i]:
                        comp_index = comp[j]
                    else:
                        comp_index = min(comp[i], comp[j])
                        other = max(comp[i], comp[j])
                        for k in range(last_connected_start, last_connected + 1):
                            if comp[k] == other:
                                comp[k] = comp_index
                        comp_edges[comp_index].extend(comp_edges[other])
                        del comp_edges[other]
            if len(comp_edges[comp_index]) < graph_pruning:
                weight = int(math.log2(abs(
                    abs((min_coord(rec_j.pos, rec_j.mpos, svt) - mincoord)
                        - (max_coord(rec_j.pos, rec_j.mpos, svt) - maxcoord))
                    - abs(rec_i.median - rec_j.median)) + 1))
                comp_edges[comp_index].append((i, j, weight))
    if comp_edges:
        _search_cliques_pe(comp_edges, bam_records, svs, svt, min_clique_size)
