"""Synthetic BAM/FASTA builder for multi-chromosome e2e tests.

Encodes alignment records in the BAM binary layout (SAM spec section 4)
and wraps them in BGZF via the project codec — a test-only writer
mirroring what HTSlib's sam_write1 does for the reference's test data.
"""

import random
import struct

import numpy as np

from delly_tpu.io.bgzf import bgzf_compress

_NT16 = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
_NT16_LUT = np.full(256, 15, dtype=np.uint8)
for _c, _i in _NT16.items():
    _NT16_LUT[ord(_c)] = _i


def _pack_seq(seq: str) -> bytes:
    """4-bit pack a base string (vectorized; generation hot path)."""
    codes = _NT16_LUT[np.frombuffer(seq.encode(), dtype=np.uint8)]
    if len(codes) % 2:
        codes = np.concatenate([codes, np.zeros(1, dtype=np.uint8)])
    return ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8).tobytes()


def encode_record(qname, flag, tid, pos, mapq, cigar, mtid, mpos, tlen,
                  seq, qual=None):
    """cigar: list of (op_char, length)."""
    name = qname.encode() + b"\x00"
    cig = b"".join(struct.pack("<I", (n << 4) | "MIDNSHP=X".index(op))
                   for op, n in cigar)
    nseq = len(seq)
    q = bytes([30] * nseq) if qual is None else qual
    body = struct.pack("<iiBBHHHiiii", tid, pos, len(name), mapq, 0,
                       len(cigar), flag, nseq, mtid, mpos, tlen)
    body += name + cig + _pack_seq(seq) + q
    return struct.pack("<i", len(body)) + body


def random_contig(rng_or_seed, length: int) -> str:
    """Fast random ACGT contig (numpy; scales to Mbp)."""
    seed = (rng_or_seed if isinstance(rng_or_seed, int)
            else rng_or_seed.randint(0, 2**31))
    g = np.random.default_rng(seed)
    return np.frombuffer(b"ACGT", dtype=np.uint8)[
        g.integers(0, 4, size=length)].tobytes().decode()


def write_bam(path, contigs, records, index=True):
    """contigs: list of (name, seq). records: encoded record blobs in
    coordinate order. Writes a .bai alongside (like samtools index) so
    the streaming reader can region-query the file."""
    text = "".join(f"@SQ\tSN:{n}\tLN:{len(s)}\n" for n, s in contigs)
    text += "@RG\tID:synth\tSM:synth\n"
    out = bytearray()
    out += b"BAM\x01" + struct.pack("<i", len(text))
    out += text.encode()
    out += struct.pack("<i", len(contigs))
    for n, s in contigs:
        nb = n.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", len(s))
    for rec in records:
        out += rec
    comp = bgzf_compress(bytes(out))
    with open(path, "wb") as fh:
        fh.write(comp)
    if index:
        from delly_tpu.io.bai import build_bai
        with open(path + ".bai", "wb") as fh:
            fh.write(build_bai(comp))


def write_fasta(path, contigs):
    with open(path, "w") as fh:
        for n, s in contigs:
            fh.write(f">{n}\n")
            for k in range(0, len(s), 60):
                fh.write(s[k:k + 60] + "\n")
    with open(path + ".fai", "w") as fh:
        off = 0
        for n, s in contigs:
            off += len(n) + 2
            nlines = (len(s) + 59) // 60
            fh.write(f"{n}\t{len(s)}\t{off}\t60\t61\n")
            off += len(s) + nlines


def make_translocation_dataset(tmpdir, seed=11):
    """Two contigs with a reciprocal translocation junction
    ctgA:12000(3') -> ctgB:6000(5'): normal pairs for library stats,
    discordant cross-contig pairs and split reads over the junction."""
    rng = random.Random(seed)
    ctga = "".join(rng.choice("ACGT") for _ in range(20000))
    ctgb = "".join(rng.choice("ACGT") for _ in range(20000))
    contigs = [("ctgA", ctga), ("ctgB", ctgb)]
    bp_a, bp_b = 12000, 6000
    derived = ctga[:bp_a] + ctgb[bp_b:]   # the rearranged haplotype
    rl = 100
    isize = 400
    recs = []

    def pair(qid, tid, ref, p1):
        p2 = p1 + isize - rl
        s1 = ref[p1:p1 + rl]
        s2 = ref[p2:p2 + rl]
        recs.append((tid, p1, encode_record(
            f"p{qid}", 0x63, tid, p1, 60, [("M", rl)], tid, p2, isize,
            s1)))
        recs.append((tid, p2, encode_record(
            f"p{qid}", 0x93, tid, p2, 60, [("M", rl)], tid, p1, -isize,
            s2)))

    qid = 0
    # normal pairs on both contigs (library stats need >= 1000 pairs)
    for _ in range(700):
        pair(qid, 0, ctga, rng.randint(0, len(ctga) - isize - 1))
        qid += 1
    for _ in range(700):
        pair(qid, 1, ctgb, rng.randint(0, len(ctgb) - isize - 1))
        qid += 1
    # discordant pairs spanning the junction: read1 before bp_a on A
    # (fwd), read2 after bp_b on B (rev) -> 3to5 translocation
    for _ in range(40):
        off = rng.randint(60, 250)
        p1 = bp_a - off - rl
        p2 = bp_b + (isize - off - 2 * rl) + rng.randint(0, 30)
        recs.append((0, p1, encode_record(
            f"t{qid}", 0x61, 0, p1, 60, [("M", rl)], 1, p2, 0,
            ctga[p1:p1 + rl])))
        recs.append((1, p2, encode_record(
            f"t{qid}", 0x91, 1, p2, 60, [("M", rl)], 0, p1, 0,
            ctgb[p2:p2 + rl])))
        qid += 1
    # split reads across the junction (soft-clipped on each side)
    for _ in range(30):
        off = rng.randint(25, 70)   # bases on the A side
        dpos = bp_a - off
        seq = derived[dpos:dpos + rl]
        # primary: M on A with right soft clip
        recs.append((0, dpos, encode_record(
            f"s{qid}", 0x0, 0, dpos, 60, [("M", off), ("S", rl - off)],
            -1, -1, 0, seq)))
        # supplementary: left clip + M on B
        recs.append((1, bp_b, encode_record(
            f"s{qid}", 0x800, 1, bp_b, 60,
            [("S", off), ("M", rl - off)], -1, -1, 0, seq)))
        qid += 1
    recs.sort(key=lambda r: (r[0], r[1]))
    bam = f"{tmpdir}/tra.bam"
    fa = f"{tmpdir}/tra.fa"
    write_bam(bam, contigs, [r[2] for r in recs])
    write_fasta(fa, contigs)
    return bam, fa


def make_dup_inv_dataset(tmpdir, seed=23):
    """One contig with PE-only signatures: a tandem duplication
    [5000,8000) (RF pairs over the copy junction) and a 3'-3' inversion
    at [12000,15000) (FF pairs). PE-only SVs come out IMPRECISE."""
    rng = random.Random(seed)
    ref = "".join(rng.choice("ACGT") for _ in range(30000))
    contigs = [("ctg1", ref)]
    rl = 100
    isize = 400
    recs = []
    qid = 0

    def norm_pair(p1):
        nonlocal qid
        p2 = p1 + isize - rl
        recs.append((p1, encode_record(
            f"p{qid}", 0x63, 0, p1, 60, [("M", rl)], 0, p2, isize,
            ref[p1:p1 + rl])))
        recs.append((p2, encode_record(
            f"p{qid}", 0x93, 0, p2, 60, [("M", rl)], 0, p1, -isize,
            ref[p2:p2 + rl])))
        qid += 1

    for _ in range(1200):
        norm_pair(rng.randint(0, len(ref) - isize - 1))

    # DUP junction 8000 -> 5000: fwd read before the junction, reverse
    # mate just after the dup start (RF in sorted order)
    for _ in range(40):
        o1 = rng.randint(20, 120)
        o2 = rng.randint(20, 120)
        pf = 8000 - o1 - rl
        pr = 5000 + o2
        recs.append((pf, encode_record(
            f"d{qid}", 0x61, 0, pf, 60, [("M", rl)], 0, pr, 0,
            ref[pf:pf + rl])))
        recs.append((pr, encode_record(
            f"d{qid}", 0x91, 0, pr, 60, [("M", rl)], 0, pf, 0,
            ref[pr:pr + rl])))
        qid += 1

    # INV 3to3 at [12000,15000): both reads forward (FF)
    for _ in range(40):
        o1 = rng.randint(20, 120)
        o2 = rng.randint(20, 120)
        p1 = 12000 - o1 - rl
        p2 = 15000 - o2 - rl
        recs.append((p1, encode_record(
            f"v{qid}", 0x41, 0, p1, 60, [("M", rl)], 0, p2, 0,
            ref[p1:p1 + rl])))
        recs.append((p2, encode_record(
            f"v{qid}", 0x81, 0, p2, 60, [("M", rl)], 0, p1, 0,
            ref[p2:p2 + rl])))
        qid += 1
    recs.sort(key=lambda r: r[0])
    bam = f"{tmpdir}/dupinv.bam"
    fa = f"{tmpdir}/dupinv.fa"
    write_bam(bam, contigs, [r[1] for r in recs])
    write_fasta(fa, contigs)
    return bam, fa


def make_insertion_dataset(tmpdir, seed=31):
    """One contig with a 40bp novel insertion at 10000, covered by
    split reads (primary + supplementary) that span it."""
    rng = random.Random(seed)
    ref = "".join(rng.choice("ACGT") for _ in range(20000))
    ins = "".join(rng.choice("ACGT") for _ in range(40))
    bp = 10000
    derived = ref[:bp] + ins + ref[bp:]
    rl, isize = 100, 400
    recs = []
    qid = 0
    for _ in range(1100):
        p1 = rng.randint(0, len(ref) - isize - 1)
        p2 = p1 + isize - rl
        recs.append((p1, encode_record(
            f"p{qid}", 0x63, 0, p1, 60, [("M", rl)], 0, p2, isize,
            ref[p1:p1 + rl])))
        recs.append((p2, encode_record(
            f"p{qid}", 0x93, 0, p2, 60, [("M", rl)], 0, p1, -isize,
            ref[p2:p2 + rl])))
        qid += 1
    for _ in range(30):
        off = rng.randint(26, 34)
        dpos = bp - off
        seq = derived[dpos:dpos + rl]
        recs.append((dpos, encode_record(
            f"s{qid}", 0x0, 0, dpos, 60, [("M", off), ("S", rl - off)],
            -1, -1, 0, seq)))
        m2 = rl - off - len(ins)
        recs.append((bp, encode_record(
            f"s{qid}", 0x800, 0, bp, 60, [("S", rl - m2), ("M", m2)],
            -1, -1, 0, seq)))
        qid += 1
    recs.sort(key=lambda r: r[0])
    bam = f"{tmpdir}/ins.bam"
    fa = f"{tmpdir}/ins.fa"
    write_bam(bam, [("ctg1", ref)], [r[1] for r in recs])
    write_fasta(fa, [("ctg1", ref)])
    return bam, fa, ins


def make_lr_insertion_dataset(tmpdir, seed=41):
    """Long reads carrying a 500bp insertion as an I CIGAR op at 20000
    (exercises the msaWfa k-mer/superstring INS consensus path)."""
    rng = random.Random(seed)
    ref = "".join(rng.choice("ACGT") for _ in range(40000))
    ins = "".join(rng.choice("ACGT") for _ in range(500))
    bp = 20000
    recs = []
    qid = 0
    for _ in range(60):
        p = rng.randint(0, len(ref) - 4000)
        recs.append((p, encode_record(
            f"b{qid}", 0x0, 0, p, 60, [("M", 4000)], -1, -1, 0,
            ref[p:p + 4000])))
        qid += 1
    for _ in range(12):
        lo = rng.randint(800, 1500)
        hi = rng.randint(800, 1500)
        p = bp - lo
        seq = ref[p:bp] + ins + ref[bp:bp + hi]
        recs.append((p, encode_record(
            f"i{qid}", 0x0, 0, p, 60,
            [("M", lo), ("I", len(ins)), ("M", hi)], -1, -1, 0, seq)))
        qid += 1
    recs.sort(key=lambda r: r[0])
    bam = f"{tmpdir}/lri.bam"
    fa = f"{tmpdir}/lri.fa"
    write_bam(bam, [("ctg1", ref)], [r[1] for r in recs])
    write_fasta(fa, [("ctg1", ref)])
    return bam, fa, ins


def make_multi_contig_del_dataset(tmpdir, n_contigs=4, contig_len=60_000,
                                  pairs_per_contig=900, sr_per_del=10,
                                  pe_per_del=14, seed=77, name="multi"):
    """`n_contigs` contigs, one heterozygous ~8kb DEL per contig with
    both PE (discordant spanning pairs) and SR (primary+supplementary
    split reads) evidence, plus normal pairs for library statistics.
    Returns (bam_path, fasta_path, truth) with truth = [(chrom_name,
    del_start, del_end)]. Scales to benchmark size via the count
    parameters."""
    rng = random.Random(seed)
    contigs = [(f"chr{c + 1}", random_contig(rng, contig_len))
               for c in range(n_contigs)]
    rl = 100
    isize = 400
    del_len = 8000
    truth = []
    recs = []
    qid = 0
    for tid, (cname, ref) in enumerate(contigs):
        bp1 = contig_len * 2 // 5
        bp2 = bp1 + del_len
        truth.append((cname, bp1, bp2))
        derived = ref[:bp1] + ref[bp2:]
        # normal pairs
        for _ in range(pairs_per_contig):
            p1 = rng.randint(0, contig_len - isize - 1)
            p2 = p1 + isize - rl
            recs.append((tid, p1, encode_record(
                f"p{qid}", 0x63, tid, p1, 60, [("M", rl)], tid, p2,
                isize, ref[p1:p1 + rl])))
            recs.append((tid, p2, encode_record(
                f"p{qid}", 0x93, tid, p2, 60, [("M", rl)], tid, p1,
                -isize, ref[p2:p2 + rl])))
            qid += 1
        # discordant pairs spanning the deletion (3to5, large insert)
        for _ in range(pe_per_del):
            off = rng.randint(30, 200)
            p1 = bp1 - off - rl
            p2 = bp2 + (isize - off - 2 * rl) + rng.randint(0, 40)
            tl = p2 + rl - p1
            recs.append((tid, p1, encode_record(
                f"d{qid}", 0x61, tid, p1, 60, [("M", rl)], tid, p2,
                tl, ref[p1:p1 + rl])))
            recs.append((tid, p2, encode_record(
                f"d{qid}", 0x91, tid, p2, 60, [("M", rl)], tid, p1,
                -tl, ref[p2:p2 + rl])))
            qid += 1
        # split reads across the junction: primary M+S at bp1,
        # supplementary S+M at bp2 (same read name -> same seed)
        for _ in range(sr_per_del):
            off = rng.randint(30, 70)
            dpos = bp1 - off
            seq = derived[dpos:dpos + rl]
            recs.append((tid, dpos, encode_record(
                f"s{qid}", 0x0, tid, dpos, 60,
                [("M", off), ("S", rl - off)], -1, -1, 0, seq)))
            recs.append((tid, bp2, encode_record(
                f"s{qid}", 0x800, tid, bp2, 60,
                [("S", off), ("M", rl - off)], -1, -1, 0, seq)))
            qid += 1
    recs.sort(key=lambda r: (r[0], r[1]))
    bam = f"{tmpdir}/{name}.bam"
    fa = f"{tmpdir}/{name}.fa"
    write_bam(bam, contigs, [r[2] for r in recs])
    write_fasta(fa, contigs)
    return bam, fa, truth
