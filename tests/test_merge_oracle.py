"""Differential oracle for the multi-sample merge matching primitives.

tests/merge_probe.cpp compiles byte-exact slices of the reference's
merge.h (namespace start through UnionFind) and util.h
(_decodeOrientation), generated here with sed from the read-only
reference, and drives them over a line protocol; this module fuzzes
delly_tpu/models/merge.py against the real reference code actually
executing: Booth minimal rotation (merge.h:188-208), edlib sequence
identity with the k-cutoff (:210-223), rotation-aware best identity
(:226-243), the subtype-aware _svMatch across BND/MEI/TR/normal
regimes (:246-309), UnionFind path-halving semantics (:313-338),
recOverlap, subtype/SVT/BND-ALT decoding and _decodeOrientation.
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.models.sr import merge_sort
from delly_tpu.models.merge import (
    MergeConfig, MergeSV, UnionFind, best_seq_identity,
    merge_decode_svt, min_rotation, parse_bnd_mate, rec_overlap,
    seq_identity, subtype_code, sv_match,
)
from delly_tpu.utils.tags import StructuralVariantRecord, decode_orientation

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "merge_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


def _slice(src, start_pat, end_pat, off_end=0):
    lines = open(src).read().splitlines(keepends=True)
    a = next(i for i, ln in enumerate(lines) if start_pat in ln)
    b = next(i for i, ln in enumerate(lines) if end_pat in ln)
    return "".join(lines[a:b + off_end])


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "merge.h"))):
        pytest.skip("g++ or reference merge.h unavailable")
    gen = tmp_path_factory.mktemp("merge_oracle")
    (gen / "util_slice.h").write_text(
        _slice(os.path.join(REF_SRC, "util.h"), "// Decode Orientation",
               "// Deletions"))
    (gen / "merge_slice.h").write_text(
        _slice(os.path.join(REF_SRC, "merge.h"), "namespace torali",
               "_collectSVtype", off_end=-2) + "}\n")
    sp = open(os.path.join(REF_SRC, "shortpe.h")).read().splitlines(
        keepends=True)
    start = next(i for i, ln in enumerate(sp)
                 if "mergeSort(std::vector" in ln) - 1
    tail = sp[start:]
    while tail and tail[-1].strip() in ("", "#endif"):
        tail.pop()
    assert tail[-1].strip() == "}"
    tail.pop()
    (gen / "shortpe_slice.h").write_text(
        "namespace torali {\n" + "".join(tail) + "\n}\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen), "-I", SHIM_DIR,
         "-I", REF_SRC, PROBE_SRC,
         os.path.join(REF_SRC, "edlib.cpp")])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _seq(rng, lo, hi, alphabet="ACGT"):
    return "".join(rng.choice(alphabet)
                   for _ in range(rng.randint(lo, hi)))


def test_rotation_identity_decoding(oracle):
    rng = random.Random(8181)
    lines = []
    checks = []
    for _ in range(200):
        s = _seq(rng, 0, 60, "ACGTN")
        lines.append(f"MINROT {s or '.'}")
        checks.append(("MINROT", s))
    for _ in range(200):
        a = _seq(rng, 0, 300)
        b = (a if rng.random() < 0.2 else
             _seq(rng, 0, 300)) or _seq(rng, 1, 50)
        min_id = rng.choice([0.0, 0.7, 0.9, 1.0])
        lines.append(f"SEQID {min_id:.17g} {a or '.'} {b or '.'}")
        checks.append(("SEQID", (a, b, min_id)))
    for _ in range(200):
        base = _seq(rng, 10, 120)
        rot = rng.randint(0, len(base) - 1)
        b = base[rot:] + base[:rot] if rng.random() < 0.6 else \
            _seq(rng, 10, 120)
        min_id = rng.choice([0.7, 0.85])
        cutoff = rng.choice([50, 200, 10000])
        off = rng.randint(0, 300)
        lines.append(f"BESTID {off} {min_id:.17g} {cutoff} {base} {b}")
        checks.append(("BESTID", (base, b, off, min_id, cutoff)))
    for ct in ["3to3", "5to5", "3to5", "5to3", "NA", "x"]:
        for svt in ["DEL", "DUP", "INV", "INS", "BND", "CNV", "DUP:TANDEM"]:
            lines.append(f"DECODE {ct} {svt}")
            checks.append(("DECODE", (ct, svt)))
            lines.append(f"MERGESVT {svt} 0 NA")
            checks.append(("MERGESVT", (svt, None)))
            lines.append(f"MERGESVT {svt} 1 {ct}")
            checks.append(("MERGESVT", (svt, ct)))
    for s in ["x", "<INS:ME:ALU>", "<INS:ME:LINE1>", "<INS:ME:SVA>",
              "NUMT", "soloLTR", "HERVK", "TR", "<DEL:TR>", "METRO"]:
        lines.append(f"SUBTYPE {s}")
        checks.append(("SUBTYPE", s))
    for alt in ["A]chr7:123]", "[chr1:5[T", "A", "ACGT", "]chrX:9]G",
                "A[x[", "A]x:y]", "T]7:0]"]:
        lines.append(f"BNDMATE {alt}")
        checks.append(("BNDMATE", alt))
    for _ in range(80):
        s1 = rng.randint(0, 1000)
        e1 = s1 + rng.randint(-5, 500)
        s2 = rng.randint(0, 1000)
        e2 = s2 + rng.randint(-5, 500)
        lines.append(f"RECOVL {s1} {e1} {s2} {e2}")
        checks.append(("RECOVL", (s1, e1, s2, e2)))
    for (op, arg), out in zip(checks, oracle(lines)):
        if op == "MINROT":
            assert min_rotation(arg) == ("" if out == "." else out), arg
        elif op == "SEQID":
            a, b, m = arg
            assert f"{seq_identity(a, b, m):.17g}" == out, arg
        elif op == "BESTID":
            a, b, off, m, cut = arg
            assert f"{best_seq_identity(a, b, off, m, cut):.17g}" \
                == out, arg
        elif op == "DECODE":
            ct, svt = arg
            assert decode_orientation(ct, svt) == int(out), arg
        elif op == "MERGESVT":
            svt, ct = arg
            assert merge_decode_svt(svt, ct) == int(out), arg
        elif op == "SUBTYPE":
            assert subtype_code(arg) == int(out), arg
        elif op == "BNDMATE":
            got = parse_bnd_mate(arg)
            if out == "0":
                assert got is None, arg
            else:
                _, chr2, pos2 = out.split()
                assert got == (chr2, int(pos2)), arg
        elif op == "RECOVL":
            assert f"{rec_overlap(*arg):.17g}" == out, arg


def _node(rng, svt, subtype):
    start = rng.randint(1000, 50000)
    size = rng.randint(30, 5000)
    return MergeSV(
        mtid=rng.randint(0, 1), svStart=start, svEnd=start + size,
        pos2=rng.randint(1000, 50000), size=size, svt=svt,
        homlen=rng.choice([0, 3, 20, 400]),
        trperiod=rng.choice([0, 2, 50]),
        subtype=subtype, insStrand=rng.choice([-1, 0, 1]),
        seq=_seq(rng, 0, 120))


def test_sv_match_matches_reference(oracle):
    rng = random.Random(8282)
    cfg = MergeConfig()
    head = (f"SVMATCH {cfg.bpoffset} {np.float32(cfg.recoverlap):.9g} "
            f"{cfg.mei_offset} {np.float32(cfg.mei_size_ratio):.9g} "
            f"{np.float32(cfg.mei_seq_id):.9g} {cfg.tr_offset} "
            f"{np.float32(cfg.tr_frac):.9g} "
            f"{np.float32(cfg.tr_seq_id):.9g} "
            f"{np.float32(cfg.norm_frac):.9g} "
            f"{np.float32(cfg.junc_seq_id):.9g} {cfg.seq_cutoff}")
    cases = []
    for _ in range(400):
        svt = rng.choice([0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
        st_a = rng.choice([0, 0, 1, 2, 3, 4, 5, 6, 7])
        st_b = rng.choice([st_a, st_a, rng.randint(0, 7)])
        a = _node(rng, svt, st_a)
        b = _node(rng, svt, st_b)
        if rng.random() < 0.5:  # near-duplicates (matching regime)
            b.svStart = a.svStart + rng.randint(-60, 60)
            b.svEnd = a.svEnd + rng.randint(-60, 60)
            b.pos2 = a.pos2 + rng.randint(-60, 60)
            b.size = max(1, a.size + rng.randint(-40, 40))
            b.mtid = a.mtid
            if rng.random() < 0.7:
                b.seq = a.seq
        cases.append((a, b))
    enc = lambda n: (f"{n.mtid},{n.svStart},{n.svEnd},{n.pos2},"
                     f"{n.size},{n.svt},{n.homlen},{n.trperiod},"
                     f"{n.subtype},{n.insStrand} {n.seq or '.'}")
    lines = [f"{head} {enc(a)} {enc(b)}" for a, b in cases]
    n_match = 0
    for (a, b), out in zip(cases, oracle(lines)):
        assert sv_match(cfg, a, b) == (out == "1"), (a, b)
        n_match += int(out)
    assert 30 <= n_match < len(cases)


def test_unionfind_matches_reference(oracle):
    rng = random.Random(8383)
    cases = []
    for _ in range(60):
        n = rng.randint(1, 80)
        pairs = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randint(0, 2 * n))]
        cases.append((n, pairs))
    lines = [f"UNION {n} {len(p)} " + " ".join(f"{a},{b}"
                                               for a, b in p)
             for n, p in cases]
    for (n, pairs), out in zip(cases, oracle(lines)):
        uf = UnionFind(n)
        for a, b in pairs:
            uf.unite(a, b)
        assert [uf.find(i) for i in range(n)] == \
            [int(x) for x in out.split(",")], (n, pairs)


def _sv(rng, svt, precise):
    start = rng.randint(1000, 40000)
    end = start + rng.randint(150, 8000)
    sv = StructuralVariantRecord()
    sv.chr = rng.randint(0, 1)
    sv.chr2 = sv.chr if svt < 5 else rng.randint(0, 1)
    sv.svStart = start
    sv.svEnd = end
    sv.svt = svt
    sv.precise = precise
    if precise:
        ci = rng.randint(1, 15)
        sv.srSupport = rng.randint(0, 9)
        sv.srMapQuality = rng.randint(10, 60)
        sv.srAlignQuality = float(np.float32(rng.uniform(0.0, 1.0)))
        sv.consensus = "ACGT" * rng.randint(1, 5)
        sv.consBp = rng.randint(10, 80)
        sv.insLen = rng.choice([0, rng.randint(1, 50)])
        sv.homLen = rng.randint(0, 12)
        sv.mapq = sv.srSupport * 40
    else:
        ci = rng.randint(30, 400)
        sv.peSupport = rng.randint(2, 15)
        sv.mapq = sv.peSupport * 40
    sv.ciposlow, sv.ciposhigh = -ci, ci
    sv.ciendlow, sv.ciendhigh = -ci, ci
    return sv


def test_merge_sort_matches_reference(oracle):
    """PE/SR reconciliation (shortpe.h:536-621): SR records augment
    imprecise PE records whose confidence interval contains them;
    SR-only records append unless a better precise duplicate exists."""
    rng = random.Random(8484)
    cases = []
    for _ in range(120):
        pe, sr = [], []
        for _ in range(rng.randint(0, 8)):
            svt = rng.choice([0, 1, 2, 2, 3, 4, 5])
            p = _sv(rng, svt, False)
            pe.append(p)
            # SR records near the PE record (augmentation candidates)
            for _ in range(rng.randint(0, 2)):
                s = _sv(rng, svt if rng.random() < 0.8 else 2, True)
                s.chr, s.chr2 = p.chr, p.chr2
                s.svStart = p.svStart + rng.randint(-60, 60)
                s.svEnd = p.svEnd + rng.randint(-60, 60)
                sr.append(s)
        for _ in range(rng.randint(0, 6)):  # SR-only + near-duplicates
            s = _sv(rng, rng.choice([0, 2, 3, 4]), True)
            sr.append(s)
            if rng.random() < 0.5:
                d = _sv(rng, s.svt, True)
                d.chr, d.chr2 = s.chr, s.chr2
                d.svStart = s.svStart + rng.randint(-8, 8)
                d.svEnd = s.svEnd + rng.randint(-8, 8)
                sr.append(d)
        for _ in range(rng.randint(0, 2)):  # failed assemblies ignored
            s = _sv(rng, 2, True)
            if rng.random() < 0.5:
                s.srSupport = 0
            else:
                s.srAlignQuality = 0.0
            sr.append(s)
        for i, s in enumerate(pe + sr):
            s.id = i
        cases.append((pe, sr))

    def enc(s):
        return (f"{s.chr},{s.svStart},{s.chr2},{s.svEnd},{s.ciposlow},"
                f"{s.ciposhigh},{s.ciendlow},{s.ciendhigh},"
                f"{s.peSupport},{s.srSupport},{s.srMapQuality},"
                f"{s.mapq},{s.insLen},{s.homLen},{s.svt},"
                f"{1 if s.precise else 0},{s.consBp},{s.id} "
                f"{np.float32(s.srAlignQuality):.9g} "
                f"{s.consensus or '.'}")

    import copy
    lines = [f"MERGESORT {len(pe)} {len(sr)} "
             + " ".join(enc(s) for s in pe + sr)
             for pe, sr in cases]
    n_aug = 0
    for (pe, sr), out in zip(cases, oracle(lines)):
        pe2 = copy.deepcopy(pe)
        sr2 = copy.deepcopy(sr)
        merge_sort(pe2, sr2)
        mine = "|".join(
            f"{s.chr},{s.svStart},{s.chr2},{s.svEnd},{s.ciposlow},"
            f"{s.ciposhigh},{s.ciendlow},{s.ciendhigh},{s.peSupport},"
            f"{s.srSupport},{s.srMapQuality},{s.mapq},{s.insLen},"
            f"{s.homLen},{s.svt},{1 if s.precise else 0},{s.consBp},"
            f"{s.id},{np.float32(s.srAlignQuality):.9g},"
            f"{s.consensus or '.'}" for s in pe2) or "-"
        assert mine == out, (len(pe), len(sr))
        n_aug += sum(1 for s in pe2 if s.precise)
    assert n_aug >= 80
