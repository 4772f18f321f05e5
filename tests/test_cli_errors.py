"""Startup validation: one-line errors + exit 1, no tracebacks
(reference delly.h:282-372 checked startup diagnostics)."""

import subprocess
import sys

EX = "/root/reference/example"


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", *args],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"})


def test_missing_alignment_file():
    r = _run("sr", "-g", f"{EX}/ref.fa", "-o", "/tmp/_x.vcf",
             "/no/such.bam")
    assert r.returncode == 1
    assert "Alignment file is missing: /no/such.bam" in r.stderr
    assert "Traceback" not in r.stderr


def test_missing_reference():
    r = _run("sr", "-g", "/no/ref.fa", "-o", "/tmp/_x.vcf",
             f"{EX}/sr.bam")
    assert r.returncode == 1
    assert "Reference file is missing: /no/ref.fa" in r.stderr
    assert "Traceback" not in r.stderr


def test_not_a_bam(tmp_path):
    bad = tmp_path / "bad.bam"
    bad.write_text("this is not a bam file")
    r = _run("sr", "-g", f"{EX}/ref.fa", "-o", "/tmp/_x.vcf", str(bad))
    assert r.returncode == 1
    assert f"Fail to open file {bad}" in r.stderr


def test_missing_exclude_and_vcf():
    r = _run("sr", "-g", f"{EX}/ref.fa", "-x", "/no/excl.tsv",
             "-o", "/tmp/_x.vcf", f"{EX}/sr.bam")
    assert r.returncode == 1
    assert "Exclude file is missing" in r.stderr
    r = _run("sr", "-g", f"{EX}/ref.fa", "-v", "/no/sites.bcf",
             "-o", "/tmp/_x.vcf", f"{EX}/sr.bam")
    assert r.returncode == 1
    assert "Input VCF/BCF file is missing" in r.stderr


def test_filter_missing_input():
    r = _run("filter", "-f", "germline", "-o", "/tmp/_x.bcf",
             "/no/in.bcf")
    assert r.returncode == 1
    assert "Input file is missing" in r.stderr


def test_mismatched_chromosome_counts(tmp_path):
    from tests.bamsynth import (make_dup_inv_dataset,
                                make_translocation_dataset)
    bam1, fa1 = make_dup_inv_dataset(str(tmp_path))      # 1 contig
    bam2, _fa2 = make_translocation_dataset(str(tmp_path))  # 2 contigs
    r = _run("sr", "-g", fa1, "-o", "/tmp/_x.vcf", bam1, bam2)
    assert r.returncode == 1
    assert "different number of chromosomes" in r.stderr


def test_word_commands():
    # Reference delly.cpp:47-64 accepts bare words as commands.
    for word, needle in [("version", "delly-tpu"),
                         ("warranty", "WITHOUT ANY WARRANTY"),
                         ("license", "BSD")]:
        r = _run(word)
        assert r.returncode == 0, (word, r.stderr)
        assert needle in (r.stderr + r.stdout)
    r = _run("help")
    assert r.returncode == 0
    assert "sr" in (r.stdout + r.stderr)


def test_corrupt_inputs_fail_cleanly(tmp_path):
    """Truncated/corrupt/binary inputs exit 0/1 with one-line errors —
    never a traceback (failure-detection parity with delly.h's checked
    startup plus our top-level guard)."""
    import random

    data = open(f"{EX}/sr.bam", "rb").read()
    tiny = tmp_path / "tiny.bam"
    tiny.write_bytes(data[:len(data) // 20])
    garbage = tmp_path / "garbage.bam"
    garbage.write_bytes(bytes(random.Random(1).randbytes(5000)))
    flipped = bytearray(data)
    for i in range(2000, 4000, 7):
        flipped[i] ^= 0xFF
    flip = tmp_path / "flip.bam"
    flip.write_bytes(bytes(flipped))
    badfa = tmp_path / "bad.fa"
    badfa.write_bytes(bytes(random.Random(2).randbytes(1000)))

    cases = [
        ["sr", "-g", f"{EX}/ref.fa", "-o", str(tmp_path / "o.vcf"),
         str(tiny)],
        ["sr", "-g", f"{EX}/ref.fa", "-o", str(tmp_path / "o.vcf"),
         str(garbage)],
        ["sr", "-g", f"{EX}/ref.fa", "-o", str(tmp_path / "o.vcf"),
         str(flip)],
        ["sr", "-g", str(badfa), "-o", str(tmp_path / "o.vcf"),
         f"{EX}/sr.bam"],
    ]
    for args in cases:
        r = _run(*args)
        assert r.returncode == 1, args
        assert "Traceback" not in r.stderr, r.stderr[-800:]
        assert r.stderr.strip(), args


def test_fuzzed_record_bytes_never_crash(tmp_path):
    """Corrupted DECOMPRESSED BAM records (re-compressed so they reach
    the native SoA scanner, not just the inflate layer) and corrupted
    CRAM containers exit 0/1 with no traceback — the native planes
    bound every read (cram_decode_slice hardening, bam_scan record
    length clamps)."""
    import random

    from delly_tpu.io.bam import BamFile
    from delly_tpu.io.bgzf import bgzf_compress, bgzf_decompress_file
    from delly_tpu.io.cram import write_cram

    raw = bgzf_decompress_file(f"{EX}/sr.bam")
    base_cram = str(tmp_path / "base.cram")
    write_cram(BamFile(f"{EX}/sr.bam"), f"{EX}/ref.fa", base_cram)
    craw = open(base_cram, "rb").read()

    for seed in (1, 7):
        rng = random.Random(seed)
        b = bytearray(raw)
        for _ in range(200):
            b[rng.randrange(10000, len(b))] = rng.randrange(256)
        p = str(tmp_path / f"fz{seed}.bam")
        open(p, "wb").write(bgzf_compress(bytes(b)))
        r = _run("sr", "-g", f"{EX}/ref.fa",
                 "-o", str(tmp_path / "o.vcf"), p)
        assert r.returncode in (0, 1)
        assert "Traceback" not in r.stderr, r.stderr[-600:]

        c = bytearray(craw)
        for _ in range(120):
            c[rng.randrange(600, len(c))] = rng.randrange(256)
        pc = str(tmp_path / f"fz{seed}.cram")
        open(pc, "wb").write(bytes(c))
        r = _run("sr", "-g", f"{EX}/ref.fa",
                 "-o", str(tmp_path / "o.vcf"), pc)
        assert r.returncode in (0, 1)
        assert "Traceback" not in r.stderr, r.stderr[-600:]


def test_profile_env_writes_stage_json(tmp_path):
    """DELLY_TPU_PROFILE=<path> (role of the reference's -DPROFILE
    hook) must emit a JSON stage profile for a normal run."""
    import json
    import os
    import subprocess
    import sys
    prof = str(tmp_path / "prof.json")
    env = dict(os.environ, DELLY_TPU_PROFILE=prof, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr",
         "-g", f"{EX}/ref.fa", "-o", str(tmp_path / "o.vcf"),
         f"{EX}/sr.bam"],
        capture_output=True, text=True, env=env, timeout=590)
    assert r.returncode == 0, r.stderr[-800:]
    data = json.load(open(prof))
    assert data["wall_s"] > 0
    assert any("assembly" in k.lower() or "scanning" in k.lower()
               for k in data["stages"]), data
