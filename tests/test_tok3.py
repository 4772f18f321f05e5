"""tok3 name-tokeniser round-trips over realistic read-name corpora
(Illumina tile coords, ONT uuids, SRA accessions, adversarial)."""

import random
import uuid

from delly_tpu.io import tok3


def _illumina(n, seed=7):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        out.append(f"A01234:{rng.randint(1,99)}:HGXXXDSX:"
                   f"{rng.randint(1,4)}:{1000 + i // 3}:"
                   f"{rng.randint(1000, 99999)}:"
                   f"{rng.randint(1000, 99999)}".encode())
    return out


def _ont(n, seed=9):
    rng = random.Random(seed)
    return [str(uuid.UUID(int=rng.getrandbits(128))).encode()
            for _ in range(n)]


def _sra(n):
    return [f"SRR1234567.{i + 1}".encode() for i in range(n)]


def _adversarial(seed=13):
    rng = random.Random(seed)
    out = [b"x", b"0", b"00", b"0001", b"a0b00c000",
           b"read_0009", b"read_0010", b"read_0010", b"read_0011",
           b"r" + b"9" * 30, bytes([33, 126, 47, 58]) + b"77"]
    for _ in range(40):
        out.append(bytes(rng.choice(b"abcXYZ0123:_-.#")
                         for _ in range(rng.randint(1, 40))))
    return out


def _roundtrip(names):
    enc = tok3.encode(names)
    dec = tok3.decode(enc)
    assert dec == b"\x00".join(names) + b"\x00"
    return len(enc)


def test_illumina_roundtrip_and_compression():
    names = _illumina(500)
    enc_len = _roundtrip(names)
    raw_len = sum(len(n) + 1 for n in names)
    # tokenised + delta-coded names must compress well
    assert enc_len < raw_len * 0.5


def test_ont_roundtrip():
    _roundtrip(_ont(300))


def test_sra_roundtrip_tiny():
    names = _sra(400)
    enc_len = _roundtrip(names)
    assert enc_len < sum(len(n) + 1 for n in names) * 0.25


def test_adversarial_roundtrip():
    _roundtrip(_adversarial())


def test_duplicates_and_singletons():
    _roundtrip([b"same"] * 20)
    _roundtrip([b"one"])
    _roundtrip([b"a", b"a", b"b", b"a"])


def test_token_overflow_lossless():
    """Names with more tokens than the column cap must round-trip
    exactly (overflow tail collapses to one literal token)."""
    long1 = b"a1" * 200              # 400 tokens
    long2 = b"x" + b":9" * 150
    _roundtrip([long1, long2, long1, b"short7"])


def test_fuzz_mixed():
    rng = random.Random(99)
    pool = _illumina(60) + _ont(30) + _sra(40) + _adversarial()
    for _ in range(25):
        k = rng.randint(1, 80)
        names = [rng.choice(pool) for _ in range(k)]
        _roundtrip(names)
