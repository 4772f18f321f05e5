"""fqzcomp (CRAM 3.1 method 7) round-trips over realistic quality
corpora: Illumina binned, ONT-like wide distributions, constant,
dedup-heavy and adversarial shapes, plus range-coder/model unit
checks."""

import random

from delly_tpu.io import fqzcomp as fz


def _illumina(n, ln=150, seed=3):
    rng = random.Random(seed)
    bins = b"#,:F"
    out = []
    for _ in range(n):
        q = bytearray()
        cur = rng.choice(bins)
        for _ in range(ln):
            if rng.random() < 0.07:
                cur = rng.choice(bins)
            q.append(cur)
        out.append(bytes(q))
    return out


def _ont(n, seed=5):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randint(200, 3000)
        q = bytearray()
        cur = 20
        for _ in range(ln):
            cur = min(50, max(1, cur + rng.randint(-2, 2)))
            q.append(cur + 33)
        out.append(bytes(q))
    return out


def _roundtrip(quals):
    enc = fz.encode(quals)
    dec = fz.decode(enc, [len(q) for q in quals])
    assert dec == [bytes(q) for q in quals]
    return len(enc)


def test_rangecoder_model_roundtrip():
    rng = random.Random(7)
    data = [rng.randrange(6) for _ in range(20000)]
    rc = fz.RangeEncoder()
    m = fz.Model(6)
    for s in data:
        m.encode(rc, s)
    blob = rc.finish()
    rd = fz.RangeDecoder(blob)
    m2 = fz.Model(6)
    assert [m2.decode(rd) for _ in data] == data
    # skewed data must compress
    skew = [0] * 18000 + [1] * 2000
    rng.shuffle(skew)
    rc = fz.RangeEncoder()
    m = fz.Model(2)
    for s in skew:
        m.encode(rc, s)
    assert len(rc.finish()) < len(skew) // 8


def test_illumina_binned():
    enc_len = _roundtrip(_illumina(200))
    raw = 200 * 150
    assert enc_len < raw * 0.25  # 4-symbol binned quals compress hard


def test_ont_wide():
    _roundtrip(_ont(60))


def test_constant_and_dedup():
    _roundtrip([b"F" * 150] * 100)
    _roundtrip([bytes([40] * 100), bytes([40] * 100), bytes([41] * 99)])


def test_adversarial():
    rng = random.Random(11)
    quals = [bytes(rng.randrange(64) for _ in range(rng.randint(1, 400)))
             for _ in range(50)]
    quals += [b"\x00", bytes(range(64)), b"a" * 1000]
    _roundtrip(quals)


def test_fuzz():
    rng = random.Random(23)
    for trial in range(20):
        n = rng.randint(1, 60)
        nalpha = rng.choice([1, 2, 4, 8, 40])
        quals = [bytes(rng.randrange(nalpha)
                       for _ in range(rng.randint(1, 300)))
                 for _ in range(n)]
        _roundtrip(quals)
