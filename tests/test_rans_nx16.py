"""rANS Nx16 (CRAM 3.1 method 5) round-trip tests across every flag
combination the decoder supports, on adversarial and realistic data
shapes (DNA, qualities, runs, sparse alphabets, empties)."""

import random

import pytest

from delly_tpu.io import rans_nx16 as rx


def _corpora():
    rng = random.Random(41)
    dna = bytes(rng.choice(b"ACGT") for _ in range(5000))
    quals = bytes(rng.choice(b"##,,FFFF:") for _ in range(4000))
    runs = b"".join(bytes([rng.randrange(5)]) * rng.randrange(1, 40)
                    for _ in range(300))
    allbytes = bytes(rng.randrange(256) for _ in range(3000))
    skew = bytes(rng.choices(range(8), weights=[100, 50, 20, 8, 4, 2,
                                                1, 1])[0]
                 for _ in range(6000))
    tiny = b"A"
    pair = b"AB"
    return {"dna": dna, "quals": quals, "runs": runs, "all": allbytes,
            "skew": skew, "tiny": tiny, "pair": pair}


FLAG_SETS = [
    0,
    rx.F_ORDER1,
    rx.F_CAT,
    rx.F_RLE,
    rx.F_PACK,
    rx.F_PACK | rx.F_RLE,
    rx.F_RLE | rx.F_ORDER1,
    rx.F_PACK | rx.F_ORDER1,
    rx.F_PACK | rx.F_RLE | rx.F_ORDER1,
    rx.F_X32,
    rx.F_X32 | rx.F_ORDER1,
    rx.F_STRIPE,
    rx.F_STRIPE | rx.F_ORDER1,
    rx.F_NOSZ,
    rx.F_RLE | rx.F_CAT,
]


@pytest.mark.parametrize("flags", FLAG_SETS)
def test_roundtrip_all_corpora(flags):
    for name, data in _corpora().items():
        if flags & rx.F_PACK and len(set(data)) > 16:
            continue
        enc = rx.encode(data, flags)
        out_sz = len(data) if flags & rx.F_NOSZ else None
        dec, end = rx.decode(enc, out_sz)
        assert dec == data, (name, flags)
        assert end == len(enc), (name, flags)


def test_uint7_roundtrip():
    for v in [0, 1, 127, 128, 300, 16383, 16384, 1 << 20, (1 << 28) - 1]:
        enc = rx.write_uint7(v)
        got, pos = rx.read_uint7(enc, 0)
        assert got == v and pos == len(enc)


def test_alphabet_roundtrip():
    cases = [[5], [0, 1, 2, 3], [7, 9, 11], list(range(65, 91)),
             [1, 2, 3, 10, 11, 12, 13, 200]]
    for syms in cases:
        enc = rx._write_alphabet(syms)
        got, pos = rx._read_alphabet(enc, 0)
        assert got == syms and pos == len(enc)


def test_fuzz_roundtrip():
    rng = random.Random(1234)
    for trial in range(120):
        n = rng.randrange(1, 2000)
        nalpha = rng.choice([1, 2, 3, 4, 8, 16, 40, 256])
        data = bytes(rng.randrange(nalpha) for _ in range(n))
        flags = rng.choice(FLAG_SETS)
        if flags & rx.F_PACK and len(set(data)) > 16:
            flags &= ~rx.F_PACK
        enc = rx.encode(data, flags)
        out_sz = n if flags & rx.F_NOSZ else None
        dec, _ = rx.decode(enc, out_sz)
        assert dec == data, (trial, n, nalpha, flags)
