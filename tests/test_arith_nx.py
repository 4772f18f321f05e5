"""Adaptive arithmetic codec (CRAM 3.1 method 6) round-trips across
the transform matrix, mirroring test_rans_nx16.py."""

import random

import pytest

from delly_tpu.io import arith_nx as ax
from delly_tpu.io import rans_nx16 as rx

FLAG_SETS = [
    0,
    rx.F_ORDER1,
    rx.F_CAT,
    rx.F_RLE,
    rx.F_PACK,
    rx.F_PACK | rx.F_RLE,
    rx.F_RLE | rx.F_ORDER1,
    rx.F_PACK | rx.F_ORDER1,
    rx.F_STRIPE,
    rx.F_STRIPE | rx.F_ORDER1,
    rx.F_NOSZ,
]


def _corpora():
    rng = random.Random(77)
    return {
        "dna": bytes(rng.choice(b"ACGT") for _ in range(4000)),
        "quals": bytes(rng.choice(b"##,,FFFF:") for _ in range(3000)),
        "runs": b"".join(bytes([rng.randrange(5)])
                         * rng.randrange(1, 30) for _ in range(200)),
        "all": bytes(rng.randrange(256) for _ in range(2000)),
        "tiny": b"Z",
    }


@pytest.mark.parametrize("flags", FLAG_SETS)
def test_roundtrip(flags):
    for name, data in _corpora().items():
        if flags & rx.F_PACK and len(set(data)) > 16:
            continue
        enc = ax.encode(data, flags)
        out_sz = len(data) if flags & rx.F_NOSZ else None
        dec, _ = ax.decode(enc, out_sz)
        assert dec == data, (name, flags)


def test_compression_on_skewed_data():
    rng = random.Random(5)
    data = bytes(rng.choices(range(4), weights=[90, 6, 3, 1])[0]
                 for _ in range(20000))
    assert len(ax.encode(data, 0)) < len(data) // 2
    assert len(ax.encode(data, rx.F_ORDER1)) < len(data) // 2


def test_fuzz():
    rng = random.Random(99)
    for trial in range(60):
        n = rng.randrange(1, 1500)
        nalpha = rng.choice([1, 2, 4, 16, 256])
        data = bytes(rng.randrange(nalpha) for _ in range(n))
        flags = rng.choice(FLAG_SETS)
        if flags & rx.F_PACK and len(set(data)) > 16:
            flags &= ~rx.F_PACK
        enc = ax.encode(data, flags)
        out_sz = n if flags & rx.F_NOSZ else None
        dec, _ = ax.decode(enc, out_sz)
        assert dec == data, (trial, flags)
