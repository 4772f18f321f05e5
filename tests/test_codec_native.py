"""Native-vs-Python equality for the CRAM 3.1 entropy stages: the
hostio.cpp fast paths must return byte-identical results AND the
Python contracts must still pass when the native layer is forced off."""

import random

import pytest

from delly_tpu import native
from delly_tpu.io import arith_nx, fqzcomp, rans_nx16


@pytest.fixture(scope="module")
def _need_native():
    lib = native.get_lib()
    if lib is None or not hasattr(lib, "rans_nx16_decode"):
        pytest.skip("native hostio unavailable")


def _corpus():
    rng = random.Random(55)
    return {
        "dna": bytes(rng.choice(b"ACGT") for _ in range(50_000)),
        "quals": bytes(rng.choice(b"##,,FF::") for _ in range(40_000)),
        "wide": bytes(rng.randrange(256) for _ in range(20_000)),
    }


def test_rans_nx16_native_equals_python(_need_native, monkeypatch):
    for flags in (0, rans_nx16.F_ORDER1, rans_nx16.F_X32,
                  rans_nx16.F_X32 | rans_nx16.F_ORDER1):
        for name, data in _corpus().items():
            enc = rans_nx16.encode(data, flags)
            nat, nat_end = rans_nx16.decode(enc)
            monkeypatch.setattr(rans_nx16, "_native_entropy",
                                lambda *a: None)
            py, py_end = rans_nx16.decode(enc)
            monkeypatch.undo()
            assert nat == py == data, (name, flags)
            assert nat_end == py_end == len(enc), (name, flags)


def test_fqz_native_equals_python(_need_native):
    rng = random.Random(66)
    quals = [bytes(rng.choice(b"#,:F") for _ in range(rng.randint(50,
                                                                  200)))
             for _ in range(300)]
    enc = fqzcomp.encode(quals, store_lens=True)
    total = sum(len(q) for q in quals)
    nat = native.fqz_decode_block(enc, total)
    py = b"".join(fqzcomp.decode(enc, total_out=total))
    assert nat == py == b"".join(quals)


def test_arith_native_equals_python(_need_native, monkeypatch):
    for flags in (0, rans_nx16.F_ORDER1):
        for name, data in _corpus().items():
            enc = arith_nx.encode(data, flags)
            nat, _ = arith_nx.decode(enc)
            monkeypatch.setattr(native, "arith_decode_bytes",
                                lambda *a: None)
            py, _ = arith_nx.decode(enc)
            monkeypatch.undo()
            assert nat == py == data, (name, flags)
