#!/usr/bin/env python3
"""Generate the committed codec-fuzz differential fixture at
src/test/resources/codec_fuzz/: deterministic mixed-entropy payloads
encoded by the INDEPENDENT python blosclz/snappy block codecs
(tools/blosc_py.py) — the Scala decoders must reproduce every payload
byte-exact (zarr.CodecFuzzDifferentialSpec). The reverse direction
(python decodes Scala-encoded streams of the same payloads) is
tools/check_codec_fuzz.py over graft.tools.CodecFuzzDump output.

Deterministic: re-running reproduces identical bytes.
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import blosc_py

ROOT = pathlib.Path(__file__).parent.parent / "src/test/resources/codec_fuzz"


def payload(rng, n: int) -> bytes:
    """Mixed-entropy generator matching LzFuzzSpec's regimes: byte runs,
    back-reference copies, random noise, structured ramps."""
    out = bytearray(n)
    i = 0
    while i < n:
        mode = int(rng.integers(0, 4))
        ln = min(1 + int(rng.integers(0, 300)), n - i)
        if mode == 0:
            out[i:i + ln] = bytes([int(rng.integers(0, 256))]) * ln
        elif mode == 1 and i > 0:
            d = 1 + int(rng.integers(0, min(i, 9000)))
            for k in range(ln):
                out[i + k] = out[i - d + k]
        elif mode == 2:
            out[i:i + ln] = rng.integers(0, 256, ln, dtype=np.uint8).tobytes()
        else:
            for k in range(ln):
                out[i + k] = (i + k) & 0xFF
        i += ln
    return bytes(out)


def main():
    ROOT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260813)
    sizes = [1, 97, 2048, 8191, 20000, 40000]
    typesizes = [1, 2, 4, 8, 3, 16]  # incl. an odd size with ragged tails
    for i, n in enumerate(sizes):
        p = payload(rng, n)
        (ROOT / f"payload_{i}.bin").write_bytes(p)
        (ROOT / f"pylz_{i}.bin").write_bytes(blosc_py.encode_blosclz(p))
        (ROOT / f"pysn_{i}.bin").write_bytes(blosc_py.encode_snappy(p))
        # full blosc frame with BITSHUFFLE (flag 0x4), python-encoded —
        # the Scala frame decoder must invert layout + flag handling
        ts = typesizes[i % len(typesizes)]
        (ROOT / f"pybit_{i}.bin").write_bytes(
            blosc_py.encode(p, typesize=ts, clevel=5, cname="zlib",
                            bit_shuffle=True))
        # self-check: python's own decoders must invert its encoders
        assert blosc_py.decode_blosclz(blosc_py.encode_blosclz(p), n) == p
        assert blosc_py.decode_snappy(blosc_py.encode_snappy(p), n) == p
        assert blosc_py.decode(
            blosc_py.encode(p, typesize=ts, clevel=5, cname="zlib",
                            bit_shuffle=True), n) == p
        print(f"case {i}: {n} bytes (bitshuffle ts={ts})")
    print(f"fixture at {ROOT}")


if __name__ == "__main__":
    main()
