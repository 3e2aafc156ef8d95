#!/usr/bin/env python3
"""Generate the committed SEG-Y interop fixture at
src/test/resources/segy_fixture/pytape.sgy: a rev-1 tape written by the
INDEPENDENT python codec (tools/segy_py.py — stdlib cp037 EBCDIC, frexp-based
IBM floats) that the Scala SegyCodec must parse back exactly
(SegyCodecSpec "python-written fixture"). Values exercise the interesting
IBM cases: negatives, fractions with exact hex expansions (n/16, n/256),
zeros, large integers near the 2^21 exactness band, and both header banks.

Deterministic: re-running reproduces identical bytes.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import segy_py

ROOT = pathlib.Path(__file__).parent.parent / "src/test/resources/segy_fixture"
ROOT.mkdir(parents=True, exist_ok=True)

traces = [
    {"inline": 12, "crossline": 34, "cdp_x": -777, "cdp_y": 888,
     "samples": [0.0, 1.0, -1.0, 0.5, -0.0625, 100.0, -3.1415926535, 2097151.0]},
    {"inline": 12, "crossline": 35, "cdp_x": 0, "cdp_y": -1,
     "samples": [15.0 / 16.0, -255.0 / 256.0, 16.0, 256.0, 4096.0, -65536.0,
                 1048576.0, 0.001953125]},
    {"inline": 13, "crossline": 34, "cdp_x": 2147483647, "cdp_y": -2147483648,
     "samples": [7.25, -7.25, 123456.0, -654321.0, 0.0, 42.42, -0.001, 31.9375]},
]
data = segy_py.write("C01 PYTHON WROTE THIS TAPE\nC02 GRAFT INTEROP FIXTURE",
                     dt_micros=2000, format_code=1, traces=traces)
(ROOT / "pytape.sgy").write_bytes(data)

# self-check with the python reader before committing the bytes
back = segy_py.read(data)
assert back["textual"].startswith("C01 PYTHON WROTE THIS TAPE")
assert back["dt_micros"] == 2000 and back["format_code"] == 1
for want, got in zip(traces, back["traces"]):
    assert got["inline"] == want["inline"] and got["crossline"] == want["crossline"]
    assert got["cdp_x"] == want["cdp_x"] and got["cdp_y"] == want["cdp_y"]
print(f"wrote {ROOT/'pytape.sgy'} ({len(data)} bytes)")
