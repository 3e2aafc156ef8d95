#!/usr/bin/env python3
"""Differential check of Scala-ENCODED blosclz/snappy streams against the
independent python decoders (tools/blosc_py.py): run
`sbt "runMain graft.tools.CodecFuzzDump /tmp/codec_fuzz"` first, then
`python3 tools/check_codec_fuzz.py /tmp/codec_fuzz`. Every lz_i.bin /
sn_i.bin must decode to the matching payload_i.bin byte-exact — two
codebases, one wire format, random inputs (the committed
src/test/resources/codec_fuzz/ fixture covers the reverse direction).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import blosc_py

d = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/codec_fuzz")
cases = sorted(d.glob("payload_*.bin"))
if not cases:
    sys.exit(f"no payload_*.bin under {d} — run graft.tools.CodecFuzzDump first")
bad = 0
checks = 0
for p in cases:
    i = p.stem.split("_")[1]
    want = p.read_bytes()
    for codec, fn in (("lz", blosc_py.decode_blosclz), ("sn", blosc_py.decode_snappy)):
        enc = (d / f"{codec}_{i}.bin").read_bytes()
        got = fn(enc, len(want))
        ok = got == want
        bad += 0 if ok else 1
        checks += 1
        print(f"{'ok  ' if ok else 'FAIL'} case {i} {codec} ({len(want)} bytes)")
    bit = d / f"bit_{i}.bin"
    if bit.exists():  # Scala-encoded bitshuffle frame -> python full decode
        ok = blosc_py.decode(bit.read_bytes(), len(want)) == want
        bad += 0 if ok else 1
        checks += 1
        print(f"{'ok  ' if ok else 'FAIL'} case {i} bitshuffle ({len(want)} bytes)")
print(f"{checks} checks, {bad} failures")
sys.exit(1 if bad else 0)
