#!/usr/bin/env python3
"""Decode Scala-written SEG-Y tapes with the independent python codec
(tools/segy_py.py): run the engine first so /tmp/graft_segy_*_tape exists
(e.g. `sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/v segy"`), then
`python3 tools/check_segy_interop.py /tmp/graft_segy__root_testdata_sf0_001_tape`.
Every tape must parse with consistent headers and finite samples; the
trace/sample counts print for eyeballing against the engine's output.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import segy_py

d = pathlib.Path(sys.argv[1])
tapes = sorted(d.glob("*.sgy"))
assert tapes, f"no .sgy files under {d}"
for t in tapes:
    sg = segy_py.read(t.read_bytes())
    assert sg["format_code"] == 1 and sg["dt_micros"] == 4000, t
    assert sg["textual"].startswith("C01 GRAFT TAPE"), sg["textual"][:40]
    for tr in sg["traces"]:
        assert all(s == s for s in tr["samples"])
    print(f"ok {t.name}: {len(sg['traces'])} traces x "
          f"{len(sg['traces'][0]['samples'])} samples, "
          f"sum {sum(sum(tr['samples']) for tr in sg['traces']):.1f}")
print(f"{len(tapes)} tapes parsed by the independent python codec")
