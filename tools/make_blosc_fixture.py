#!/usr/bin/env python3
"""Generate the committed blosc interop fixture at
src/test/resources/blosc_fixture/toy.mdio: a zarr-v2 MDIO dataset whose
chunks are encoded by the INDEPENDENT python blosc codec (tools/blosc_py.py,
zlib backend, byte-shuffle on) — the Scala connector must read it back
exactly (BloscFixtureSpec). Plays the role of the reference's
zarr-python-written acceptance fixtures (mdio/acceptance_test.cc:1350-1449).

Deterministic: re-running reproduces identical bytes.
"""
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import blosc_py

ROOT = pathlib.Path(__file__).parent.parent / "src/test/resources/blosc_fixture/toy.mdio"


def write_array(name, arr, chunks, dims, compressor, fill):
    d = ROOT / name
    d.mkdir(parents=True, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": compressor,
        "fill_value": fill,
        "order": "C",
        "filters": None,
    }
    (d / ".zarray").write_text(json.dumps(meta, indent=1))
    (d / ".zattrs").write_text(json.dumps({"_ARRAY_DIMENSIONS": dims}))
    grid = [-(-s // c) for s, c in zip(arr.shape, chunks)]
    for idx in np.ndindex(*grid):
        sl = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks))
        block = np.zeros(chunks, dtype=arr.dtype)
        src = arr[sl]
        block[tuple(slice(0, s) for s in src.shape)] = src
        raw = block.tobytes()
        if compressor is None:
            payload = raw
        else:
            payload = blosc_py.encode(raw, typesize=arr.dtype.itemsize,
                                      clevel=compressor["clevel"],
                                      do_shuffle=compressor["shuffle"] == 1,
                                      cname=compressor.get("cname", "zlib"),
                                      bit_shuffle=compressor["shuffle"] == 2)
        (d / ".".join(map(str, idx))).write_bytes(payload)


def main():
    if ROOT.exists():
        import shutil
        shutil.rmtree(ROOT)
    ROOT.mkdir(parents=True)
    (ROOT / ".zgroup").write_text('{"zarr_format": 2}')
    (ROOT / ".zattrs").write_text(json.dumps(
        {"name": "blosc_fixture", "apiVersion": 1,
         "createdOn": "2026-01-01T00:00:00Z"}))

    blosc = {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 1,
             "blocksize": 0}
    inline = np.arange(6, dtype="<i8")
    crossline = np.arange(5, dtype="<i8")
    # values chosen so shuffle has real structure to exploit
    image = (inline[:, None] * 1000 + crossline[None, :]).astype("<f4") / 8.0
    counts = (inline[:, None] * 7 + crossline[None, :] * 3).astype("<i4")

    write_array("inline", inline, [6], ["inline"], None, None)
    write_array("crossline", crossline, [5], ["crossline"], None, None)
    write_array("image", image, [4, 3], ["inline", "crossline"], blosc, "NaN")
    write_array("counts", counts, [4, 3], ["inline", "crossline"], blosc, 0)

    # blosclz + snappy cnames (the rest of the reference's BloscCname enum) —
    # on a 32x64 grid with 16x64 chunks (4 KiB blocks) so the LZ codecs
    # actually engage instead of falling back to memcpy frames
    blosclz = dict(blosc, cname="blosclz")
    snappy = dict(blosc, cname="snappy")
    trace = np.arange(32, dtype="<i8")
    sample = np.arange(64, dtype="<i8")
    flat = trace[:, None] * 64 + sample[None, :]
    ampl = ((flat % 1000).astype("<f4")) / 4.0
    qc = (trace[:, None] * 31 + sample[None, :] * 7).astype("<i8")
    write_array("trace", trace, [32], ["trace"], None, None)
    write_array("sample", sample, [64], ["sample"], None, None)
    write_array("ampl", ampl, [16, 64], ["trace", "sample"], blosclz, "NaN")
    write_array("qc", qc, [16, 64], ["trace", "sample"], snappy, 0)

    # BITSHUFFLE (shuffle=2, flag 0x4) — the remaining member of the
    # reference's BloscShuffle enum; python-encoded, Scala must decode
    bitshuf = dict(blosc, shuffle=2)
    phase = ((flat % 360).astype("<f4")) / 16.0
    write_array("phase", phase, [16, 64], ["trace", "sample"], bitshuf, "NaN")

    # consolidated metadata, the keys zarr-python consolidates
    entries = {}
    for p in sorted(ROOT.rglob("*")):
        if p.name in (".zgroup", ".zarray", ".zattrs"):
            key = str(p.relative_to(ROOT)).replace("\\", "/")
            entries[key] = json.loads(p.read_text())
    (ROOT / ".zmetadata").write_text(json.dumps(
        {"zarr_consolidated_format": 1, "metadata": entries}, indent=1))
    print(f"wrote {ROOT}")


if __name__ == "__main__":
    main()
