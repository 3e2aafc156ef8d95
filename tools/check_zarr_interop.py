#!/usr/bin/env python3
"""Cross-implementation interop check: re-read a graft-written MDIO/Zarr-v2
dataset using only numpy + stdlib (no zarr dependency in this container),
following the Zarr v2 spec directly — the same role as the reference's
xarray-compatibility regression tests.

Usage: python3 tools/check_zarr_interop.py /tmp/mdio_demo
"""
import json, sys, zlib, pathlib
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import blosc_py


def read_array(root: pathlib.Path, name: str) -> np.ndarray:
    meta = json.loads((root / name / ".zarray").read_text())
    assert meta["zarr_format"] == 2, meta
    shape, chunks, dtype = meta["shape"], meta["chunks"], np.dtype(meta["dtype"])
    comp = meta["compressor"]
    fill = meta["fill_value"]
    fill = np.nan if fill == "NaN" else fill
    out = np.full(shape, fill, dtype=dtype)
    grid = [-(-s // c) for s, c in zip(shape, chunks)]
    nbytes_chunk = int(np.prod(chunks)) * dtype.itemsize
    for idx in np.ndindex(*grid):
        f = root / name / ".".join(map(str, idx))
        if not f.exists():
            continue
        raw = f.read_bytes()
        if comp is not None and comp["id"] == "blosc":
            raw = blosc_py.decode(raw, nbytes_chunk)
        elif comp is not None:
            assert comp["id"] == "zlib", f"unexpected codec {comp}"
            raw = zlib.decompress(raw)
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, shape))
        out[sl] = block[tuple(slice(0, sl[d].stop - sl[d].start)
                              for d in range(len(shape)))]
    return out


def main(path: str) -> int:
    root = pathlib.Path(path)
    zmeta = json.loads((root / ".zmetadata").read_text())
    assert zmeta["zarr_consolidated_format"] == 1
    assert ".zgroup" in zmeta["metadata"] and "image/.zarray" in zmeta["metadata"]
    attrs = zmeta["metadata"]["image/.zattrs"]
    assert attrs["_ARRAY_DIMENSIONS"] == ["inline", "crossline"], attrs

    img = read_array(root, "image")
    want = (np.arange(6)[:, None] * 100 + np.arange(4)[None, :]).astype("<f4")
    if not np.array_equal(img, want):
        print("FAIL image mismatch\n", img, "\nwant\n", want)
        return 1
    # blosc+shuffle variable: decoded with the INDEPENDENT python blosc codec
    bmeta = json.loads((root / "image_blosc" / ".zarray").read_text())
    assert bmeta["compressor"]["id"] == "blosc", bmeta["compressor"]
    assert bmeta["compressor"]["shuffle"] == 1, bmeta["compressor"]
    blosc_img = read_array(root, "image_blosc")
    if not np.array_equal(blosc_img, want):
        print("FAIL image_blosc mismatch\n", blosc_img, "\nwant\n", want)
        return 1
    # blosclz + snappy cnames on 4 KiB chunks: the graft-written frames must
    # carry the right codec ids AND genuinely compress (no memcpy fallback),
    # and the independent python blosclz/snappy decoders must reproduce the
    # values exactly
    want_big = (((np.arange(32)[:, None] * 64 + np.arange(64)[None, :]) % 1000)
                .astype("<f4")) / 4.0
    for name, cname, codec_id in (("ampl_lz", "blosclz", 0),
                                  ("ampl_snappy", "snappy", 3)):
        m = json.loads((root / name / ".zarray").read_text())
        assert m["compressor"]["cname"] == cname, m["compressor"]
        frame = (root / name / "0.0").read_bytes()
        flags = frame[2]
        assert not flags & 0x2, f"{name}: memcpy fallback — codec never engaged"
        assert (flags >> 5) & 0x7 == codec_id, f"{name}: codec id {(flags >> 5) & 0x7}"
        arr = read_array(root, name)
        if not np.array_equal(arr, want_big):
            print(f"FAIL {name} mismatch")
            return 1
    print(f"ok   zarr-v2 interop: image {img.shape} {img.dtype} matches, "
          f"blosc+shuffle chunks decode independently "
          f"(zlib, blosclz and snappy cnames), "
          f"consolidated metadata + _ARRAY_DIMENSIONS present")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
