#!/usr/bin/env python3
"""Cross-implementation interop for the zarr v3 SHARDED path: re-read a
graft-written `sharding_indexed` store using only numpy + stdlib, following
the zarr v3 sharding spec directly — footer index of (offset, nbytes)
uint64-LE pairs with a crc32c trailer, inner chunks decoded through the
independent python blosc codec (tools/blosc_py.py).

Usage: python3 tools/check_zarr_v3_interop.py /tmp/mdio_demo_v3sharded
"""
import json
import pathlib
import struct
import sys
import zlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import blosc_py


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), bitwise reference implementation."""
    poly = 0x82F63B78
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def read_sharded_array(root: pathlib.Path, name: str) -> np.ndarray:
    meta = json.loads((root / name / "zarr.json").read_text())
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    shape = meta["shape"]
    shard_shape = meta["chunk_grid"]["configuration"]["chunk_shape"]
    codec = meta["codecs"][0]
    assert codec["name"] == "sharding_indexed", codec
    cfg = codec["configuration"]
    inner = cfg["chunk_shape"]
    assert cfg["index_location"] == "end"
    assert any(c["name"] == "crc32c" for c in cfg["index_codecs"])
    inner_codecs = [c["name"] for c in cfg["codecs"]]
    dtype = {"float32": "<f4", "float64": "<f8", "int64": "<i8"}[meta["data_type"]]
    fill = meta["fill_value"]
    fill = np.nan if fill == "NaN" else fill

    ips = [s // c for s, c in zip(shard_shape, inner)]
    n_inner = int(np.prod(ips))
    out = np.full(shape, fill, dtype=np.dtype(dtype))
    shard_grid = [-(-s // c) for s, c in zip(shape, shard_shape)]
    inner_nbytes = int(np.prod(inner)) * np.dtype(dtype).itemsize

    for sidx in np.ndindex(*shard_grid):
        f = root / name / "c" / "/".join(map(str, sidx))
        if not f.exists():
            continue
        blob = f.read_bytes()
        idx_len = 16 * n_inner + 4
        idx_raw = blob[-idx_len:]
        stored_crc = struct.unpack_from("<I", idx_raw, 16 * n_inner)[0]
        assert crc32c(idx_raw[:16 * n_inner]) == stored_crc, "index crc mismatch"
        for k in range(n_inner):
            off, nb = struct.unpack_from("<qq", idx_raw, 16 * k)
            if off == -1 and nb == -1:
                continue  # missing inner chunk -> fill
            payload = blob[off:off + nb]
            if inner_codecs == ["bytes"]:
                raw = payload
            else:
                raw = blosc_py.decode(payload, inner_nbytes)
            block = np.frombuffer(raw, dtype=dtype).reshape(inner)
            # k -> inner coords (C-order), then global slice
            ic = []
            rem = k
            for d in reversed(ips):
                ic.append(rem % d)
                rem //= d
            ic = list(reversed(ic))
            sl = tuple(slice(s * ss + i * c, min(s * ss + (i + 1) * c, dim))
                       for s, ss, i, c, dim in zip(sidx, shard_shape, ic, inner, shape))
            out[sl] = block[tuple(slice(0, sl[d].stop - sl[d].start)
                                  for d in range(len(shape)))]
    return out


def main(path: str) -> int:
    root = pathlib.Path(path)
    img = read_sharded_array(root, "image")
    want = (np.arange(6)[:, None] * 100 + np.arange(4)[None, :]).astype("<f4")
    if not np.array_equal(img, want):
        print("FAIL sharded image mismatch\n", img, "\nwant\n", want)
        return 1
    print(f"ok   zarr-v3 sharding interop: image {img.shape} {img.dtype} "
          f"matches through the footer index + crc32c + blosc inner codec")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
