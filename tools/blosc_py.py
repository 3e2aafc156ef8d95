"""Independent blosc1 frame codec in numpy + stdlib, written against the
public blosc1 frame spec (c-blosc README_HEADER_FORMAT.rst): 16-byte header
[version, versionlz, flags, typesize, nbytes, blocksize, cbytes], then a
per-block int32 start table (unless memcpy), each block = [int32 csize]
[payload]. Backend here is zlib only (codec id 4) — the one compressor both
this container's python and the JVM share — plus byte-shuffle via numpy.

Used two ways:
 - check_zarr_interop.py DECODES graft-written blosc chunks with this code
   (python reads what Scala wrote);
 - make_blosc_fixture.py ENCODES a committed fixture dataset with this code
   (Scala reads what python wrote).
Two codebases, one wire format — the interop loop the reference closes with
xarray/zarr-python acceptance tests.
"""
import struct
import zlib

import numpy as np


def shuffle(raw: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(raw) % typesize:
        return raw
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, typesize)
    return a.T.tobytes()


def unshuffle(raw: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(raw) % typesize:
        return raw
    a = np.frombuffer(raw, dtype=np.uint8).reshape(typesize, -1)
    return a.T.tobytes()


def encode(raw: bytes, typesize: int = 1, clevel: int = 5,
           do_shuffle: bool = True) -> bytes:
    """Single-block blosc1 frame, zlib backend (codec id 4)."""
    ts = max(1, typesize)
    shuffled = do_shuffle and ts > 1 and len(raw) % ts == 0
    block = shuffle(raw, ts) if shuffled else raw
    comp = zlib.compress(block, clevel)
    if clevel <= 0 or len(comp) + 8 >= len(raw):  # memcpy of ORIGINAL buffer
        header = struct.pack("<BBBBiii", 2, 1, 0x2, ts,
                             len(raw), len(raw), 16 + len(raw))
        return header + raw
    flags = (4 << 5) | (0x1 if shuffled else 0x0)
    total = 16 + 4 + 4 + len(comp)
    header = struct.pack("<BBBBiii", 2, 1, flags, ts, len(raw), len(raw), total)
    return header + struct.pack("<i", 20) + struct.pack("<i", len(comp)) + comp


def decode(data: bytes, expected: int) -> bytes:
    (_, _, flags, typesize, nbytes, blocksize,
     _cbytes) = struct.unpack_from("<BBBBiii", data, 0)
    assert nbytes == expected, (nbytes, expected)
    if flags & 0x2:  # memcpy: original buffer, no unshuffle
        return data[16:16 + nbytes]
    assert not (flags & 0x4), "bitshuffle unsupported"
    codec_id = (flags >> 5) & 0x7
    shuffled = bool(flags & 0x1)
    nblocks = -(-nbytes // blocksize)
    out = bytearray(nbytes)
    for b in range(nblocks):
        (bstart,) = struct.unpack_from("<i", data, 16 + 4 * b)
        off = b * blocksize
        this = min(blocksize, nbytes - off)
        (csize,) = struct.unpack_from("<i", data, bstart)
        payload = data[bstart + 4: bstart + 4 + csize]
        if csize == this:
            block = payload
        else:
            assert codec_id == 4, f"python side decodes zlib only, got id {codec_id}"
            block = zlib.decompress(payload)
        if shuffled and typesize > 1 and this % typesize == 0:
            block = unshuffle(block, typesize)
        out[off:off + this] = block
    return bytes(out)
