"""Independent blosc1 frame codec in numpy + stdlib, written against the
public blosc1 frame spec (c-blosc README_HEADER_FORMAT.rst): 16-byte header
[version, versionlz, flags, typesize, nbytes, blocksize, cbytes], then a
per-block int32 start table (unless memcpy), each block = [int32 csize]
[payload]. Backends here: zlib (codec id 4, the one compressor python and
the JVM share), plus from-scratch blosclz (id 0) and raw snappy (id 3)
block codecs written against their public formats — independent of the
Scala implementations in zarr/ChunkCodec.scala, so fixtures cross-validate
two codebases on one wire format. Byte-shuffle via numpy.

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


def bitshuffle(raw: bytes, typesize: int) -> bytes:
    """c-blosc flag-0x4 bit-shuffle (bitshuffle-generic.c layout): with n
    elements (rounded DOWN to a multiple of 8; the tail memcpys raw), bit
    b of byte j of element i lands in plane (j*8+b), byte i//8, bit i%8
    (LSB-first). Independent numpy derivation — cross-validates the Scala
    loops in zarr/ChunkCodec.scala on the wire format."""
    ts = max(1, typesize)
    n = (len(raw) // ts) & ~7
    if n == 0:
        return raw
    a = np.frombuffer(raw[:n * ts], dtype=np.uint8).reshape(n, ts)
    bits = np.unpackbits(a[:, :, None], axis=2, bitorder="little")  # (n, ts, 8)
    planes = bits.transpose(1, 2, 0).reshape(ts * 8, n)            # (j*8+b, i)
    return (np.packbits(planes, axis=1, bitorder="little").tobytes()
            + raw[n * ts:])


def bitunshuffle(raw: bytes, typesize: int) -> bytes:
    ts = max(1, typesize)
    n = (len(raw) // ts) & ~7
    if n == 0:
        return raw
    packed = np.frombuffer(raw[:n * ts], dtype=np.uint8).reshape(ts * 8, n // 8)
    planes = np.unpackbits(packed, axis=1, bitorder="little")      # (ts*8, n)
    bits = planes.reshape(ts, 8, n).transpose(2, 0, 1)             # (n, ts, 8)
    a = np.packbits(bits, axis=2, bitorder="little")[:, :, 0]
    return a.tobytes() + raw[n * ts:]


def encode_blosclz(block: bytes) -> bytes:
    """Greedy blosclz block compressor (public FastLZ-derived format,
    c-blosc blosc/blosclz.c): literal runs of <=32 bytes (ctrl = n-1) and
    near matches — length (ctrl>>5)+2 with 255-chained extension when the
    field is 7, biased back-distance (dist-1) as 5 high ctrl bits + one low
    byte. Only distances <= 8191 are emitted (escape-free range)."""
    n = len(block)
    out = bytearray()
    table = {}

    def lits(a, b):
        i = a
        while i < b:
            run = min(b - i, 32)
            out.append(run - 1)
            out.extend(block[i:i + run])
            i += run

    def match(mlen, dist):
        dcode = dist - 1
        lf = mlen - 2
        if lf < 7:
            out.append((lf << 5) | (dcode >> 8))
        else:
            out.append((7 << 5) | (dcode >> 8))
            rem = lf - 7
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.append(dcode & 0xFF)

    anchor = i = 0
    while i + 4 <= n:
        key = block[i:i + 4]
        cand = table.get(key, -1)
        table[key] = i
        dist = i - cand
        if cand >= 0 and 1 <= dist <= 8191:
            mlen = 4
            while i + mlen < n and block[cand + mlen] == block[i + mlen]:
                mlen += 1
            lits(anchor, i)
            match(mlen, dist)
            i += mlen
            anchor = i
        else:
            i += 1
    lits(anchor, n)
    return bytes(out)


def decode_blosclz(data: bytes, expected: int) -> bytes:
    out = bytearray()
    assert data, "blosclz: empty block"
    ip, end = 1, len(data)
    ctrl = data[0] & 31
    while True:
        if ctrl >= 32:
            mlen = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if mlen == 6:
                code = 255
                while code == 255:
                    code = data[ip]; ip += 1
                    mlen += code
            code = data[ip]; ip += 1
            mlen += 3
            ref = len(out) - ofs - code - 1
            if code == 255 and ofs == (31 << 8):
                ref = len(out) - ((data[ip] << 8) | data[ip + 1]) - 8191
                ip += 2
            assert 0 <= ref < len(out), "blosclz: bad distance"
            for _ in range(mlen):  # byte-wise: overlap = RLE
                out.append(out[ref])
                ref += 1
        else:
            out.extend(data[ip:ip + ctrl + 1])
            ip += ctrl + 1
        if ip >= end:
            break
        ctrl = data[ip]; ip += 1
    assert len(out) == expected, (len(out), expected)
    return bytes(out)


def encode_snappy(block: bytes) -> bytes:
    """Greedy raw-snappy compressor (public format,
    google/snappy format_description.txt): varint32 size, then one-byte-tag
    literals (<=60) and 2-byte-offset copies (<=64 bytes per element)."""
    n = len(block)
    out = bytearray()
    v = n
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    table = {}

    def lits(a, b):
        i = a
        while i < b:
            run = min(b - i, 60)
            out.append((run - 1) << 2)
            out.extend(block[i:i + run])
            i += run

    def copies(mlen, dist):
        while mlen > 0:
            piece = min(mlen - 4, 64) if mlen > 64 else mlen
            out.append(((piece - 1) << 2) | 2)
            out.append(dist & 0xFF)
            out.append((dist >> 8) & 0xFF)
            mlen -= piece

    anchor = i = 0
    while i + 4 <= n:
        key = block[i:i + 4]
        cand = table.get(key, -1)
        table[key] = i
        dist = i - cand
        if cand >= 0 and 1 <= dist <= 65535:
            mlen = 4
            while i + mlen < n and block[cand + mlen] == block[i + mlen]:
                mlen += 1
            lits(anchor, i)
            copies(mlen, dist)
            i += mlen
            anchor = i
        else:
            i += 1
    lits(anchor, n)
    return bytes(out)


def decode_snappy(data: bytes, expected: int) -> bytes:
    ip, end = 0, len(data)
    size = shift = 0
    while True:
        b = data[ip]; ip += 1
        size |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    assert size == expected, (size, expected)
    out = bytearray()
    while ip < end:
        tag = data[ip]; ip += 1
        kind = tag & 3
        if kind == 0:
            nlit = (tag >> 2) + 1
            if nlit > 60:
                extra = nlit - 60
                nlit = int.from_bytes(data[ip:ip + extra], "little") + 1
                ip += extra
            out.extend(data[ip:ip + nlit])
            ip += nlit
        else:
            if kind == 1:
                clen = ((tag >> 2) & 0x7) + 4
                dist = ((tag >> 5) << 8) | data[ip]; ip += 1
            elif kind == 2:
                clen = (tag >> 2) + 1
                dist = int.from_bytes(data[ip:ip + 2], "little"); ip += 2
            else:
                clen = (tag >> 2) + 1
                dist = int.from_bytes(data[ip:ip + 4], "little"); ip += 4
            assert 0 < dist <= len(out), "snappy: bad distance"
            for _ in range(clen):  # byte-wise: overlap allowed
                out.append(out[-dist])
    assert len(out) == expected, (len(out), expected)
    return bytes(out)


_BACKENDS = {  # cname -> (codec id, compress, decompress)
    "zlib": (4, lambda b: zlib.compress(b, 5), lambda d, n: zlib.decompress(d)),
    "blosclz": (0, encode_blosclz, decode_blosclz),
    "snappy": (3, encode_snappy, decode_snappy),
}


def encode(raw: bytes, typesize: int = 1, clevel: int = 5,
           do_shuffle: bool = True, cname: str = "zlib",
           bit_shuffle: bool = False) -> bytes:
    """Single-block blosc1 frame; backends zlib (codec id 4),
    blosclz (0), snappy (3)."""
    ts = max(1, typesize)
    shuffled = (not bit_shuffle) and do_shuffle and ts > 1 and len(raw) % ts == 0
    block = (bitshuffle(raw, ts) if bit_shuffle
             else shuffle(raw, ts) if shuffled else raw)
    codec_id, comp_fn, _ = _BACKENDS[cname]
    comp = (zlib.compress(block, clevel) if cname == "zlib"
            else comp_fn(block))
    if clevel <= 0 or len(comp) + 8 >= len(raw):  # memcpy of ORIGINAL buffer
        header = struct.pack("<BBBBiii", 2, 1, 0x2, ts,
                             len(raw), len(raw), 16 + len(raw))
        return header + raw
    flags = ((codec_id << 5) | (0x1 if shuffled else 0x0)
             | (0x4 if bit_shuffle else 0x0))
    total = 16 + 4 + 4 + len(comp)
    header = struct.pack("<BBBBiii", 2, 1, flags, ts, len(raw), len(raw), total)
    return header + struct.pack("<i", 20) + struct.pack("<i", len(comp)) + comp


def decode(data: bytes, expected: int) -> bytes:
    (_, _, flags, typesize, nbytes, blocksize,
     _cbytes) = struct.unpack_from("<BBBBiii", data, 0)
    assert nbytes == expected, (nbytes, expected)
    if flags & 0x2:  # memcpy: original buffer, no unshuffle
        return data[16:16 + nbytes]
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
            decomp = {4: lambda d, n: zlib.decompress(d),
                      0: decode_blosclz, 3: decode_snappy}.get(codec_id)
            assert decomp is not None, f"unsupported blosc codec id {codec_id}"
            block = decomp(payload, this)
        if shuffled and typesize > 1 and this % typesize == 0:
            block = unshuffle(block, typesize)
        elif flags & 0x4:  # bit-shuffle, undone per block like c-blosc
            block = bitunshuffle(bytes(block), typesize)
        out[off:off + this] = block
    return bytes(out)
