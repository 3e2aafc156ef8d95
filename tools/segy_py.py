"""Independent SEG-Y rev-1 writer/reader in pure python stdlib, written
against the public SEG-Y standard — INDEPENDENT of the Scala codec in
multimodal/SegyCodec.scala (struct for the big-endian headers, the stdlib
cp037 codec for EBCDIC, and an IBM hexadecimal float implementation built
on math.frexp rather than exponent-register arithmetic). Two codebases,
one wire format:

 - make_segy_fixture.py ENCODES a committed fixture tape with this code
   (Scala reads what python wrote — runs inside sbt test);
 - check_segy_interop.py DECODES Scala-written tapes with this code
   (python reads what Scala wrote).
"""
import math
import struct


def ibm_encode(v: float) -> int:
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError("cannot IBM-encode NaN/Inf")
    if v == 0.0:
        return 0
    sign = 0x80000000 if v < 0 else 0
    m = abs(v)
    # fraction in [1/16, 1): e = smallest integer with m < 16**e
    _, be = math.frexp(m)          # m = x * 2**be, x in [0.5, 1)
    e = math.ceil(be / 4)
    while m >= math.ldexp(1.0, 4 * e):
        e += 1
    while m < math.ldexp(1.0, 4 * (e - 1)):
        e -= 1
    f = round(math.ldexp(m, 24 - 4 * e))
    if f == 1 << 24:
        e += 1
        f = round(math.ldexp(m, 24 - 4 * e))
    if not (0 <= e + 64 <= 127):
        raise ValueError(f"{v} outside IBM float range")
    return sign | ((e + 64) << 24) | f


def ibm_decode(bits: int) -> float:
    if bits & 0x7FFFFFFF == 0:
        return 0.0
    sign = -1.0 if bits & 0x80000000 else 1.0
    e = (bits >> 24) & 0x7F
    f = bits & 0xFFFFFF
    return sign * math.ldexp(float(f), 4 * (e - 64) - 24)


def write(textual: str, dt_micros: int, format_code: int, traces) -> bytes:
    """traces: list of dicts {inline, crossline, cdp_x, cdp_y, samples}."""
    assert format_code in (1, 5)
    n = len(traces[0]["samples"])
    out = bytearray()
    cards = (textual.split("\n") + [""] * 40)[:40]
    for line in cards:
        out += line[:80].ljust(80).encode("cp037")
    bh = bytearray(400)
    struct.pack_into(">h", bh, 16, dt_micros)
    struct.pack_into(">h", bh, 20, n)
    struct.pack_into(">h", bh, 24, format_code)
    struct.pack_into(">h", bh, 300, 0x0100)
    struct.pack_into(">h", bh, 302, 1)
    out += bh
    for i, t in enumerate(traces):
        assert len(t["samples"]) == n
        th = bytearray(240)
        struct.pack_into(">i", th, 0, i + 1)
        struct.pack_into(">h", th, 28, 1)
        struct.pack_into(">h", th, 114, n)
        struct.pack_into(">h", th, 116, dt_micros)
        struct.pack_into(">i", th, 180, t["cdp_x"])
        struct.pack_into(">i", th, 184, t["cdp_y"])
        struct.pack_into(">i", th, 188, t["inline"])
        struct.pack_into(">i", th, 192, t["crossline"])
        out += th
        for v in t["samples"]:
            if format_code == 1:
                out += struct.pack(">I", ibm_encode(v))
            else:
                out += struct.pack(">f", v)
    return bytes(out)


def read(data: bytes):
    assert len(data) >= 3600, "short file"
    textual = "\n".join(
        data[i * 80:(i + 1) * 80].decode("cp037").rstrip() for i in range(40)
    ).rstrip("\n")
    dt, n, fmt = (struct.unpack_from(">h", data, 3200 + o)[0] for o in (16, 20, 24))
    assert fmt in (1, 5), f"unsupported format {fmt}"
    tb = 240 + 4 * n
    body = len(data) - 3600
    assert body % tb == 0, "ragged trace region"
    traces = []
    for k in range(body // tb):
        off = 3600 + k * tb
        ns = struct.unpack_from(">h", data, off + 114)[0]
        assert ns == n, "trace/file header sample-count mismatch"
        samples = []
        for j in range(n):
            (w,) = struct.unpack_from(">I", data, off + 240 + 4 * j)
            samples.append(ibm_decode(w) if fmt == 1
                           else struct.unpack(">f", struct.pack(">I", w))[0])
        traces.append({
            "inline": struct.unpack_from(">i", data, off + 188)[0],
            "crossline": struct.unpack_from(">i", data, off + 192)[0],
            "cdp_x": struct.unpack_from(">i", data, off + 180)[0],
            "cdp_y": struct.unpack_from(">i", data, off + 184)[0],
            "samples": samples,
        })
    return {"textual": textual, "dt_micros": dt, "format_code": fmt,
            "traces": traces}
